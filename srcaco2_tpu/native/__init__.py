"""Native components: permutohedral bilateral filter (C++ / ctypes).

Reference analog: the SWIG-built bilateralfilter module
(dlib/crf/crfwrapper/bilateralfilter, built by create_env.sh:23-25).
Here the C++ is compiled lazily into a shared library on first use and
bound via ctypes — no import-time coupling (the reference's main flaw:
dlib/__init__ transitively required the compiled module even on the SR
path; see SURVEY §1).
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'permutohedral.cpp')
_LIB_PATH = os.path.join(_HERE, 'build', 'libpermutohedral.so')
_LOCK = threading.Lock()
_LIB = None


def build_library(force: bool = False) -> str:
    """Compile the shared library (g++ -O3 -fopenmp)."""
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    if force or not os.path.isfile(_LIB_PATH) or \
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
               '-fopenmp', _SRC, '-o', _LIB_PATH]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(build_library())
            fp = ctypes.POINTER(ctypes.c_float)
            for name in ('bilateralfilter_batch', 'bilateral_grey_batch'):
                fn = getattr(lib, name)
                fn.argtypes = [fp, fp, fp, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_int,
                               ctypes.c_float, ctypes.c_float]
                fn.restype = None
            lib.permutohedral_filter.argtypes = [
                fp, fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int]
            lib.permutohedral_filter.restype = None
            _LIB = lib
    return _LIB


def _as_f32(x):
    return np.ascontiguousarray(x, dtype=np.float32)


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def bilateralfilter_batch(images, segmentations, out, N, K, H, W,
                          sigma_rgb, sigma_xy):
    """Reference-compatible entry (images RGB, flattened in/out arrays).
    `out` is filled in place (numpy float32)."""
    img = _as_f32(images)
    seg = _as_f32(segmentations)
    assert out.dtype == np.float32 and out.flags['C_CONTIGUOUS']
    _lib().bilateralfilter_batch(_ptr(img), _ptr(seg), _ptr(out),
                                 N, K, H, W,
                                 ctypes.c_float(sigma_rgb),
                                 ctypes.c_float(sigma_xy))
    return out


def bilateral_filter(images: np.ndarray, values: np.ndarray,
                     sigma_rgb: float, sigma_xy: float) -> np.ndarray:
    """High-level API: images (N, C, H, W) with C in {1, 3}; values
    (N, K, H, W). Returns the filtered values."""
    images = _as_f32(images)
    values = _as_f32(values)
    n, c, h, w = images.shape
    k = values.shape[1]
    out = np.zeros_like(values)
    fn = _lib().bilateralfilter_batch if c == 3 \
        else _lib().bilateral_grey_batch
    fn(_ptr(images), _ptr(values), _ptr(out), n, k, h, w,
       ctypes.c_float(sigma_rgb), ctypes.c_float(sigma_xy))
    return out


def permutohedral_filter(features: np.ndarray,
                         values: np.ndarray) -> np.ndarray:
    """Generic lattice Gaussian filter: features (n, d), values
    (n, vd)."""
    features = _as_f32(features)
    values = _as_f32(values)
    n, d = features.shape
    vd = values.shape[1]
    out = np.zeros_like(values)
    _lib().permutohedral_filter(_ptr(features), _ptr(values), _ptr(out),
                                n, d, vd)
    return out
