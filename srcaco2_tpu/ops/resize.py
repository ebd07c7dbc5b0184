"""Separable image resizing as MXU matmuls.

The reference mixes three bicubic resizers (SURVEY §7 "hard parts"):
  * torch ``F.interpolate(mode='bicubic')`` (Keys a=-0.75, edge-clamped,
    optional antialias) — dataset LR synthesis + the Interpolate baseline
    (reference: dataset_dpsr.py:685, utils_trainer.py:89);
  * cv2 ``INTER_CUBIC`` (a=-0.75, no antialias) — LR->HR pre-upscale
    (reference: dataset_dpsr.py:659);
  * MATLAB-style ``imresize_np`` (a=-0.5, antialias, reflect boundary)
    — reconstruct-task blur chain (reference: utils_image.py:1505).

TPU-native design: every variant is a *linear* map, separable by axis. We
precompute the (out,in) weight matrix per axis on host (numpy, cached) and
apply ``W_h @ img @ W_w^T`` on device — two dense matmuls that map straight
onto the MXU with static shapes, instead of gather-based interpolation.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

TORCH_BICUBIC = 'torch_bicubic'      # also matches cv2 INTER_CUBIC upscaling
MATLAB_BICUBIC = 'matlab_bicubic'
BILINEAR = 'bilinear'
NEAREST = 'nearest'


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel with parameter `a`."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a,
                 0.0))
    return w


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.where(ax < 1.0, 1.0 - ax, 0.0)


_KERNELS = {
    TORCH_BICUBIC: (lambda x: _cubic_kernel(x, -0.75), 4.0),
    MATLAB_BICUBIC: (lambda x: _cubic_kernel(x, -0.5), 4.0),
    BILINEAR: (_linear_kernel, 2.0),
}


@functools.lru_cache(maxsize=512)
def resize_weights(in_size: int, out_size: int, method: str = TORCH_BICUBIC,
                   antialias: bool = False,
                   align_corners: bool = False) -> np.ndarray:
    """Dense (out_size, in_size) float32 resampling matrix for one axis.

    Coordinate mapping is the half-pixel convention used by both torch
    (align_corners=False) and MATLAB imresize:
        src = (dst + 0.5) * in/out - 0.5
    Boundary: torch-style edge clamp for TORCH_BICUBIC/BILINEAR, reflect
    (symmetric) for MATLAB_BICUBIC — matching each reference resizer.
    Antialias (only active when downscaling) dilates the kernel by the
    scale ratio and renormalizes, as both torch and MATLAB do.
    """
    if method == NEAREST:
        w = np.zeros((out_size, in_size), dtype=np.float32)
        # torch 'nearest': src = floor(dst * in/out)
        idx = np.floor(np.arange(out_size) * (in_size / out_size))
        idx = np.clip(idx.astype(np.int64), 0, in_size - 1)
        w[np.arange(out_size), idx] = 1.0
        return w

    kernel_fn, support = _KERNELS[method]
    ratio = in_size / out_size

    if antialias and ratio > 1.0 and method in (TORCH_BICUBIC, BILINEAR):
        # torch's antialias path is the Pillow algorithm: bicubic kernel
        # a=-0.5 (not -0.75), window truncated to image bounds and weights
        # renormalized over in-bounds taps (no edge clamp).
        if method == TORCH_BICUBIC:
            kfn, supp = (lambda x: _cubic_kernel(x, -0.5)), 2.0
        else:
            kfn, supp = _linear_kernel, 1.0
        ss = ratio
        mat = np.zeros((out_size, in_size), dtype=np.float64)
        for i in range(out_size):
            center = (i + 0.5) * ratio
            span = supp * ss
            xmin = max(0, int(center - span + 0.5))
            xmax = min(in_size, int(center + span + 0.5))
            xs = np.arange(xmin, xmax)
            w = kfn((xs + 0.5 - center) / ss)
            s = w.sum()
            if s != 0:
                w = w / s
            mat[i, xmin:xmax] = w
        return mat.astype(np.float32)

    scale = 1.0
    if antialias and ratio > 1.0:
        scale = ratio  # widen kernel when downscaling (MATLAB path).
    width = support * scale

    dst = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = dst * (in_size - 1) / (out_size - 1)
    else:
        src = (dst + 0.5) * ratio - 0.5           # (out,)
    left = np.floor(src - width / 2.0 + 0.5).astype(np.int64)
    ntaps = int(np.ceil(width)) + 2
    taps = left[:, None] + np.arange(ntaps)[None, :]      # (out, ntaps)
    dist = src[:, None] - taps                             # (out, ntaps)
    w = kernel_fn(dist / scale) / scale
    wsum = w.sum(axis=1, keepdims=True)
    wsum[wsum == 0] = 1.0
    w = w / wsum

    if method == MATLAB_BICUBIC:
        # reflect (symmetric) indexing: ... 1 0 | 0 1 2 ... n-1 | n-1 n-2 ...
        idx = taps.copy()
        idx = np.where(idx < 0, -idx - 1, idx)
        idx = np.where(idx >= in_size, 2 * in_size - 1 - idx, idx)
        idx = np.clip(idx, 0, in_size - 1)
    else:
        idx = np.clip(taps, 0, in_size - 1)

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.repeat(np.arange(out_size), ntaps), idx.ravel()),
              w.ravel())
    return mat.astype(np.float32)


def resize2d(x: jax.Array, out_hw, method: str = TORCH_BICUBIC,
             antialias: bool = False,
             align_corners: bool = False) -> jax.Array:
    """Resize the last two axes of `x` (..., H, W) -> (..., H', W') via two
    matmuls. Shapes are static, so the weight matrices are baked into the
    jitted program as constants."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    y = x.astype(dtype)
    # precision='highest': resize feeds metric parity paths; TPU f32
    # matmuls would otherwise run in bf16 passes and shift PSNR.
    if h_in != h_out:
        wh = jnp.asarray(resize_weights(h_in, h_out, method, antialias,
                                        align_corners), dtype=dtype)
        y = jnp.einsum('oh,...hw->...ow', wh, y, precision='highest')
    if w_in != w_out:
        ww = jnp.asarray(resize_weights(w_in, w_out, method, antialias,
                                        align_corners), dtype=dtype)
        y = jnp.einsum('ow,...hw->...ho', ww, y, precision='highest')
    return y


def interpolate(x: jax.Array, scale: float = None, size=None,
                mode: str = 'bicubic', antialias: bool = False) -> jax.Array:
    """torch.nn.functional.interpolate equivalent over (..., H, W)."""
    h, w = x.shape[-2], x.shape[-1]
    if size is None:
        size = (int(h * scale), int(w * scale))
    method = {'bicubic': TORCH_BICUBIC, 'bilinear': BILINEAR,
              'nearest': NEAREST}[mode]
    return resize2d(x, size, method=method, antialias=antialias)


def imresize_matlab(x: jax.Array, scale: float,
                    antialias: bool = True) -> jax.Array:
    """MATLAB-style imresize over (..., H, W) (reference analog:
    utils_image.imresize_np:1505). Output size = ceil(in * scale)."""
    h, w = x.shape[-2], x.shape[-1]
    out = (int(np.ceil(h * scale)), int(np.ceil(w * scale)))
    return resize2d(x, out, method=MATLAB_BICUBIC, antialias=antialias)
