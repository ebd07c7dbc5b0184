"""Classical-restoration baseline study: regularized Wiener
deconvolution of bicubic-upsampled LR images.

Reference analog: dlib/diagnosis/restore.py — bicubic-upsamples each
LR cell image to the HR size, applies skimage ``restoration.wiener``
with a 5x5 box PSF at balances [1e-3, 1e-2, 1e-1, 1.0], and writes
per-image panels against the HR target (``process_scale`` :539-582,
``compare`` :494-532). The reference study is purely visual; this
rebuild additionally SCORES every balance through the standard eval
protocol (``fast_eval``: uint8 rounding, border=scale crop, ROI
threshold marginalization), so the classical baseline becomes a row
directly comparable to the bicubic floor and the trained nets.

TPU-native: skimage's ``wiener(img, psf, balance)`` is a direct
regularized inverse filter in Fourier space (data term ``|Y - HX|^2``
plus ``balance * |L X|^2`` with a Laplacian regularizer). Here the
closed-form solution is a few lines of ``jnp.fft`` fused into the
bicubic-upsample forward under one jit — the whole study runs as
batched device FFTs instead of a per-image CPU loop.
"""
import argparse
import os
from typing import Dict, Iterable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from srcaco2_tpu import constants

#: the reference study's regularization sweep (restore.py:563)
DEFAULT_BALANCES = (1e-3, 1e-2, 1e-1, 1.0)


def _centered_otf(kernel: np.ndarray, shape) -> np.ndarray:
    """Optical transfer function of a small centered kernel on an
    (H, W) grid: zero-pad, roll so the kernel center sits at the
    origin, FFT. Computed in numpy at trace time (the kernel is a
    static hyperparameter)."""
    kh, kw = kernel.shape
    h, w = shape
    pad = np.zeros((h, w), np.float64)
    pad[:kh, :kw] = kernel
    pad = np.roll(pad, (-(kh // 2), -(kw // 2)), axis=(0, 1))
    return np.fft.fft2(pad)


def _laplacian_otf(shape) -> np.ndarray:
    """OTF of the discrete Laplacian — the default regularizer of the
    reference's skimage wiener call (restoration.wiener(reg=None))."""
    lap = np.array([[0., -1., 0.], [-1., 4., -1.], [0., -1., 0.]])
    return _centered_otf(lap, shape)


def _dft_mats(n: int):
    """Real/imaginary parts of the unnormalized DFT matrix F = A + iB
    (numpy f64 at trace time; the matrices are static)."""
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    return np.cos(ang), np.sin(ang)


def wiener_filter(img: jax.Array, psf: np.ndarray,
                  balance: float) -> jax.Array:
    """Closed-form regularized Wiener deconvolution of a single-channel
    image (..., H, W) in [0, 1]:

        X = conj(H) Y / (|H|^2 + balance * |L|^2)

    with H the PSF transfer function and L the Laplacian regularizer —
    the same estimator skimage's ``restoration.wiener`` evaluates
    (its ``balance`` knob trades data fit vs. smoothness).

    The 2-D DFT runs as explicit matmuls (F_H @ X @ F_W in real
    arithmetic, HIGHEST precision) rather than ``jnp.fft``: the axon
    TPU backend does not implement XLA's FftOp, and at diagnosis sizes
    (<= 1024^2) the O(N^3) DFT-by-matmul is a few MXU-friendly
    matmuls — backend-portable and fast on exactly the unit the chip
    is built around."""
    h, w = img.shape[-2], img.shape[-1]
    otf = _centered_otf(np.asarray(psf, np.float64), (h, w))
    reg = _laplacian_otf((h, w))
    gain = np.conj(otf) / (np.abs(otf) ** 2
                           + balance * np.abs(reg) ** 2)
    gr = jnp.asarray(gain.real, jnp.float32)
    gi = jnp.asarray(gain.imag, jnp.float32)
    ah, bh = (jnp.asarray(m, jnp.float32) for m in _dft_mats(h))
    aw, bw = (jnp.asarray(m, jnp.float32) for m in _dft_mats(w))
    P = jax.lax.Precision.HIGHEST

    def mm(a, b):
        return jnp.matmul(a, b, precision=P)

    x = img.astype(jnp.float32)
    # Y = F_H X F_W, F = A + iB, X real
    t_r, t_i = mm(ah, x), mm(bh, x)
    yr = mm(t_r, aw) - mm(t_i, bw)
    yi = mm(t_r, bw) + mm(t_i, aw)
    # Z = gain . Y (elementwise complex)
    zr = gr * yr - gi * yi
    zi = gr * yi + gi * yr
    # x' = real(conj(F_H) Z conj(F_W)) / (H W)
    mr = mm(ah, zr) + mm(bh, zi)
    mi = mm(ah, zi) - mm(bh, zr)
    return (mm(mr, aw) + mm(mi, bw)) / float(h * w)


def box_psf(size: int = 5) -> np.ndarray:
    """The reference study's PSF model: a size x size box blur
    (restore.py:560 ``np.ones((5, 5)) / 25``)."""
    return np.ones((size, size), np.float64) / float(size * size)


def make_wiener_forward(scale: int, balance: float,
                        psf_size: int = 5):
    """fast_eval-compatible forward: bicubic-upsample the LR batch
    (the Interpolate baseline path) then Wiener-deconvolve the result
    — the reference's interp->wiener chain (restore.py:556-566) as one
    jitted device program."""
    from srcaco2_tpu.models.interpolate import interpolate_model
    from srcaco2_tpu.ops import metrics as M
    psf = box_psf(psf_size)

    @jax.jit
    def fwd(params, batch):
        up = interpolate_model(batch['l_im'], scale, 'bicubic')['out']
        out = wiener_filter(up, psf, balance)
        return M.uint8_round(jnp.clip(out, 0.0, 1.0))

    return fwd


def wiener_study(data_root: str, splits_root: str, scale: int,
                 cell: str,
                 balances: Iterable[float] = DEFAULT_BALANCES,
                 psf_size: int = 5, n: int = -1,
                 out_dir: Optional[str] = None,
                 n_panels: int = 2) -> Dict:
    """Score the Wiener sweep on a test split through the standard
    metric stack. Returns {'bicubic': perf, balance: perf, ...} where
    each perf is a fast_eval dict ({'full': .., 'roi': ..}); when
    ``out_dir`` is given, also writes the reference-style per-image
    panel strips (interp | wiener@balances | HR) and a summary yaml."""
    from srcaco2_tpu.data.dataset import load_dataset
    from srcaco2_tpu.train.evaluator import (fast_eval,
                                             make_interpolate_forward)
    args = {'data_root': data_root, 'splits_root': splits_root,
            'scale': scale, 'n_channels': 1, 'myseed': 0,
            'use_interpolated_low': False, 'inter_low_th': 7.,
            'inter_low_sigma': 6., 'num_workers': 8,
            'eval_over_roi_also': True,
            'eval_over_roi_also_ths': constants.ROI_THRESH,
            'is_master': True}
    name = constants.caco2_name(constants.TESTSET, scale, cell)
    ds = load_dataset(args, name, constants.EVAL_PHASE, n=n).stage()

    out: Dict = {}
    fwd = make_interpolate_forward(scale, constants.INTER_BICUBIC)
    out['bicubic'] = fast_eval(fwd, None, ds, args, 8,
                               constants.TESTSET)
    for b in balances:
        fwd = make_wiener_forward(scale, b, psf_size)
        out[float(b)] = fast_eval(fwd, None, ds, args, 8,
                                  constants.TESTSET)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        _write_panels(ds, scale, list(balances), psf_size, out_dir,
                      n_panels)
        _write_summary(out, os.path.join(out_dir, 'wiener_study.yaml'))
    return out


def _write_panels(ds, scale: int, balances: Sequence[float],
                  psf_size: int, out_dir: str, n_panels: int) -> None:
    """Reference-style panel strips: Interpolated | wiener@b... | HR
    with per-panel PSNR/SSIM captions (restore.py emits these one
    image per file; a strip reads easier and costs one figure)."""
    from srcaco2_tpu.diagnosis.visualize import restore_grid
    from srcaco2_tpu.models.interpolate import interpolate_model
    psf = box_psf(psf_size)
    for i in range(min(n_panels, len(ds))):
        # (h, w, C) uint8 -> (1, C, h, w) [0, 1]
        l_im = jnp.asarray(
            ds.lr[i].astype(np.float32) / 255.0).transpose(2, 0, 1)[None]
        up = interpolate_model(l_im, scale, 'bicubic')['out']
        panels = [np.asarray(up[0, 0]) * 255.0]
        titles = ['Interpolated']
        for b in balances:
            w = wiener_filter(up, psf, b)
            panels.append(np.clip(np.asarray(w[0, 0]), 0.0, 1.0) * 255.0)
            titles.append(f'wiener {b:g}')
        hr = ds.hr[i][..., 0].astype(np.float32)
        # ids embed fold subpaths ('hr_div_1/...'); flatten for the
        # panel filename
        tag = ds.ids[i].replace(os.sep, '_')
        restore_grid(panels, titles, hr,
                     os.path.join(out_dir, f'wiener_{tag}.png'))


def _write_summary(out: Dict, path: str) -> None:
    import yaml
    slim = {}
    for k, perf in out.items():
        slim[k] = {'full': {m: float(v)
                            for m, v in perf['full'].items()},
                   'roi': {m: float(v)
                           for m, v in perf.get('roi', {}).items()}}
    with open(path, 'w') as f:
        yaml.safe_dump(slim, f)


def main():
    ap = argparse.ArgumentParser(
        description='Wiener classical-restoration baseline study')
    ap.add_argument('--data_root', required=True)
    ap.add_argument('--splits_root', default=None)
    ap.add_argument('--scale', type=int, required=True)
    ap.add_argument('--cell', default='CELL0')
    ap.add_argument('--balances', type=float, nargs='+',
                    default=list(DEFAULT_BALANCES))
    ap.add_argument('--psf_size', type=int, default=5)
    ap.add_argument('--n', type=int, default=-1)
    ap.add_argument('--out_dir', default=None)
    ns = ap.parse_args()
    res = wiener_study(ns.data_root, ns.splits_root or ns.data_root,
                       ns.scale, ns.cell, ns.balances, ns.psf_size,
                       ns.n, ns.out_dir)
    for k, perf in res.items():
        tag = k if isinstance(k, str) else f'balance={k:g}'
        f = perf['full']
        print(f"[{tag}] psnr {f[constants.PSNR_MTR]:.4f} "
              f"ssim {f[constants.SSIM_MTR]:.4f} "
              f"| roi psnr {perf['roi'][constants.PSNR_MTR]:.4f}")


if __name__ == '__main__':
    main()
