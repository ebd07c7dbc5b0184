"""Device-resident evaluation metrics with exact reference quirks.

Behavioral parity with /root/reference/dlib/utils/utils_image.py
(`mbatch_gpu_calculate_psnr`:843, `_mse`:894, `_nrmse`:937, `_ssim`:1120,
`mb_gpu_rgb2ycbcr`:618, `tensor2uint82float`:369) and
utils_trainer._compute_metrics:961:

  * metrics computed on uint8-rounded float images in [0,255];
  * `border=scale` crop before everything;
  * MSE floor 1e-45 (PSNR cap ~496.67 dB for empty/black patches);
  * ROI = (H >= th) binary mask; masked sums divided by ROI size with
    empty-ROI count snapped to 1;
  * NRMSE denom: ROI-aware min = max(min_all, min_roi), zero denom -> 1;
  * SSIM kernel 11 / sigma 1.5, *valid* convolution (no padding), data
    range 255 (inputs scaled to [0,1], k1=0.01, k2=0.03), ROI cropped by
    the convolution margin;
  * ROI metrics marginalized over thresholds 4..10 (constants.ROI_THRESH);
  * PSNR-Y: grayscale repeated to 3 channels, MATLAB rgb2ycbcr Y channel.

All functions take NCHW float arrays in [0,255] and return per-sample (B,)
vectors; everything is jittable with static shapes. Accumulations are
float32: inputs are integers <= 255 so squared diffs are exact, and XLA's
pairwise reductions keep the PSNR error < 1e-4 dB vs float64 (unit-tested).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from srcaco2_tpu import constants

# The reference floors MSE at float32(1e-45) (a subnormal, = 2**-149),
# giving a PSNR cap of 496.6655 dB for identical/black patches
# (utils_image.py:843 comment). TPUs flush subnormals to zero, so we
# implement the floor as an explicit PSNR cap at the same value.
MSE_FLOOR = 1e-37            # normal float32 (not flushed); any real uint8
                             # mismatch gives mse >= ~4e-6
PSNR_CAP_DB = 496.6655


def uint8_round(x: jax.Array) -> jax.Array:
    """clamp(0,1) -> *255 -> round: the uint8 quantization applied to both
    prediction and target before metrics (tensor2uint82float)."""
    return jnp.clip(jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0), 0.0, 255.0)


def _crop_border(x: jax.Array, border: int) -> jax.Array:
    if border == 0:
        return x
    return x[..., border:-border, border:-border]


def rgb2ycbcr(img: jax.Array, only_y: bool = True) -> jax.Array:
    """MATLAB rgb2ycbcr on NCHW float input in [0,1] (or uint8 [0,255])."""
    x = img.astype(jnp.float32)
    if x.dtype != jnp.uint8:
        x = x * 255.0
    r, g, b = x[:, 0], x[:, 1], x[:, 2]
    y = (65.481 * r + 128.553 * g + 24.966 * b) / 255.0 + 16.0
    if only_y:
        return (y / 255.0)[:, None]
    cb = (-37.797 * r - 74.203 * g + 112.0 * b) / 255.0 + 128.0
    cr = (112.0 * r - 93.786 * g - 18.214 * b) / 255.0 + 128.0
    return jnp.stack([y, cb, cr], axis=1) / 255.0


def _to_rgb(x: jax.Array) -> jax.Array:
    """Repeat 1-channel to 3 for the Y-channel metrics (reference:
    _rgb_tensor in utils_trainer)."""
    if x.shape[1] == 1:
        return jnp.repeat(x, 3, axis=1)
    assert x.shape[1] == 3, x.shape
    return x


def _masked_mse(img1, img2, roi):
    b = img1.shape[0]
    diff = (img1 - img2).astype(jnp.float32)
    if roi is None:
        return jnp.mean(diff.reshape(b, -1) ** 2, axis=-1)
    roi = roi.astype(jnp.float32)
    diff = diff * roi
    tt = roi.reshape(b, -1).sum(axis=-1)
    tt = jnp.where(tt == 0, 1.0, tt)
    return (diff.reshape(b, -1) ** 2).sum(axis=-1) / tt


def mb_psnr(img1: jax.Array, img2: jax.Array, border: int = 0,
            roi: jax.Array = None) -> jax.Array:
    img1 = _crop_border(img1, border)
    img2 = _crop_border(img2, border)
    if roi is not None:
        roi = _crop_border(roi, border)
    mse = _masked_mse(img1, img2, roi)
    psnr = 20.0 * jnp.log10(255.0 / jnp.sqrt(jnp.maximum(mse, MSE_FLOOR)))
    return jnp.where(mse < MSE_FLOOR, PSNR_CAP_DB, psnr)


def mb_mse(img1: jax.Array, img2: jax.Array, border: int = 0,
           roi: jax.Array = None) -> jax.Array:
    img1 = _crop_border(img1, border)
    img2 = _crop_border(img2, border)
    if roi is not None:
        roi = _crop_border(roi, border)
    return _masked_mse(img1, img2, roi)


def mb_nrmse(img: jax.Array, y: jax.Array, border: int = 0,
             roi: jax.Array = None) -> jax.Array:
    img = _crop_border(img, border)
    y = _crop_border(y, border)
    if roi is not None:
        roi = _crop_border(roi, border)
    b = img.shape[0]
    mse = _masked_mse(img, y, roi)
    if roi is None:
        _y = y.reshape(b, -1)
        _min = _y.min(axis=-1)
    else:
        _min_all = y.reshape(b, -1).min(axis=-1)
        _y = (y * roi.astype(y.dtype)).reshape(b, -1)
        _min_roi = _y.min(axis=-1)
        _min = jnp.maximum(_min_all, _min_roi)
    rmse = jnp.sqrt(mse)
    _max = _y.max(axis=-1)
    denom = _max - _min
    denom = jnp.where(denom == 0, 1.0, denom)
    return rmse / denom


def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return g


@functools.lru_cache(maxsize=16)
def _gaussian_kernel2d(size: int, sigma: float) -> np.ndarray:
    """2D kernel exp(-(gx+gy)/2s^2), normalized jointly — matching the
    reference _gaussian_filter (utils_image.py:1103)."""
    g = _gaussian_kernel1d(size, sigma)
    k = g[None, :] * g[:, None]
    return (k / k.sum()).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _valid_band(n: int, kernel1d: tuple) -> np.ndarray:
    """(n-k+1, n) banded matrix applying a VALID 1D correlation. A
    1-channel conv is MXU-hostile; as a banded matmul it rides the MXU
    (same trick as ops/resize)."""
    k = np.asarray(kernel1d, np.float64)
    out = n - len(k) + 1
    m = np.zeros((out, n), np.float32)
    for i in range(out):
        m[i, i:i + len(k)] = k
    return m


def _valid_depthwise_conv(x: jax.Array, kernel2d: np.ndarray) -> jax.Array:
    """Depthwise VALID filtering of NCHW x with a separable 2D kernel,
    expressed as two banded matmuls (MXU) in HIGHEST precision — metric
    parity requires true f32 accumulation."""
    u, s, vt = np.linalg.svd(kernel2d)
    kv = (u[:, 0] * np.sqrt(s[0])).astype(np.float64)
    kh = (vt[0] * np.sqrt(s[0])).astype(np.float64)
    if kv.sum() < 0:
        kv, kh = -kv, -kh
    mh = jnp.asarray(_valid_band(x.shape[2], tuple(kv)))
    mw = jnp.asarray(_valid_band(x.shape[3], tuple(kh)))
    y = jnp.einsum('oh,bchw->bcow', mh, x, precision='highest')
    return jnp.einsum('ow,bchw->bcho', mw, y, precision='highest')


def mb_ssim(x: jax.Array, y: jax.Array, border: int = 0,
            roi: jax.Array = None, kernel_size: int = 11,
            kernel_sigma: float = 1.5) -> jax.Array:
    """SSIM on [0,255] NCHW inputs, VALID convolution, ROI-aware."""
    data_range = 255.0
    k1, k2 = 0.01, 0.03
    x = _crop_border(x, border) / data_range
    y = _crop_border(y, border) / data_range
    if roi is not None:
        roi = _crop_border(roi, border)

    kern = _gaussian_kernel2d(kernel_size, kernel_sigma)
    c1 = k1 ** 2
    c2 = k2 ** 2
    mu_x = _valid_depthwise_conv(x, kern)
    mu_y = _valid_depthwise_conv(y, kern)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    # sigma via the shift identity conv((x-c)(y-c)) - (mu_x-c)(mu_y-c):
    # mathematically equal to conv(xy)-mu_x*mu_y but with ~10x less
    # float32 cancellation for x,y around c=0.5.
    cshift = 0.5
    xs = x - cshift
    ys = y - cshift
    mxs = mu_x - cshift
    mys = mu_y - cshift
    sigma_xx = _valid_depthwise_conv(xs * xs, kern) - mxs * mxs
    sigma_yy = _valid_depthwise_conv(ys * ys, kern) - mys * mys
    sigma_xy = _valid_depthwise_conv(xs * ys, kern) - mxs * mys

    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ss = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs

    b, c = ss.shape[0], ss.shape[1]
    if roi is None:
        ssim_val = ss.reshape(b, c, -1).mean(axis=-1)
    else:
        pad = (kernel_size - 1) // 2
        roi_c = roi[:, :, pad:-pad, pad:-pad].astype(jnp.float32)
        tt = roi_c.reshape(b, -1).sum(axis=-1)
        tt = jnp.where(tt == 0, 1.0, tt)
        ssim_val = (ss * roi_c).reshape(b, c, -1).sum(axis=-1) / tt[:, None]
    return ssim_val.mean(axis=1)


def compute_metrics(e_img: jax.Array, h_img: jax.Array, border: int,
                    roi_th=None) -> dict:
    """One metric pass over a batch (reference: _compute_metrics:961).
    e_img/h_img are uint8-rounded [0,255] NCHW. Returns per-sample (B,)
    arrays for psnr, psnr_y, mse, nrmse, ssim."""
    roi = None
    if roi_th is not None:
        roi = (h_img >= roi_th).astype(jnp.float32)
        if roi.shape[1] != 1:
            roi = roi[:, :1]
    e_y = rgb2ycbcr(_to_rgb(e_img) / 255.0, only_y=True) * 255.0
    h_y = rgb2ycbcr(_to_rgb(h_img) / 255.0, only_y=True) * 255.0
    return {
        constants.PSNR_MTR: mb_psnr(e_img, h_img, border, roi),
        constants.PSNR_Y_MTR: mb_psnr(e_y, h_y, border, roi),
        constants.MSE_MTR: mb_mse(e_img, h_img, border, roi),
        constants.NRMSE_MTR: mb_nrmse(e_img, h_img, border, roi),
        constants.SSIM_MTR: mb_ssim(e_img, h_img, border, roi),
    }


def compute_metrics_roi_marginal(e_img: jax.Array, h_img: jax.Array,
                                 border: int, ths=None) -> dict:
    """ROI metrics averaged over thresholds (reference:
    marginalize_roi_th_perf, utils_trainer.py:874)."""
    ths = list(ths if ths is not None else constants.ROI_THRESH)
    acc = None
    for th in ths:
        m = compute_metrics(e_img, h_img, border, roi_th=float(th))
        if acc is None:
            acc = {k: v for k, v in m.items()}
        else:
            acc = {k: acc[k] + m[k] for k in acc}
    n = float(len(ths))
    return {k: v / n for k, v in acc.items()}
