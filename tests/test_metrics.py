"""Metric parity tests: JAX device metrics vs independent float64 numpy
implementations of the published protocol (PSNR/MSE/NRMSE/SSIM on
uint8-rounded [0,255] images, border crop, ROI masking, valid-conv SSIM)."""
import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.ops import metrics as M


def _pair(b=2, c=1, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    h_img = rng.integers(0, 256, (b, c, h, w)).astype(np.float64)
    e_img = np.clip(h_img + rng.normal(0, 12, h_img.shape), 0,
                    255).round()
    return e_img, h_img


# ------------------------------------------------------------------ oracles
def np_psnr(e, h, border=0, roi=None):
    if border:
        e = e[..., border:-border, border:-border]
        h = h[..., border:-border, border:-border]
        roi = None if roi is None else roi[..., border:-border,
                                           border:-border]
    b = e.shape[0]
    if roi is None:
        mse = ((e - h) ** 2).reshape(b, -1).mean(-1)
    else:
        d = (e - h) * roi
        tt = roi.reshape(b, -1).sum(-1)
        tt[tt == 0] = 1
        mse = (d ** 2).reshape(b, -1).sum(-1) / tt
    mse = np.maximum(mse, 1e-45)
    return 20 * np.log10(255.0 / np.sqrt(mse))


def np_ssim(x, y, border=0, roi=None, ksz=11, sigma=1.5):
    if border:
        x = x[..., border:-border, border:-border]
        y = y[..., border:-border, border:-border]
        roi = None if roi is None else roi[..., border:-border,
                                           border:-border]
    x = x / 255.0
    y = y / 255.0
    coords = np.arange(ksz) - (ksz - 1) / 2
    g = np.exp(-(coords[None] ** 2 + coords[:, None] ** 2)
               / (2 * sigma ** 2))
    g /= g.sum()
    c1, c2 = 0.01 ** 2, 0.03 ** 2

    def conv(img):
        out = np.stack([
            np.stack([scipy.signal.convolve2d(img[i, j], g[::-1, ::-1],
                                              mode='valid')
                      for j in range(img.shape[1])])
            for i in range(img.shape[0])])
        return out

    mx, my = conv(x), conv(y)
    sxx = conv(x * x) - mx * mx
    syy = conv(y * y) - my * my
    sxy = conv(x * y) - mx * my
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    ss = ((2 * mx * my + c1) / (mx ** 2 + my ** 2 + c1)) * cs
    b, c = ss.shape[:2]
    if roi is None:
        return ss.reshape(b, c, -1).mean(-1).mean(-1)
    pad = (ksz - 1) // 2
    roi_c = roi[..., pad:-pad, pad:-pad]
    tt = roi_c.reshape(b, -1).sum(-1)
    tt[tt == 0] = 1
    return ((ss * roi_c).reshape(b, c, -1).sum(-1)
            / tt[:, None]).mean(-1)


# ------------------------------------------------------------------- tests
def test_uint8_round():
    x = jnp.array([[-0.1, 0.0, 0.5, 0.49999 / 255, 1.0, 1.7]])
    got = np.asarray(M.uint8_round(x))
    np.testing.assert_array_equal(got, [[0., 0., 128., 0., 255., 255.]])


@pytest.mark.parametrize('border', [0, 2, 8])
def test_psnr_full(border):
    e, h = _pair()
    got = np.asarray(M.mb_psnr(jnp.asarray(e, jnp.float32),
                               jnp.asarray(h, jnp.float32), border))
    np.testing.assert_allclose(got, np_psnr(e, h, border), atol=1e-3)


def test_psnr_identical_images_capped():
    e, h = _pair()
    got = np.asarray(M.mb_psnr(jnp.asarray(h, jnp.float32),
                               jnp.asarray(h, jnp.float32)))
    # mse floor 1e-45 -> psnr ~ 496.67 dB, finite.
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, 496.67, atol=0.5)


@pytest.mark.parametrize('th', [4, 10])
def test_psnr_roi(th):
    e, h = _pair(seed=1)
    roi = (h >= th).astype(np.float64)
    got = np.asarray(M.mb_psnr(jnp.asarray(e, jnp.float32),
                               jnp.asarray(h, jnp.float32), 2,
                               jnp.asarray(roi, jnp.float32)))
    np.testing.assert_allclose(got, np_psnr(e, h, 2, roi), atol=1e-3)


def test_psnr_empty_roi():
    e, h = _pair()
    roi = np.zeros_like(h)
    got = np.asarray(M.mb_psnr(jnp.asarray(e, jnp.float32),
                               jnp.asarray(h, jnp.float32), 0,
                               jnp.asarray(roi, jnp.float32)))
    assert np.all(np.isfinite(got))  # empty ROI -> mse 0 -> capped psnr


def test_mse_nrmse():
    e, h = _pair(seed=2)
    got_mse = np.asarray(M.mb_mse(jnp.asarray(e, jnp.float32),
                                  jnp.asarray(h, jnp.float32), 2))
    want_mse = ((e - h)[..., 2:-2, 2:-2] ** 2).reshape(2, -1).mean(-1)
    np.testing.assert_allclose(got_mse, want_mse, rtol=1e-5)

    got = np.asarray(M.mb_nrmse(jnp.asarray(e, jnp.float32),
                                jnp.asarray(h, jnp.float32), 2))
    hh = h[..., 2:-2, 2:-2]
    want = np.sqrt(want_mse) / (hh.reshape(2, -1).max(-1)
                                - hh.reshape(2, -1).min(-1))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_nrmse_roi_min_semantics():
    e, h = _pair(seed=3)
    th = 6
    roi = (h >= th).astype(np.float64)
    got = np.asarray(M.mb_nrmse(jnp.asarray(e, jnp.float32),
                                jnp.asarray(h, jnp.float32), 0,
                                jnp.asarray(roi, jnp.float32)))
    b = 2
    d = (e - h) * roi
    tt = roi.reshape(b, -1).sum(-1)
    tt[tt == 0] = 1
    mse = (d ** 2).reshape(b, -1).sum(-1) / tt
    min_all = h.reshape(b, -1).min(-1)
    hy = (h * roi).reshape(b, -1)
    mn = np.maximum(min_all, hy.min(-1))
    mx = hy.max(-1)
    den = mx - mn
    den[den == 0] = 1
    want = np.sqrt(mse) / den
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize('border', [0, 8])
def test_ssim_full(border):
    e, h = _pair(h=48, w=48, seed=4)
    got = np.asarray(M.mb_ssim(jnp.asarray(e, jnp.float32),
                               jnp.asarray(h, jnp.float32), border))
    want = np_ssim(e, h, border)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ssim_roi():
    e, h = _pair(h=48, w=48, seed=5)
    roi = (h >= 6).astype(np.float64)
    got = np.asarray(M.mb_ssim(jnp.asarray(e, jnp.float32),
                               jnp.asarray(h, jnp.float32), 0,
                               jnp.asarray(roi, jnp.float32)))
    want = np_ssim(e, h, 0, roi)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ssim_identical_is_one():
    _, h = _pair(h=32, w=32)
    got = np.asarray(M.mb_ssim(jnp.asarray(h, jnp.float32),
                               jnp.asarray(h, jnp.float32)))
    np.testing.assert_allclose(got, 1.0, atol=1e-5)


def test_rgb2ycbcr_matlab_values():
    # gray ramp: for r=g=b=v, Y = (65.481+128.553+24.966)*v/255+16
    v = np.linspace(0, 1, 8).astype(np.float32)
    img = np.tile(v[None, None, None, :], (1, 3, 2, 1))
    got = np.asarray(M.rgb2ycbcr(jnp.asarray(img), only_y=True)) * 255.0
    want = (65.481 + 128.553 + 24.966) * v + 16.0
    np.testing.assert_allclose(got[0, 0, 0], want, rtol=1e-5)


def test_compute_metrics_and_marginalize():
    e, h = _pair(h=48, w=48, seed=6)
    e_j = jnp.asarray(e, jnp.float32)
    h_j = jnp.asarray(h, jnp.float32)
    full = M.compute_metrics(e_j, h_j, border=2)
    assert set(full) == {constants.PSNR_MTR, constants.PSNR_Y_MTR,
                         constants.MSE_MTR, constants.NRMSE_MTR,
                         constants.SSIM_MTR}
    # grayscale: psnr_y is psnr of 219/255*v+16 transform
    roi_m = M.compute_metrics_roi_marginal(e_j, h_j, border=2)
    per_th = [np.asarray(M.compute_metrics(e_j, h_j, 2, roi_th=float(t))
                         [constants.PSNR_MTR])
              for t in constants.ROI_THRESH]
    np.testing.assert_allclose(np.asarray(roi_m[constants.PSNR_MTR]),
                               np.mean(per_th, axis=0), rtol=1e-6)
