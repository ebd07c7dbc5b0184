"""Resize parity tests: the MXU-matmul resizer vs torch.nn.functional
(the reference's actual resizer) as oracle."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from srcaco2_tpu.ops import resize as R


def _rand_img(h, w, c=1, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(1, c, h, w)).astype(np.float32)


@pytest.mark.parametrize('hw_in,hw_out', [
    ((64, 64), (512, 512)),   # x8 up (LR->HR pre-upscale)
    ((512, 512), (64, 64)),   # x8 down (HR->LR synthesis)
    ((512, 512), (256, 256)),
    ((128, 96), (256, 192)),
])
def test_torch_bicubic_no_antialias(hw_in, hw_out):
    x = _rand_img(*hw_in)
    want = F.interpolate(torch.from_numpy(x), size=hw_out,
                         mode='bicubic').numpy()
    got = np.asarray(R.interpolate(x, size=hw_out, mode='bicubic'))
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.parametrize('hw_in,hw_out', [
    ((512, 512), (64, 64)),
    ((512, 512), (256, 256)),
    ((100, 100), (37, 37)),
])
def test_torch_bicubic_antialias(hw_in, hw_out):
    x = _rand_img(*hw_in)
    want = F.interpolate(torch.from_numpy(x), size=hw_out, mode='bicubic',
                         antialias=True).numpy()
    got = np.asarray(R.interpolate(x, size=hw_out, mode='bicubic',
                                   antialias=True))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_torch_bilinear():
    x = _rand_img(64, 64)
    want = F.interpolate(torch.from_numpy(x), size=(128, 128),
                         mode='bilinear').numpy()
    got = np.asarray(R.interpolate(x, size=(128, 128), mode='bilinear'))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_nearest():
    x = _rand_img(32, 32)
    want = F.interpolate(torch.from_numpy(x), size=(64, 64),
                         mode='nearest').numpy()
    got = np.asarray(R.interpolate(x, size=(64, 64), mode='nearest'))
    np.testing.assert_allclose(got, want, atol=0)


def test_weights_rows_sum_to_one():
    for m in (R.TORCH_BICUBIC, R.MATLAB_BICUBIC, R.BILINEAR):
        for aa in (False, True):
            w = R.resize_weights(512, 64, m, aa)
            np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)


def test_matlab_identity_and_updown():
    # smooth image: up x2 then down x2 should roughly round-trip (the
    # reconstruct task's blur chain relies on this being a mild blur).
    yy, xx = np.mgrid[0:64, 0:64]
    x = (127 + 80 * np.sin(yy / 9.0) * np.cos(xx / 7.0)).astype(
        np.float32)[None, None]
    up = R.imresize_matlab(x, 2.0)
    assert up.shape[-2:] == (128, 128)
    down = np.asarray(R.imresize_matlab(up, 0.5))
    assert down.shape == x.shape
    assert np.abs(down - x).mean() < 1.0


def test_matlab_matches_scipy_style_reference():
    """Golden check of the MATLAB-style resizer against a direct, slow
    float64 implementation of the imresize algorithm."""
    def cubic(x):
        ax = np.abs(x)
        return ((1.5 * ax ** 3 - 2.5 * ax ** 2 + 1) * (ax <= 1) +
                (-0.5 * ax ** 3 + 2.5 * ax ** 2 - 4 * ax + 2) *
                ((ax > 1) & (ax <= 2)))

    def ref_weights(in_len, out_len):
        scale = out_len / in_len
        kw = 4.0 if scale >= 1 else 4.0 / scale
        u = (np.arange(out_len) + 1) / scale + 0.5 * (1 - 1 / scale)
        left = np.floor(u - kw / 2)
        p = int(np.ceil(kw)) + 2
        ind = (left[:, None] + np.arange(p)[None, :] - 1).astype(int)
        d = u[:, None] - (ind + 1)
        w = scale * cubic(d * scale) if scale < 1 else cubic(d)
        w = w / w.sum(1, keepdims=True)
        # symmetric (reflect-with-repeat) boundary, MATLAB-style
        idx = np.where(ind < 0, -ind - 1, ind)
        idx = np.where(idx >= in_len, 2 * in_len - 1 - idx, idx)
        mat = np.zeros((out_len, in_len))
        for i in range(out_len):
            for j in range(p):
                mat[i, np.clip(idx[i, j], 0, in_len - 1)] += w[i, j]
        return mat

    def ref_resize(img, out_h, out_w):
        wh = ref_weights(img.shape[0], out_h)
        ww = ref_weights(img.shape[1], out_w)
        return wh @ img @ ww.T

    rng = np.random.default_rng(3)
    img = rng.random((40, 52)).astype(np.float64) * 255
    for scale in (0.5, 2.0, 0.25):
        out_h = int(np.ceil(img.shape[0] * scale))
        out_w = int(np.ceil(img.shape[1] * scale))
        want = ref_resize(img, out_h, out_w)
        got = np.asarray(R.imresize_matlab(img.astype(np.float32), scale))
        np.testing.assert_allclose(got, want, atol=1e-2)
