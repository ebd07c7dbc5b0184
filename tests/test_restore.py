"""Wiener classical-restoration study (diagnosis/restore.py):
deconvolution correctness against an independent numpy oracle and a
blur-recovery property, plus the scored study end-to-end on a tiny
synthetic split (reference analog: dlib/diagnosis/restore.py)."""
import os

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.diagnosis.restore import (box_psf, make_wiener_forward,
                                           wiener_filter, wiener_study)


def _image(seed=0, n=64):
    """Structured test image: smooth blobs + a sharp grid (content at
    several frequencies so deconvolution has something to recover)."""
    rng = np.random.default_rng(seed)
    img = ndi.gaussian_filter(rng.random((n, n)), 3.0)
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    img[::8] = 0.9
    img[:, ::8] = 0.1
    return img.astype(np.float32)


def test_wiener_recovers_circular_box_blur():
    """Near-noiseless blurred input + tiny balance -> near-exact
    deblur (validates the inverse filter, not just self-consistency)."""
    img = _image()
    psf = box_psf(5)
    blurred = ndi.convolve(img, psf, mode='wrap')
    rec = np.asarray(wiener_filter(jnp.asarray(blurred), psf, 1e-8))
    # f32 FFT + the box OTF's near-null frequencies bound recovery at
    # ~5e-3 max; the blurred input is an order of magnitude worse
    assert np.abs(rec - img).max() < 1e-2
    assert np.abs(rec - img).mean() < 1e-3
    # and the blurred input itself is NOT that close
    assert np.abs(blurred - img).max() > 0.05


def test_wiener_matches_numpy_oracle():
    """Independent oracle: same estimator written directly with
    np.fft on an odd-shaped image (guards the center/roll convention
    and the Laplacian regularizer)."""
    img = _image(seed=3, n=96)[:80, :96]
    psf = box_psf(3)
    balance = 0.05

    h, w = img.shape

    def otf(k):
        p = np.zeros((h, w))
        p[:k.shape[0], :k.shape[1]] = k
        p = np.roll(p, (-(k.shape[0] // 2), -(k.shape[1] // 2)),
                    axis=(0, 1))
        return np.fft.fft2(p)

    H = otf(psf)
    L = otf(np.array([[0., -1., 0.], [-1., 4., -1.], [0., -1., 0.]]))
    want = np.real(np.fft.ifft2(
        np.fft.fft2(img) * np.conj(H)
        / (np.abs(H) ** 2 + balance * np.abs(L) ** 2)))

    got = np.asarray(wiener_filter(jnp.asarray(img), psf, balance))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_wiener_balance_regularizes():
    """Large balance suppresses the inverse filter's noise gain: on a
    noisy blurred image, some finite balance must beat both a
    near-zero balance (noise explosion) and the raw blurred input."""
    rng = np.random.default_rng(7)
    img = _image(seed=1)
    psf = box_psf(5)
    noisy = ndi.convolve(img, psf, mode='wrap') \
        + 0.03 * rng.standard_normal(img.shape).astype(np.float32)

    def err(x):
        return float(np.mean((np.asarray(x) - img) ** 2))

    e_tiny = err(wiener_filter(jnp.asarray(noisy), psf, 1e-8))
    e_mid = min(err(wiener_filter(jnp.asarray(noisy), psf, b))
                for b in (1e-3, 1e-2, 1e-1))
    assert e_mid < e_tiny
    assert e_mid < err(noisy)


def test_wiener_forward_shapes_and_range():
    fwd = make_wiener_forward(scale=2, balance=0.01, psf_size=5)
    batch = {'l_im': jnp.zeros((2, 1, 16, 16)) + 0.5}
    out = np.asarray(fwd(None, batch))
    assert out.shape == (2, 1, 32, 32)
    assert out.min() >= 0.0 and out.max() <= 255.0


@pytest.fixture(scope='module')
def tiny_root(tmp_path_factory):
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    root = str(tmp_path_factory.mktemp('wienerds'))
    make_synthetic_dataset(root, scale=2, cell='CELL0',
                           n_train=1, n_val=1, n_test=3, size=64)
    return root


def test_wiener_study_end_to_end(tiny_root, tmp_path):
    out_dir = str(tmp_path / 'study')
    res = wiener_study(tiny_root, tiny_root, scale=2, cell='CELL0',
                       balances=(1e-2, 1e-1), out_dir=out_dir,
                       n_panels=1)
    assert set(res) == {'bicubic', 1e-2, 1e-1}
    for perf in res.values():
        assert np.isfinite(perf['full'][constants.PSNR_MTR])
        assert 'roi' in perf
    assert os.path.isfile(os.path.join(out_dir, 'wiener_study.yaml'))
    pngs = [f for f in os.listdir(out_dir) if f.endswith('.png')]
    assert len(pngs) == 1
