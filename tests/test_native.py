"""Native permutohedral bilateral filter: build + correctness vs a
brute-force Gaussian-affinity oracle, plus the dense-CRF loss wrapper."""
import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope='module')
def lib():
    from srcaco2_tpu import native
    native.build_library()
    return native


def _brute_bilateral(img, vals, sigma_rgb, sigma_xy):
    """O(n^2) reference: out_i = sum_j exp(-|f_i-f_j|^2/2) v_j with
    f = (x/sxy, y/sxy, I/srgb)."""
    c, h, w = img.shape
    k = vals.shape[0]
    ys, xs = np.mgrid[0:h, 0:w]
    f = np.concatenate([
        (xs / sigma_xy).reshape(1, -1),
        (ys / sigma_xy).reshape(1, -1),
        img.reshape(c, -1) / sigma_rgb]).T          # n, d
    d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
    wgt = np.exp(-0.5 * d2)
    v = vals.reshape(k, -1).T                        # n, k
    return (wgt @ v).T.reshape(k, h, w)


def test_lattice_approximates_gaussian_filter(lib):
    rng = np.random.default_rng(0)
    h = w = 16
    img = rng.integers(0, 256, (1, h, w)).astype(np.float32)
    vals = rng.uniform(0, 1, (2, h, w)).astype(np.float32)
    got = lib.bilateral_filter(img[None], vals[None], 40.0, 6.0)[0]
    want = _brute_bilateral(img, vals, 40.0, 6.0)
    # the lattice is an approximation; compare up to global scale via
    # correlation + relative error of the normalized responses.
    g = got.ravel() / got.sum()
    t = want.ravel() / want.sum()
    corr = np.corrcoef(g, t)[0, 1]
    assert corr > 0.99, corr


def test_rgb_entry_matches_reference_signature(lib):
    rng = np.random.default_rng(1)
    n, k, h, w = 2, 3, 8, 8
    imgs = rng.integers(0, 256, (n, 3, h, w)).astype(np.float32)
    segs = rng.uniform(0, 1, (n, k, h, w)).astype(np.float32)
    out = np.zeros(n * k * h * w, np.float32)
    lib.bilateralfilter_batch(imgs.ravel(), segs.ravel(), out,
                              n, k, h, w, 15.0, 80.0)
    assert np.all(np.isfinite(out)) and out.std() > 0


def test_affinity_mass_matches_oracle(lib):
    """W·1 (per-pixel affinity mass, unnormalized) must track the
    brute-force affinity mass."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (1, 12, 12)).astype(np.float32)
    ones = np.ones((1, 12, 12), np.float32)
    got = lib.bilateral_filter(img[None], ones[None], 30.0, 4.0)[0]
    want = _brute_bilateral(img, ones, 30.0, 4.0)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.97, corr


def test_dense_crf_loss_grad():
    import jax
    from srcaco2_tpu.losses.crf import dense_crf_loss
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, (1, 1, 8, 8)),
                      jnp.float32)
    seg = jnp.asarray(rng.uniform(0, 1, (1, 2, 8, 8)), jnp.float32)
    loss, grad = jax.value_and_grad(
        lambda s: dense_crf_loss(img, s, 20.0, 5.0), argnums=0)(seg)
    assert np.isfinite(float(loss))
    g = np.asarray(grad)
    assert g.shape == seg.shape and np.all(np.isfinite(g))
    # gradient = -2/N * (W s): strictly negative for positive seg
    assert (g < 0).mean() > 0.99
