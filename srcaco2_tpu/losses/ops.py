"""Differentiable loss operators: derivatives, local stats, soft
histograms, KDE, train-time SSIM.

Reference analogs: dlib/loss/local_variations.py (ImageGradient:18,
LaplacianFilter:58, LocalVariation:94), local_terms.py (PatchMoments:18),
global_terms.py (SoftHistogram:19), ssim.py (SSIMLoss:64 — zero-padded
SAME conv, unlike the valid-conv eval SSIM in ops/metrics.py).
All inputs NCHW float.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp


def _conv_replicate(x: jax.Array, kernels: np.ndarray,
                    pad: int) -> jax.Array:
    """x: (B,1,H,W); kernels: (K,1,k,k) -> (B,K,H,W), replicate padding."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode='edge')
    dn = jax.lax.conv_dimension_numbers(xp.shape, kernels.shape,
                                        ('NCHW', 'OIHW', 'NCHW'))
    return jax.lax.conv_general_dilated(
        xp, jnp.asarray(kernels), (1, 1), 'VALID', dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST)


def image_gradient(x: jax.Array) -> jax.Array:
    """First-order derivative: 2-channel (horizontal, vertical) map."""
    kh = np.array([[0, 0, 0], [-1, 0, 1], [0, 0, 0]], np.float32)
    kv = np.array([[0, -1, 0], [0, 0, 0], [0, 1, 0]], np.float32)
    k = np.stack([kh, kv])[:, None]
    return _conv_replicate(x, k, 1)


def laplacian_filter(x: jax.Array) -> jax.Array:
    """Second-order derivative (8-neighbor Laplacian)."""
    k = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]],
                 np.float32)[None, None]
    return _conv_replicate(x, k, 1)


@functools.lru_cache(maxsize=8)
def _locvar_kernels(ksz: int) -> np.ndarray:
    c = ksz // 2
    ks = []
    for i in range(ksz):
        for j in range(ksz):
            if i == c and j == c:
                continue
            k = np.zeros((ksz, ksz), np.float32)
            k[c, c] = 1.0
            k[i, j] = -1.0
            ks.append(k)
    return np.stack(ks)[:, None]


def local_variation(x: jax.Array, ksz: int = 3) -> jax.Array:
    """Center-minus-neighbor differences: (B, ksz^2-1, H, W)."""
    return _conv_replicate(x, _locvar_kernels(ksz), ksz // 2)


def patch_moments(x: jax.Array, ksz: int):
    """Per-pixel mean and unbiased variance over a ksz x ksz reflected
    window. x: (B,1,H,W) -> (avg, var) each (B, H*W)."""
    pad = (ksz - 1) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                 mode='reflect')
    ones = np.ones((1, 1, ksz, ksz), np.float32)
    dn = jax.lax.conv_dimension_numbers(xp.shape, ones.shape,
                                        ('NCHW', 'OIHW', 'NCHW'))
    conv = functools.partial(jax.lax.conv_general_dilated,
                             rhs=jnp.asarray(ones), window_strides=(1, 1),
                             padding='VALID', dimension_numbers=dn,
                             precision=jax.lax.Precision.HIGHEST)
    n = ksz * ksz
    s1 = conv(xp)
    s2 = conv(xp * xp)
    mean = s1 / n
    # unbiased variance (torch var_mean unbiased=True)
    var = (s2 - n * mean * mean) / (n - 1)
    b = x.shape[0]
    return mean.reshape(b, -1), jnp.maximum(var, 0.0).reshape(b, -1)


def soft_histogram(x: jax.Array, bins: int = 256, vmin: float = 0.0,
                   vmax: float = 1.0, sigma: float = 1e5) -> jax.Array:
    """Differentiable histogram via sigmoid binning. x: (B, N) ->
    (B, bins)."""
    delta = (vmax - vmin) / bins
    centers = vmin + delta * (jnp.arange(bins, dtype=jnp.float32) + 0.5)
    d = x[:, None, :] - centers[None, :, None]
    h = jax.nn.sigmoid(sigma * (d + delta / 2)) \
        - jax.nn.sigmoid(sigma * (d - delta / 2))
    return h.sum(axis=-1)


def gaussian_kde(x: jax.Array, nbins: int = 256, bw: float = 1.0 / 255**2,
                 vmin: float = 0.0, vmax: float = 1.0) -> jax.Array:
    """Gaussian KDE evaluated on a fixed grid. x: (B,C,H,W) -> (B, nbins),
    normalized to sum 1 per sample."""
    b = x.shape[0]
    xf = x.reshape(b, -1)
    centers = jnp.linspace(vmin, vmax, nbins)
    d2 = (xf[:, None, :] - centers[None, :, None]) ** 2
    k = jnp.exp(-0.5 * d2 / bw)
    dens = k.mean(axis=-1)
    return dens / jnp.maximum(dens.sum(-1, keepdims=True), 1e-12)


def kl_2_gaussians(src_m, src_v, trg_m, trg_v, eps: float = 1.0):
    """KL(N(trg) || N(src)) per element (reference: loss/main.py:265)."""
    sv = src_v + eps
    tv = trg_v + eps
    return (jnp.log(jnp.sqrt(sv) / jnp.sqrt(tv))
            + (tv + (trg_m - src_m) ** 2) / (2.0 * sv) - 0.5)


def bhattacharyya(p: jax.Array, q: jax.Array) -> jax.Array:
    """(B, D) distributions -> (B,) BC coefficient."""
    return jnp.sqrt(p * q).sum(axis=1)


@functools.lru_cache(maxsize=32)
def _gauss_band(n: int, ws: int, sigma: float = 1.5) -> np.ndarray:
    """(n, n) banded matrix applying a zero-padded SAME 1D Gaussian
    window along one axis. A 1-channel conv is MXU-hostile (VPU
    sliver); as a banded matmul it rides the MXU like ops/resize."""
    xs = np.arange(ws, dtype=np.float64) - ws // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    m = np.zeros((n, n), np.float32)
    half = ws // 2
    for i in range(n):
        for t in range(ws):
            j = i + t - half
            if 0 <= j < n:
                m[i, j] += g[t]
    return m


def ssim_train(img1: jax.Array, img2: jax.Array,
               window_size: int = 11) -> jax.Array:
    """Train-time SSIM (zero-padded SAME window, per-sample mean)
    matching loss/ssim.py:64. Inputs (B,C,H,W) in [0,1]; returns (B,).
    The separable Gaussian runs as two banded matmuls on the MXU."""
    h, w_ = img1.shape[2], img1.shape[3]
    kh = jnp.asarray(_gauss_band(h, window_size))
    kw = jnp.asarray(_gauss_band(w_, window_size))

    def conv(x):
        y = jnp.einsum('oh,bchw->bcow', kh, x)
        return jnp.einsum('ow,bchw->bcho', kw, y)

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1s = mu1 * mu1
    mu2s = mu2 * mu2
    mu12 = mu1 * mu2
    s1 = conv(img1 * img1) - mu1s
    s2 = conv(img2 * img2) - mu2s
    s12 = conv(img1 * img2) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1)
                                              * (s1 + s2 + c2))
    return m.mean(axis=(1, 2, 3))
