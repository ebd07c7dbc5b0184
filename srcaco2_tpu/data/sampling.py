"""Patch-origin sampling: uniform / ROI / EDT / EDT*ROI.

Behavioral parity with the reference PatchSampler
(dlib/datasets/dataset_dpsr.py:293-508):
  * sampling happens on the bicubically pre-upscaled LR image (uint8);
  * a patch *center* is drawn over the valid-center grid
    [psize//2, H-ceil(psize/2)) with per-pixel weights, origin = center
    - psize//2;
  * ROI weights: exp(5*roi)+1;  EDT weights: edt+1;  EDT*ROI: the product
    of both normalized maps;
  * ROI = (img >= th) with th fixed or Otsu (nbins = number of colors).

TPU-native split: the *uniform* and *ROI* strategies run fully on device
(Otsu over a 256-bin histogram + Gumbel categorical draw) inside the jitted
input pipeline; EDT needs scipy's distance transform and stays a host-side
step (precomputed per image and cached).
"""
import numpy as np
import jax
import jax.numpy as jnp

from srcaco2_tpu import constants


# --------------------------------------------------------------- host side
def otsu_threshold(img: np.ndarray, nbins: int = 256) -> float:
    """Otsu's method over the image value range (skimage-compatible):
    returns the bin center maximizing inter-class variance."""
    img = np.asarray(img).ravel()
    vmin, vmax = img.min(), img.max()
    if vmin == vmax:
        return float(vmin)
    hist, edges = np.histogram(img, bins=nbins,
                               range=(float(vmin), float(vmax)))
    centers = (edges[:-1] + edges[1:]) / 2.0
    hist = hist.astype(np.float64)
    w1 = np.cumsum(hist)
    w2 = np.cumsum(hist[::-1])[::-1]
    m1 = np.cumsum(hist * centers) / np.maximum(w1, 1e-12)
    m2 = (np.cumsum((hist * centers)[::-1]) / np.maximum(w2[::-1], 1e-12)
          )[::-1]
    var_between = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    idx = np.argmax(var_between)
    return float(centers[idx])


def roi_mask(img: np.ndarray, threshold_style: str, threshold,
             nbins: int = 256) -> np.ndarray:
    if threshold_style == constants.TH_AUTO:
        th = otsu_threshold(img, nbins)
    elif threshold_style == constants.TH_FIX:
        th = float(threshold)
    else:
        raise NotImplementedError(threshold_style)
    return (img >= th).astype(np.float64)


def edt_map(roi: np.ndarray) -> np.ndarray:
    """Euclidean distance transform of the ROI (host; scipy)."""
    from scipy.ndimage import distance_transform_edt
    return distance_transform_edt(roi)


def _center_crop_window(m: np.ndarray, psize: int) -> np.ndarray:
    h, w = m.shape
    lhalf = psize // 2
    rhalf = -(-psize // 2)  # ceil
    return m[lhalf:h - rhalf, lhalf:w - rhalf]


def origin_prob_map(img: np.ndarray, sample_type: str, psize: int,
                    threshold_style: str = constants.TH_AUTO,
                    threshold=None, nbins: int = 256) -> np.ndarray:
    """Probability map over valid patch centers (host reference path)."""
    if sample_type == constants.SAMPLE_UNIF:
        win = _center_crop_window(np.zeros_like(img, dtype=np.float64),
                                  psize)
        return np.full(win.shape, 1.0 / win.size)
    roi = roi_mask(img, threshold_style, threshold, nbins)
    if sample_type == constants.SAMPLE_ROI:
        t = np.exp(_center_crop_window(roi, psize) * 5.0) + 1.0
        return t / t.sum()
    if sample_type == constants.SAMPLE_EDT:
        t = _center_crop_window(edt_map(roi), psize) + 1.0
        return t / t.sum()
    if sample_type == constants.SAMPLE_EDTXROI:
        tr = np.exp(_center_crop_window(roi, psize) * 5.0) + 1.0
        te = _center_crop_window(edt_map(roi), psize) + 1.0
        p = (tr / tr.sum()) * (te / te.sum())
        return p / p.sum()
    raise NotImplementedError(sample_type)


def sample_origin_host(rng: np.random.Generator, img: np.ndarray,
                       sample_type: str, psize: int,
                       threshold_style: str = constants.TH_AUTO,
                       threshold=None):
    """Draw one (x0, y0) patch origin on host."""
    h, w = img.shape
    if sample_type == constants.SAMPLE_UNIF:
        return (int(rng.integers(0, max(0, h - psize) + 1)),
                int(rng.integers(0, max(0, w - psize) + 1)))
    p = origin_prob_map(img, sample_type, psize, threshold_style, threshold)
    flat = rng.choice(p.size, p=p.ravel())
    ch, cw = np.unravel_index(flat, p.shape)
    # center = cropped index + psize//2; origin = center - psize//2 = index.
    return int(ch), int(cw)


# -------------------------------------------------------------- device side
def otsu_threshold_device(img_u8: jax.Array, nbins: int = 256) -> jax.Array:
    """Jittable Otsu over a uint8 image (2D). Bins span [min, max] like the
    host version."""
    x = img_u8.astype(jnp.float32).ravel()
    vmin = x.min()
    vmax = x.max()
    span = jnp.maximum(vmax - vmin, 1e-6)
    idxs = jnp.clip(((x - vmin) / span * nbins).astype(jnp.int32), 0,
                    nbins - 1)
    hist = jnp.zeros((nbins,), jnp.float32).at[idxs].add(1.0)
    centers = vmin + (jnp.arange(nbins, dtype=jnp.float32) + 0.5) \
        * (span / nbins)
    w1 = jnp.cumsum(hist)
    w2 = jnp.cumsum(hist[::-1])[::-1]
    m1 = jnp.cumsum(hist * centers) / jnp.maximum(w1, 1e-12)
    m2 = (jnp.cumsum((hist * centers)[::-1])
          / jnp.maximum(w2[::-1], 1e-12))[::-1]
    var_between = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    idx = jnp.argmax(var_between)
    th = centers[idx]
    return jnp.where(vmax == vmin, vmin, th)


def edt_device(roi: jax.Array, max_dist: int = 48) -> jax.Array:
    """Octagonal-chamfer approximation of the Euclidean distance
    transform on device: distance = number of erosions a pixel
    survives, ALTERNATING 4-neighborhood (cross) and 8-neighborhood
    (full 3x3) structuring elements so a diagonal unit costs ~1.5 per
    two steps (~=sqrt(2); classic octagonal metric, <=4% radial error
    vs Euclidean) instead of the 3x3-only L-inf metric. Capped at
    max_dist. Exact EDT stays available on host (edt_map); this keeps
    the EDT/EDT*ROI sampling strategies fully in-jit. Behavioral
    agreement with scipy is tested on 512^2 cell-like ROI maps
    (tests/test_failure_surfacing.py)."""
    def body(dist_roi, i):
        dist, r = dist_roi
        rp = jnp.pad(r, 1, mode='constant')

        def sl(dy, dx):
            return jax.lax.dynamic_slice(rp, (1 + dy, 1 + dx), r.shape)

        cross = r
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            cross = jnp.minimum(cross, sl(dy, dx))
        full = cross
        for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
            full = jnp.minimum(full, sl(dy, dx))
        eroded = jnp.where(i % 2 == 0, cross, full)
        return (dist + eroded, eroded), None

    (dist, _), _ = jax.lax.scan(body, (roi, roi),
                                jnp.arange(max_dist))
    return dist


def sample_origin_device(key: jax.Array, img_u8: jax.Array, psize: int,
                         sample_type: str,
                         threshold_style: str = constants.TH_AUTO,
                         threshold: float = 0.0):
    """Jittable origin draw for uniform / ROI strategies on a 2D uint8
    image. Returns (x0, y0) int32 scalars."""
    h, w = img_u8.shape
    if sample_type == constants.SAMPLE_UNIF:
        kx, ky = jax.random.split(key)
        x0 = jax.random.randint(kx, (), 0, max(0, h - psize) + 1)
        y0 = jax.random.randint(ky, (), 0, max(0, w - psize) + 1)
        return x0, y0
    assert sample_type == constants.SAMPLE_ROI, \
        f'device sampling supports uniform/roi; {sample_type} runs on host'
    if threshold_style == constants.TH_AUTO:
        th = otsu_threshold_device(img_u8)
    else:
        th = jnp.float32(threshold)
    roi = (img_u8.astype(jnp.float32) >= th).astype(jnp.float32)
    lhalf = psize // 2
    rhalf = -(-psize // 2)
    win = roi[lhalf:h - rhalf, lhalf:w - rhalf]
    weights = jnp.exp(win * 5.0) + 1.0
    flat = jax.random.categorical(key, jnp.log(weights).ravel())
    wh = win.shape[1]
    cx = flat // wh
    cy = flat % wh
    return cx.astype(jnp.int32), cy.astype(jnp.int32)
