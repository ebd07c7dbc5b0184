"""Dense-CRF (bilateral relaxation) loss on top of the native lattice.

Reference analog: dlib/crf/dense_crf_loss.py (DenseCRFLoss) — loss =
-(1/N) sum(s * W s) where W is the bilateral affinity (Gaussian in
(xy/sigma_xy, intensity/sigma_rgb)), computed with the permutohedral
lattice; gradient wrt s is -(2/N) W s because W is symmetric.

JAX integration: the lattice runs on host via pure_callback; the custom
VJP uses the same filtered tensor, so the backward pass costs nothing
extra. (This loss backs the reference's WSOL heritage — inventoried for
capability parity; it is not on the SR benchmark path.)
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _filter_host(images, segs, sigma_rgb, sigma_xy):
    from srcaco2_tpu import native
    return native.bilateral_filter(np.asarray(images), np.asarray(segs),
                                   float(sigma_rgb), float(sigma_xy))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dense_crf_loss(images: jax.Array, segmentations: jax.Array,
                   sigma_rgb: float = 15.0, sigma_xy: float = 80.0):
    """images: (N,C,H,W) [0,255]; segmentations: (N,K,H,W) softmaxed."""
    loss, _ = _fwd(images, segmentations, sigma_rgb, sigma_xy)
    return loss


def _fwd(images, segmentations, sigma_rgb, sigma_xy):
    filtered = jax.pure_callback(
        lambda im, sg: _filter_host(im, sg, sigma_rgb, sigma_xy),
        jax.ShapeDtypeStruct(segmentations.shape, jnp.float32),
        images, segmentations.astype(jnp.float32))
    n = segmentations.shape[0]
    loss = -(segmentations * filtered).sum() / n
    return loss, (filtered, n)


def _bwd(sigma_rgb, sigma_xy, res, g):
    filtered, n = res
    return None, -2.0 * g * filtered / n


dense_crf_loss.defvjp(_fwd, _bwd)
