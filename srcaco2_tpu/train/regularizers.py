"""Periodic weight regularizers.

Reference analogs: utils_regularizers.regularizer_orth2 (SVD of conv
kernels; singular values above 1.5x their mean nudged down by eps) and
regularizer_clip (weights/biases outside [-1.5, 1.5] nudged toward the
range by eps), applied every G_regularizer_{orth,clip}step iterations
(model_plain.py:365-387).

Jitted pytree transforms here; the trainer invokes them on the schedule.
"""
import jax
import jax.numpy as jnp
import flax


def _orth_kernel(w: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Soft-orthogonalize one conv kernel (H, W, I, O): SVD over the
    (H*W*I, O) matrix, shrink outlier singular values."""
    shape = w.shape
    mat = w.reshape(-1, shape[-1])
    u, s, vt = jnp.linalg.svd(mat, full_matrices=False)
    s_mean = s.mean()
    s = jnp.where(s > 1.5 * s_mean, s - eps, s)
    return (u @ (s[:, None] * vt)).reshape(shape)


@jax.jit
def regularizer_orth(params):
    """Apply soft SVD orthogonalization to every conv kernel (ndim 4)."""
    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        if path[-1] == 'kernel' and leaf.ndim == 4:
            out[path] = _orth_kernel(leaf)
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)


@jax.jit
def regularizer_clip(params, c_min: float = -1.5, c_max: float = 1.5,
                     eps: float = 1e-4):
    """Nudge out-of-range weights/biases toward [c_min, c_max]."""
    def clip_leaf(x):
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        x = jnp.where(x > c_max, x - eps, x)
        return jnp.where(x < c_min, x + eps, x)

    return jax.tree.map(clip_leaf, params)
