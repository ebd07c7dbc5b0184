"""Bicubic-interpolation pseudo-model: the sanity-floor baseline evaluated
at step 0 and alongside every test eval (reference: Interpolate at
utils_trainer.py:89 — F.interpolate(..., antialias=True))."""
import jax
import jax.numpy as jnp

from srcaco2_tpu.ops.resize import resize2d


def interpolate_model(l_im: jax.Array, scale: int,
                      mode: str = 'bicubic') -> dict:
    """l_im: NCHW [0,1] -> upscaled NCHW [0,1], with antialias=True like
    the reference baseline."""
    h, w = l_im.shape[-2], l_im.shape[-1]
    from srcaco2_tpu.ops import resize as R
    method = {'bicubic': R.TORCH_BICUBIC, 'bilinear': R.BILINEAR,
              'nearest': R.NEAREST}[mode]
    out = resize2d(l_im, (h * scale, w * scale), method=method,
                   antialias=True)
    return {'out': jnp.clip(out, 0.0, 1.0)}
