"""Train state pytree: params, optimizer state, EMA (netE analog), ELB t.

Reference analogs: ModelBase netG/netE/optimizerG (model_base.py),
update_E:214 (EMA decay E_decay), masterloss t (elb.py).
"""
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray                       # int32 scalar
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None        # netE when E_decay > 0
    elb_t: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.ones((), jnp.float32))
    model_state: Optional[Any] = None       # e.g. {'batch_stats': ...}

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation,
               e_decay: float = 0.0, elb_init_t: float = 1.0,
               model_state: Optional[Any] = None):
        return cls(step=jnp.zeros((), jnp.int32),
                   params=params,
                   opt_state=tx.init(params),
                   ema_params=jax.tree.map(jnp.copy, params)
                   if e_decay > 0 else None,
                   elb_t=jnp.asarray(elb_init_t, jnp.float32),
                   model_state=model_state or None)


def ema_update(ema, params, decay: float):
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema, params)


def all_finite(tree) -> jnp.ndarray:
    leaves = [jnp.all(jnp.isfinite(x))
              for x in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(x.dtype, jnp.floating)]
    out = jnp.ones((), bool)
    for f in leaves:
        out &= f
    return out
