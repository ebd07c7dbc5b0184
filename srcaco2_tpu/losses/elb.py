"""Extended log-barrier (ELB) for inequality constraints f(x) <= 0.

Reference analog: dlib/loss/elb.py:15 (Kervadec et al. log-barrier
extension). Functional form: `t` is carried as a traced scalar in the
train state and updated per epoch with t <- min(t * mulcoef, max_t)
(reference: masterloss.update_t via utils_trainer.py:475).
"""
import jax.numpy as jnp


def elb(fx: jnp.ndarray, t) -> jnp.ndarray:
    """Mean extended-log-barrier penalty over a vector of constraint
    values fx (want fx <= 0)."""
    fx = fx.reshape(-1)
    t = jnp.asarray(t, fx.dtype)
    ct = -1.0 / (t * t)
    # log branch (fx <= ct): -(1/t) log(-fx); linear extension otherwise.
    safe_neg = -jnp.minimum(fx, ct)            # >= 1/t^2 > 0
    log_branch = -(1.0 / t) * jnp.log(safe_neg)
    lin_branch = t * fx - (1.0 / t) * jnp.log(1.0 / (t * t)) + 1.0 / t
    return jnp.where(fx <= ct, log_branch, lin_branch).mean()


def update_t(t, mulcoef: float, max_t: float):
    return jnp.minimum(t * mulcoef, max_t)
