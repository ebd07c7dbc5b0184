"""LR schedules + optimizer construction.

Reference analogs: learning/lr_scheduler.MyStepLR:6 (single-step decay
with a min-lr floor), torch MultiStepLR, and utils_instance.py:216-290
(Adam/SGD construction, schedulers stepped PER ITERATION via
model_base.update_learning_rate:100).

torch-Adam weight decay is L2-added-to-gradient (not decoupled AdamW), so
the optax chain is clip -> add_decayed_weights -> scale_by_adam ->
scale_by_learning_rate.
"""
from typing import Callable

import optax

from srcaco2_tpu import constants


def build_schedule(tr: dict) -> Callable:
    base_lr = float(tr['G_optimizer_lr'])
    kind = tr['G_scheduler_type']
    gamma = float(tr['G_scheduler_gamma'])
    # Optional linear warmup over the first N iterations (multiplied
    # onto either scheduler kind). Not a reference feature (its
    # published recipe avoids warm-start instability by training SGD,
    # README.md:152-159); with Adam, nets whose residual trunks start
    # loud (VDSR/DRRN-class) die to zero-residual without it — see
    # docs/QUALITY.md "training-dynamics parity".
    warm = int(tr.get('G_scheduler_warmup', 0) or 0)
    if kind == constants.MYSTEPLR:
        step_size = int(tr['G_scheduler_step_size'])
        min_lr = float(tr['G_scheduler_min_lr'])
        import jax.numpy as jnp

        def sched(count):
            lr = base_lr * (gamma ** (count // step_size))
            lr = jnp.maximum(lr, min_lr)
            if warm > 0:
                lr = lr * jnp.minimum(1.0, (count + 1) / warm)
            return lr
        return sched
    if kind == constants.MULTISTEPLR:
        milestones = [int(m) for m in tr['G_scheduler_milestones']]
        bounds = {m: gamma for m in milestones}
        base = optax.piecewise_constant_schedule(base_lr, bounds)
        if warm > 0:
            import jax.numpy as jnp

            def sched(count):
                return base(count) * jnp.minimum(1.0,
                                                 (count + 1) / warm)
            return sched
        return base
    raise NotImplementedError(kind)


def build_optimizer(tr: dict) -> optax.GradientTransformation:
    sched = build_schedule(tr)
    chain = []
    clip = float(tr.get('G_optimizer_clipgrad', 0.0) or 0.0)
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    wd = float(tr.get('G_optimizer_wd', 0.0) or 0.0)
    if wd > 0:
        chain.append(optax.add_decayed_weights(wd))
    kind = tr['G_optimizer_type']
    if kind == constants.ADAM:
        if bool(tr.get('G_optimizer_amsgrad', False)):
            chain.append(optax.scale_by_amsgrad(
                b1=float(tr['G_optimizer_beta1']),
                b2=float(tr['G_optimizer_beta2']),
                eps=float(tr['G_optimizer_eps_adam'])))
        else:
            chain.append(optax.scale_by_adam(
                b1=float(tr['G_optimizer_beta1']),
                b2=float(tr['G_optimizer_beta2']),
                eps=float(tr['G_optimizer_eps_adam'])))
    elif kind == constants.SGD:
        mom = float(tr.get('G_optimizer_momentum', 0.0) or 0.0)
        if mom > 0:
            chain.append(optax.trace(
                decay=mom,
                nesterov=bool(tr.get('G_optimizer_nesterov', False))))
    else:
        raise NotImplementedError(kind)
    chain.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*chain)
