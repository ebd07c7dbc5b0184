"""Jitted train/eval steps.

Reference analogs: ModelPlain.optimize_parameters:318 (forward -> loss ->
backward -> clip -> step -> EMA -> corruption check), netG_forward:178
(input switch: pre-upsampling nets consume l_to_h_img), the per-net loss
dispatch for curriculum/progressive models (model_plain.py:203-316), and
the non-finite-loss step skip (:343).

TPU redesign: the whole step — including the input-pipeline batch assembly
— is one jitted function with donated state. The non-finite skip keeps the
old state via jnp.where instead of host control flow, and 'corruption' is
returned as a scalar flag the host checks asynchronously.
"""
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.data import pipeline as P
from srcaco2_tpu.losses.master import MasterLoss
from srcaco2_tpu.ops.resize import resize2d
from srcaco2_tpu.train.state import TrainState, all_finite, ema_update


def net_input(net_type: str, batch: dict, netG: dict = None) -> jax.Array:
    """Pre-upsampling nets consume the bicubic pre-upscale
    (model_plain.py:186: SRCNN and non-pyramid CSR-CNN)."""
    if net_type in constants.PRE_UPSAMPLED_INPUT_NETS:
        return batch['l_to_h_img']
    if net_type == constants.CSRCNN:
        sub = (netG or {}).get('csrcnn_net_type',
                               constants.NET_TYPE_UNET)
        if sub != constants.NET_TYPE_PYRAMID:
            return batch['l_to_h_img']
    return batch['l_im']


def compute_model_loss(net_type: str, master: MasterLoss, outputs: dict,
                       batch: dict, params, epoch, elb_t):
    """Per-net loss dispatch (model_plain.py:203-316): curriculum models
    supervise every intermediate output; progressive/pyramid models
    supervise each level against the correspondingly downscaled target."""
    target = batch['h_im']
    inter = outputs.get('intermediate_outs')
    if inter is None:
        return master(outputs, batch, params, epoch, elb_t)

    total = jnp.zeros((), jnp.float32)
    holder = None

    def acc(t_i, h_i, total, holder):
        total = total + t_i
        holder = h_i if holder is None else \
            {k: holder[k] + h_i[k] for k in holder}
        return total, holder

    if net_type in (constants.SRFBN,):
        # curriculum: every unrolled step's output vs the full-res
        # target, averaged over steps (loss_srfbn:202).
        for o in inter:
            t_i, h_i = master({**outputs, 'out': o}, batch, params,
                              epoch, elb_t)
            total, holder = acc(t_i, h_i, total, holder)
        n = float(len(inter))
        return total / n, {k: v / n for k, v in holder.items()}
    if net_type in (constants.MSLAPSR, constants.PROSR):
        # progressive: final loss + per-level losses vs bicubic
        # (align_corners=True) downscaled targets, averaged over len+1
        # (loss_prosr:236 / loss_mslaprs:277).
        t_i, h_i = master(outputs, batch, params, epoch, elb_t)
        total, holder = acc(t_i, h_i, total, holder)
        for o in inter:
            hh, ww = o.shape[-2], o.shape[-1]
            t_lvl = jnp.clip(
                resize2d(target, (hh, ww), align_corners=True), 0.0, 1.0)
            b_lvl = {k: v for k, v in batch.items()
                     if k != 'h_per_pixel_weight'}
            b_lvl['h_im'] = t_lvl
            t_i, h_i = master({**outputs, 'out': o}, b_lvl, params,
                              epoch, elb_t)
            total, holder = acc(t_i, h_i, total, holder)
        n = float(len(inter) + 1)
        return total / n, {k: v / n for k, v in holder.items()}
    return master(outputs, batch, params, epoch, elb_t)


def make_train_step(model, master: MasterLoss, tx, net_type: str,
                    pipe_cfg: P.PipeConfig, e_decay: float = 0.0,
                    steps_per_epoch: int = 1,
                    ppiw_table: Optional[jax.Array] = None,
                    donate: bool = True, mesh=None,
                    netG: dict = None,
                    steps_per_call: int = 1) -> Callable:
    """Build the jitted train step:
    (state, hr_u8, lr_u8, idxs, key) -> (state, loss_holder, ok_flag).
    With a mesh, batch indices are sharded over the 'data' axis and XLA
    all-reduces gradients over ICI (parallel/mesh.shard_train_step).

    steps_per_call > 1 (single-chip only): the SUPERSTEP — a
    lax.scan over K steps inside one jitted call, so dispatch-bound
    small models (VDSR-class) pay one host dispatch per K optimizer
    updates instead of per update. idxs then has shape (K, batch) and
    the returned holder's entries are (K,)-stacked per-step values.
    Per-step semantics match K dispatched steps (losses bit-equal;
    params to a few ulps of XLA fusion reordering —
    tests/test_train_e2e.py): the RNG folds on state.step INSIDE the
    scan body, the optimizer / EMA / skip logic run per step, and
    each distinct K compiles its own executable (the trainer chunks so boundaries never split a
    logging/eval interval)."""

    def step_fn(state: TrainState, hr_u8, lr_u8, idxs, key):
        epoch = state.step // steps_per_epoch
        skey = jax.random.fold_in(key, state.step)
        batch = P.make_train_batch(hr_u8, lr_u8, idxs, skey, pipe_cfg,
                                   ppiw_table)
        x = net_input(net_type, batch, netG)

        def loss_fn(params):
            # 'lsh' stream: NLSN redraws its hash rotations per forward
            # (network_nlsn.py:147); harmless for models without it.
            rngs = {'lsh': jax.random.fold_in(skey, 0x15a)}
            if state.model_state:
                # stateful models (BN running stats — MemNet): collect
                # the updated collections; like torch, stats update
                # even on skipped steps (the forward already ran).
                outputs, new_ms = model.apply(
                    {'params': params, **state.model_state}, x,
                    train=True, rngs=rngs,
                    mutable=list(state.model_state))
            else:
                outputs = model.apply(
                    {'params': params}, x, train=True, rngs=rngs)
                new_ms = None
            total, holder = compute_model_loss(
                net_type, master, outputs, batch, params, epoch,
                state.elb_t)
            return total, (holder, outputs['out'], new_ms)

        (loss, (holder, pred, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # non-finite loss -> skip the update (model_plain.py:343).
        ok = jnp.isfinite(loss) & all_finite(grads)
        zero_grads = jax.tree.map(jnp.zeros_like, grads)
        safe_grads = jax.tree.map(
            lambda g, z: jnp.where(ok, g, z), grads, zero_grads)
        updates, new_opt = tx.update(safe_grads, state.opt_state,
                                     state.params)
        new_params = jax.tree.map(
            lambda p, u: jnp.where(ok, p + u, p), state.params, updates)
        new_ema = state.ema_params
        if e_decay > 0 and state.ema_params is not None:
            new_ema = ema_update(state.ema_params, new_params, e_decay)

        # corruption flag (tools.check_corruption analog): non-finite or
        # negative-free checks run on device; the trainer reads it one
        # step behind (async) and HARD-STOPS like the reference
        # (model_plain.py:343-345 exits every step on corruption).
        corrupt = ~all_finite(new_params) | ~jnp.all(jnp.isfinite(pred))
        holder = dict(holder)
        holder['_skipped'] = (~ok).astype(jnp.float32)
        holder['_corrupt'] = corrupt.astype(jnp.float32)
        # packed flag so the trainer's per-step surfacing costs ONE
        # device->host read (the axon tunnel charges per transfer)
        holder['_flags'] = holder['_skipped'] + 2.0 * holder['_corrupt']

        new_state = state.replace(step=state.step + 1,
                                  params=new_params,
                                  opt_state=new_opt,
                                  ema_params=new_ema,
                                  model_state=new_ms)
        return new_state, holder, ok & ~corrupt

    def multi_fn(state: TrainState, hr_u8, lr_u8, idxs_k, key):
        def body(st, ix):
            st2, holder, ok = step_fn(st, hr_u8, lr_u8, ix, key)
            return st2, (holder, ok)
        state, (holders, oks) = jax.lax.scan(body, state, idxs_k)
        return state, holders, jnp.all(oks)

    if mesh is not None:
        # Superstep x mesh (round 4, VERDICT r3 #5): the scan'd K-step
        # body shards exactly like the single step — idxs (K, batch)
        # with the BATCH axis on 'data' (K unsharded), state/data
        # replicated; XLA inserts the gradient all-reduce inside each
        # scan iteration, so per-step semantics (and the DDP
        # allreduce-per-step analog, model_base.py:135) are preserved
        # while K dispatches collapse into one.
        from srcaco2_tpu.parallel.mesh import shard_train_step
        if steps_per_call > 1:
            return shard_train_step(multi_fn, mesh, idxs_rank=2)
        return shard_train_step(step_fn, mesh)
    if steps_per_call > 1:
        return jax.jit(multi_fn, donate_argnums=(0,) if donate else ())
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_forward(model, net_type: str, scale: int,
                      use_ema: bool = False,
                      netG: dict = None,
                      test_mode: int = 0) -> Callable:
    """Jitted full-image forward: (params, batch) -> uint8-rounded
    prediction in [0,255] NCHW. Window-padded models (SwinIR/GRL) pad
    internally with static shapes, replacing _forward_with_padding
    (utils_trainer.py:829). test_mode != 0 wraps the forward in the
    tiled/x8 inference modes (train/test_modes.py; utils_model analog).
    """

    @jax.jit
    def fwd(params, batch, model_state=None):
        x = net_input(net_type, batch, netG)

        def raw(z):
            variables = {'params': params}
            if model_state:
                variables.update(model_state)
            return model.apply(variables, z, train=False)['out']

        if test_mode:
            from srcaco2_tpu.train.test_modes import test_mode as tm
            out = tm(raw, x, mode=test_mode, sf=scale)
        else:
            out = raw(x)
        return jnp.clip(jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0),
                        0.0, 255.0)

    return fwd
