#!/usr/bin/env python
"""Train-step throughput across the model zoo on the real TPU.

One process, one jitted full train step per net (in-jit pipeline +
fwd + bwd + optimizer + EMA, bf16), warm compile then timed loop.
Writes a markdown table to docs/THROUGHPUT.md (also printed).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np


def batch_caps():
    """Per-net train-batch caps on a 16 GB chip (shared with
    scripts/roofline_zoo.py so FLOP counts describe the measured
    configs). Rationale in the comment block above the EVAL_B dict."""
    from srcaco2_tpu import constants
    return {constants.DBPN: 32, constants.DRRN: 32,
            constants.MEMNET: 16, constants.GRL: 32,
            constants.SRFBN: 16}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=15)
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--scale', type=int, default=8)
    ap.add_argument('--nets', default='')
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '..', 'docs',
        'THROUGHPUT.md'))
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from srcaco2_tpu import constants
    from srcaco2_tpu.config.defaults import get_config
    from srcaco2_tpu.config.parser import _derive
    from srcaco2_tpu.data import pipeline as P
    from srcaco2_tpu.losses.master import build_loss
    from srcaco2_tpu.models.registry import define_g, init_variables
    from srcaco2_tpu.train.schedule import build_optimizer
    from srcaco2_tpu.train.state import TrainState
    from srcaco2_tpu.train.steps import make_train_step

    scale = ns.scale
    h_size = 128
    b = ns.batch
    rng = np.random.default_rng(0)
    n_img = 128
    hr = jnp.asarray(rng.integers(0, 256, (n_img, 512, 512, 1)),
                     jnp.uint8)
    lr = jnp.asarray(rng.integers(0, 256, (n_img, 512 // scale,
                                           512 // scale, 1)), jnp.uint8)
    key = jax.random.key(0)

    NETS = ns.nets.split(',') if ns.nets else [
        constants.SRCNN, constants.VDSR, constants.DRRN,
        constants.MEMNET, constants.DFCAN,
        constants.NLSN, constants.ENLCN, constants.OMNISR,
        constants.DBPN, constants.SRFBN, constants.MSLAPSR,
        constants.PROSR, constants.EDSR_LIIF, constants.ACT,
        constants.GRL, constants.DSRSPLINES, constants.CSRCNN,
        constants.SWINIR]
    # DBPN-MR64-3 x8 dense connectivity needs ~33GB of activations at
    # batch 64 on 128^2 outputs — past the 16GB chip even with
    # per-block remat; its hardware-supported batch here is <= 32.
    # DRRN/MemNet recurse at HR size (25 and 6 recursions of shared
    # convs); GRL runs 7 mixed-attention stages — HBM-capped likewise.
    # MemNet's 6 memory blocks keep every recursion's gate inputs
    # alive at HR size (compile OOMs at batch 32); SRFBN unrolls its
    # feedback block 4x with dense in-block connectivity (OOMs at 64).
    # (SRFBN: per-step remat, models/srfbn.py remat_steps, lifts the
    # supported batch to 32 but measures slower — 180 vs 194 p/s —
    # so the default path stays batch 16 without remat.)
    BATCH_CAP = batch_caps()
    # 512^2 full-image eval forward batch (HBM-bound for attention
    # nets: NLSN's LSH one-hot is quadratic in token count at 64^2+).
    EVAL_B = {constants.NLSN: 1, constants.ENLCN: 1, constants.GRL: 1,
              constants.ACT: 1, constants.OMNISR: 2,
              constants.SWINIR: 16,  # tiled fused eval path peaks @16
              constants.DRRN: 2,
              constants.MEMNET: 2, constants.DBPN: 2}
    rows = []
    for net in NETS:
        b = min(ns.batch, BATCH_CAP.get(net, ns.batch))
        idx = jax.random.randint(jax.random.key(1), (b,), 0, n_img)
        try:
            args = get_config(net)
            args['l2'] = True
            args['scale'] = scale
            args['h_size'] = h_size
            args['n_channels'] = 1
            args['amp'] = True
            args = _derive(args)
            model = define_g(args)
            master = build_loss(args)
            tx = build_optimizer(args['train'])
            pipe_cfg = P.PipeConfig(scale=scale, h_size=h_size)
            in_hw = h_size if net in constants.PRE_UPSAMPLED_INPUT_NETS \
                else h_size // scale
            sample = jnp.zeros((1, 1, in_hw, in_hw), jnp.float32)
            params, model_state = init_variables(model, key, sample)
            state = TrainState.create(params, tx,
                                      model_state=model_state or None)
            step_fn = make_train_step(model, master, tx, net, pipe_cfg,
                                      steps_per_epoch=1000,
                                      netG=args['netG'])
            t_c0 = time.perf_counter()
            state, holder, ok = step_fn(state, hr, lr, idx, key)
            float(holder['total'])
            compile_s = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            for i in range(ns.steps):
                state, holder, ok = step_fn(state, hr, lr, idx, key)
            float(holder['total'])
            dt = (time.perf_counter() - t0) / ns.steps
            pps = b / dt
            # --- 512^2 full-image eval forward throughput
            eb = EVAL_B.get(net, 4)
            in_hw_ev = 512 if net in constants.PRE_UPSAMPLED_INPUT_NETS \
                else 512 // scale
            x_ev = jnp.asarray(
                rng.random((eb, 1, in_hw_ev, in_hw_ev)), jnp.float32)
            # BN nets (MemNet) carry batch_stats collections: eval
            # apply needs them alongside params. Use the POST-training
            # state's collections — the init-time ones were donated
            # into the first train step and deleted.
            extra = dict(getattr(state, 'model_state', None) or {})
            fwd = jax.jit(lambda p, xx: model.apply(
                {'params': p, **extra}, xx, train=False)['out'])
            ev_ips = None
            try:
                eparams = jax.tree.map(
                    lambda a: a, state.params)  # current params
                float(jnp.sum(fwd(eparams, x_ev)))      # compile+warm
                t0 = time.perf_counter()
                n_ev = max(3, ns.steps // 3)
                for _ in range(n_ev):
                    out_ev = fwd(eparams, x_ev)
                float(jnp.sum(out_ev))
                ev_ips = eb / ((time.perf_counter() - t0) / n_ev)
            except Exception as ee:
                print(f'{net:12s} eval FAILED {type(ee).__name__}: '
                      f'{str(ee)[:120]}', flush=True)
            rows.append((net, round(pps), round(dt * 1e3, 1),
                         round(compile_s, 1), b,
                         round(ev_ips, 1) if ev_ips else None, eb))
            print(f'{net:12s} {pps:8.0f} patches/s  '
                  f'{dt*1e3:7.1f} ms/step  eval '
                  f'{ev_ips or float("nan"):6.1f} img/s', flush=True)
        except Exception as e:
            rows.append((net, None, None, None, b, None, None))
            print(f'{net:12s} FAILED {type(e).__name__}: '
                  f'{str(e)[:160]}', flush=True)

    dev = str(jax.devices()[0])
    lines = [
        '# Model-zoo training throughput (measured)',
        '',
        f'Full train step (in-jit pipeline + fwd + bwd + Adam + EMA), '
        f'l2 loss, bf16 AMP, batch {ns.batch}, X{scale} (HR patch {h_size}), '
        f'single {dev}. One process, sequential: numbers are '
        f'comparable to each other (same machine minute) but carry '
        f'the tunnel\'s process-level variance vs other documents. '
        f'Generated by scripts/bench_zoo.py.',
        '',
        '| net | batch | patches/s | ms/step | compile (s) '
        '| eval 512² img/s (batch) |',
        '|---|---|---|---|---|---|',
    ]
    for net, pps, ms, cs, nb, ev, eb in rows:
        if pps is None:
            lines.append(f'| {net} | {nb} | (failed) | — | — | — |')
        else:
            ev_s = f'{ev} ({eb})' if ev else '—'
            lines.append(f'| {net} | {nb} | {pps} | {ms} | {cs} '
                         f'| {ev_s} |')
    lines.append('')
    with open(ns.out, 'w') as f:
        f.write('\n'.join(lines))
    print(f'wrote {ns.out}')


if __name__ == '__main__':
    main()
