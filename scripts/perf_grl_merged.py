#!/usr/bin/env python
"""A/B the GRL merged-attention path (SRCACO2_GRL_MERGED) vs the
windowed reference formulation on the real chip: full train step at
the parity-run shape and the 512^2 eval forward. Interleaved rounds,
medians (perf_ab discipline). The merged path is numerically equal
(tests/test_grl_merged.py); this measures what the
fewer-bigger-ops trade is worth against the component-probe ceiling
(scripts/grl_component_probe.py: attention = 46.3% of the step).

Usage: python scripts/perf_grl_merged.py [--batch 32] [--scale 4]
"""
import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--scale', type=int, default=4)
    ap.add_argument('--h_size', type=int, default=64)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--rounds', type=int, default=5)
    ap.add_argument('--eval_iters', type=int, default=6)
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

    scale, h_size, b = ns.scale, ns.h_size, ns.batch
    rng = np.random.default_rng(0)
    n_img = 64
    hr = jnp.asarray(rng.integers(0, 256, (n_img, 512, 512, 1)),
                     jnp.uint8)
    lr = jnp.asarray(rng.integers(0, 256, (n_img, 512 // scale,
                                           512 // scale, 1)), jnp.uint8)
    key = jax.random.key(0)
    idx = jax.random.randint(jax.random.key(1), (b,), 0, n_img)

    arms = {}
    for name, env in (('windowed', '0'), ('merged', '1')):
        os.environ['SRCACO2_GRL_MERGED'] = env
        args = get_config(constants.GRL)
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
        sample = jnp.zeros((1, 1, h_size // scale, h_size // scale),
                           jnp.float32)
        params, model_state = init_variables(model, key, sample)
        state = TrainState.create(params, tx,
                                  model_state=model_state or None)
        step_fn = make_train_step(model, master, tx, constants.GRL,
                                  pipe_cfg, steps_per_epoch=1000,
                                  netG=args['netG'])
        t0 = time.perf_counter()
        state, holder, ok = step_fn(state, hr, lr, idx, key)
        float(holder['total'])
        print(f'# {name:9s} train compiled in '
              f'{time.perf_counter() - t0:.1f}s', flush=True)
        x_ev = jnp.asarray(rng.random((1, 1, 512 // scale,
                                       512 // scale)), jnp.float32)
        fwd = jax.jit(lambda p, xx, m=model: m.apply(
            {'params': p}, xx, train=False)['out'])
        float(jnp.sum(fwd(state.params, x_ev)))
        arms[name] = (step_fn, state, fwd, x_ev)

    times = {k: [] for k in arms}
    ev_times = {k: [] for k in arms}
    for r in range(ns.rounds):
        for name, (step_fn, state, fwd, x_ev) in arms.items():
            os.environ['SRCACO2_GRL_MERGED'] = \
                '1' if name == 'merged' else '0'
            t0 = time.perf_counter()
            for _ in range(ns.steps):
                state, holder, ok = step_fn(state, hr, lr, idx, key)
            float(holder['total'])
            times[name].append(
                (time.perf_counter() - t0) / ns.steps * 1e3)
            t0 = time.perf_counter()
            for _ in range(ns.eval_iters):
                o = fwd(state.params, x_ev)
            float(jnp.sum(o))
            ev_times[name].append(
                (time.perf_counter() - t0) / ns.eval_iters * 1e3)
            arms[name] = (step_fn, state, fwd, x_ev)

    wt = statistics.median(times['windowed'])
    mt = statistics.median(times['merged'])
    we = statistics.median(ev_times['windowed'])
    me = statistics.median(ev_times['merged'])
    print(f'\n# GRL merged-attention A/B (batch {b}, x{scale}, '
          f'h{h_size}, medians of {ns.rounds})')
    print(f'| arm | train ms/step | patches/s | eval 512^2 ms | img/s |')
    print(f'|---|---|---|---|---|')
    print(f'| windowed | {wt:.1f} | {b / wt * 1e3:.0f} | {we:.1f} | '
          f'{1e3 / we:.1f} |')
    print(f'| merged | {mt:.1f} | {b / mt * 1e3:.0f} | {me:.1f} | '
          f'{1e3 / me:.1f} |')
    print(f'# speedup: train {wt / mt:.2f}x, eval {we / me:.2f}x '
          f'(kernel-attempt bar: 1.5x on either)')


if __name__ == '__main__':
    main()
