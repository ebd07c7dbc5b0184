#!/usr/bin/env python
"""Price GRL's step-time components on the real chip (VERDICT r4 #8).

GRL trains at 3.8% of MXU peak (docs/THROUGHPUT.md roofline) — the
small-token attention tax. Before writing a fused kernel for its
4-16-token stripe/window attention shapes, measure what an
infinitely-fast attention kernel could actually buy: each arm replaces
one component with a shape-preserving identity (SRCACO2_GRL_ABLATE,
models/grl.py:_ablate) and times the full jitted train step
(pipeline + fwd + bwd + Adam + EMA, production shapes). If the
all-attention-off arm saves less than 1/3 of the step, no attention
kernel can reach the 1.5x bar — the refusal is then measured, not
argued. Interleaved rounds, medians, same discipline as perf_ab.py.

Usage: python scripts/grl_component_probe.py [--batch 32] [--scale 4]
"""
import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np

ARMS = [
    ('full', ''),
    ('attn_off', 'win,stripe,anchor,cpb,cosnorm'),
    ('win_off', 'win'),
    ('stripe_off', 'stripe'),          # DCE also removes the anchor
    ('cpb_off', 'cpb'),                # CPB MLP + bias + logit scale
    ('cosnorm_off', 'cosnorm'),        # q/k L2 normalization
    ('cab_off', 'cab'),
    ('mlp_off', 'mlp'),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--scale', type=int, default=4)
    ap.add_argument('--h_size', type=int, default=64)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--rounds', type=int, default=5)
    ap.add_argument('--eval', action='store_true',
                    help='also probe the 512^2 eval forward '
                         '(full vs attn_off, batch 1)')
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
    for name, abl in ARMS:
        os.environ['SRCACO2_GRL_ABLATE'] = abl
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
        print(f'# {name:12s} compiled in '
              f'{time.perf_counter() - t0:.1f}s', flush=True)
        arms[name] = (step_fn, state, model, params)

    med = {}
    for name, _ in ARMS:
        med[name] = []
    for r in range(ns.rounds):
        for name, _ in ARMS:
            step_fn, state, _, _ = arms[name]
            t0 = time.perf_counter()
            for _ in range(ns.steps):
                state, holder, ok = step_fn(state, hr, lr, idx, key)
            float(holder['total'])
            med[name].append(
                (time.perf_counter() - t0) / ns.steps * 1e3)
            arms[name] = (step_fn, state, None, None)

    full = statistics.median(med['full'])
    print(f'\n# GRL component pricing (batch {b}, x{scale}, '
          f'h{h_size}, full train step, medians of {ns.rounds})')
    print('| arm | ms/step | saved ms | % of full step |')
    print('|---|---|---|---|')
    for name, abl in ARMS:
        m = statistics.median(med[name])
        print(f'| {name} ({abl or "production"}) | {m:.1f} | '
              f'{full - m:+.1f} | {(full - m) / full * 100:.1f}% |')
    attn = statistics.median(med['attn_off'])
    ceil = full / attn
    print(f'\n# infinite-attention-kernel step speedup ceiling: '
          f'{ceil:.2f}x (bar for a kernel attempt: 1.5x)')

    if ns.eval:
        for name in ('full', 'attn_off'):
            os.environ['SRCACO2_GRL_ABLATE'] = dict(ARMS)[name]
            _, state, _, _ = arms[name]
            args = get_config(constants.GRL)
            args['scale'] = scale
            args['n_channels'] = 1
            args = _derive(args)
            model = define_g(args)
            x_ev = jnp.asarray(rng.random((1, 1, 512 // scale,
                                           512 // scale)), jnp.float32)
            fwd = jax.jit(lambda p, xx: model.apply(
                {'params': p}, xx, train=False)['out'])
            p = arms[name][1].params
            float(jnp.sum(fwd(p, x_ev)))
            t0 = time.perf_counter()
            for _ in range(6):
                o = fwd(p, x_ev)
            float(jnp.sum(o))
            ips = 1 / ((time.perf_counter() - t0) / 6)
            print(f'# eval 512^2 {name}: {ips:.1f} img/s')


if __name__ == '__main__':
    main()
