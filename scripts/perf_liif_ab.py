#!/usr/bin/env python
"""In-process A/B: EDSR-LIIF train-step throughput with the ensemble
latent gather as XLA static gathers (take, scatter-add VJP) vs
constant one-hot MXU matmuls (SRCACO2_LIIF_ONEHOT=1, matmul VJP).

Each arm gets its own jitted step (the flag is read at trace time);
timing rounds interleave arms against the tunnel's process drift.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--rounds', type=int, default=4)
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--scale', type=int, default=8)
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

    scale, h_size, b = ns.scale, 128, ns.batch
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.integers(0, 256, (64, 512, 512, 1)), jnp.uint8)
    lr = jnp.asarray(rng.integers(0, 256, (64, 512 // scale,
                                           512 // scale, 1)), jnp.uint8)
    key = jax.random.key(0)
    idx = jax.random.randint(jax.random.key(1), (b,), 0, 64)

    args = get_config(constants.EDSR_LIIF)
    args.update(l2=True, scale=scale, h_size=h_size, n_channels=1,
                amp=True)
    args = _derive(args)
    master = build_loss(args)
    tx = build_optimizer(args['train'])
    pipe_cfg = P.PipeConfig(scale=scale, h_size=h_size)

    arms = {}
    for name, flag in (('take', '0'), ('onehot', '1')):
        os.environ['SRCACO2_LIIF_ONEHOT'] = flag
        model = define_g(args)
        sample = jnp.zeros((1, 1, h_size // scale, h_size // scale),
                           jnp.float32)
        params, mstate = init_variables(model, key, sample)
        state = TrainState.create(params, tx,
                                  model_state=mstate or None)
        step = make_train_step(model, master, tx, constants.EDSR_LIIF,
                               pipe_cfg, steps_per_epoch=1000,
                               netG=args['netG'])
        state, holder, _ = step(state, hr, lr, idx, key)   # compile
        float(holder['total'])
        arms[name] = [state, step, []]

    for _ in range(ns.rounds):
        for name, arm in arms.items():
            os.environ['SRCACO2_LIIF_ONEHOT'] = \
                '1' if name == 'onehot' else '0'
            state, step, times = arm
            t0 = time.perf_counter()
            for _ in range(ns.steps):
                state, holder, _ = step(state, hr, lr, idx, key)
            float(holder['total'])
            times.append((time.perf_counter() - t0) / ns.steps)
            arm[0] = state

    for name, (_, _, times) in arms.items():
        ms = sorted(times)[len(times) // 2] * 1e3
        print(f'{name:7s}: median {ms:7.2f} ms/step '
              f'({b / (ms / 1e3):6.0f} patches/s)  '
              f'rounds {[f"{t*1e3:.1f}" for t in times]}')


if __name__ == '__main__':
    main()
