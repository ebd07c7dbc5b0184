#!/usr/bin/env python
"""In-process A/B: flagship train step dispatched per update vs the
superstep (lax.scan of K updates per dispatch, the trainer default
K=8). Interleaved rounds cancel the axon tunnel's process-level drift.
Reports median patches/sec per config."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from srcaco2_tpu import constants
    from srcaco2_tpu.config.defaults import get_config
    from srcaco2_tpu.data import pipeline as P
    from srcaco2_tpu.losses.master import build_loss
    from srcaco2_tpu.models.swinir import SwinIR
    from srcaco2_tpu.train.schedule import build_optimizer
    from srcaco2_tpu.train.state import TrainState
    from srcaco2_tpu.train.steps import make_train_step

    scale, h_size = 8, 128
    ls = h_size // scale
    batch = 128
    model = SwinIR(in_chans=1, upscale=scale, window_size=8,
                   embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                   mlp_ratio=2.0,
                   upsampler=constants.US_PIXEL_SHUFFLE_DIRECT,
                   dtype=jnp.bfloat16, fused_blocks=True)
    args = get_config(constants.SWINIR)
    args['l2'] = True
    args['ssim'] = True
    args['ssim_lambda'] = 5.0
    args['ssim_window_s'] = 19
    master = build_loss(args)
    tx = build_optimizer(args['train'])
    x0 = jnp.zeros((1, 1, ls, ls), jnp.float32)
    params = model.init(jax.random.key(0), x0, train=False)['params']
    pipe_cfg = P.PipeConfig(scale=scale, h_size=h_size)
    rng = np.random.default_rng(0)
    n_img = 256
    hr = jnp.asarray(rng.integers(0, 256, (n_img, 512, 512, 1)),
                     jnp.uint8)
    lr = jnp.asarray(rng.integers(0, 256, (n_img, 512 // scale,
                                           512 // scale, 1)), jnp.uint8)
    key = jax.random.key(0)
    state0 = TrainState.create(params, tx)

    KS = [1, 4, 8, 16]
    fns = {kk: make_train_step(model, master, tx, constants.SWINIR,
                               pipe_cfg, steps_per_epoch=10 ** 9,
                               donate=False, steps_per_call=kk)
           for kk in KS}
    idxs = {kk: (jax.random.randint(jax.random.key(1),
                                    (kk, batch) if kk > 1 else (batch,),
                                    0, n_img))
            for kk in KS}

    # compile all
    for kk in KS:
        _, h, _ = fns[kk](state0, hr, lr, idxs[kk], key)
        float(jnp.sum(h['total']))

    UPDATES = 32  # per timed rep, per config
    med = {kk: [] for kk in KS}
    for rnd in range(5):
        for kk in KS:
            n_calls = max(1, UPDATES // kk)
            t0 = time.perf_counter()
            for _ in range(n_calls):
                st, h, _ = fns[kk](state0, hr, lr, idxs[kk], key)
            float(jnp.sum(h['total']))
            dt = time.perf_counter() - t0
            med[kk].append(batch * kk * n_calls / dt)
    for kk in KS:
        m = statistics.median(med[kk])
        print(f'K={kk:3d}: median {m:8.1f} patches/s  '
              f'(all: {[round(v, 1) for v in med[kk]]})')


if __name__ == '__main__':
    main()
