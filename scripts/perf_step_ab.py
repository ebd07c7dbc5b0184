#!/usr/bin/env python
"""In-process A/B of the FULL flagship train step at different batch
sizes (pipeline + fwd + bwd + optimizer + EMA), interleaved to cancel
axon process-level drift. Reports patches/sec per config."""
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
    # NOT donated: the same state is reused across configs/rounds
    step_fn = make_train_step(model, master, tx, constants.SWINIR,
                              pipe_cfg, steps_per_epoch=1000,
                              donate=False)
    rng = np.random.default_rng(0)
    n_img = 256
    hr = jnp.asarray(rng.integers(0, 256, (n_img, 512, 512, 1)),
                     jnp.uint8)
    lr = jnp.asarray(rng.integers(0, 256, (n_img, 512 // scale,
                                           512 // scale, 1)), jnp.uint8)
    key = jax.random.key(0)
    state0 = TrainState.create(params, tx)

    BATCHES = [64, 128, 256]
    idxs = {b: jax.random.randint(jax.random.key(1), (b,), 0, n_img)
            for b in BATCHES}
    # warm up/compile each
    for b in BATCHES:
        try:
            s, h, ok = step_fn(state0, hr, lr, idxs[b], key)
            float(h['total'])
            print(f'compiled batch {b}', flush=True)
        except Exception as e:
            print(f'batch {b} FAILED {type(e).__name__}', flush=True)
            BATCHES.remove(b)

    res = {b: [] for b in BATCHES}
    iters = 12
    for rnd in range(5):
        for b in BATCHES:
            s, h, ok = step_fn(state0, hr, lr, idxs[b], key)
            float(h['total'])
            t0 = time.perf_counter()
            for _ in range(iters):
                s, h, ok = step_fn(state0, hr, lr, idxs[b], key)
            float(h['total'])
            dt = (time.perf_counter() - t0) / iters
            res[b].append(b / dt)
    for b in BATCHES:
        print(f'batch {b:4d}: median {statistics.median(res[b]):8.1f} '
              f'patches/s  runs {[round(v) for v in res[b]]}',
              flush=True)


if __name__ == '__main__':
    main()
