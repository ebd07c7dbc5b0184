#!/usr/bin/env python
"""Perf decomposition probe for the flagship SwinIR x8 train step.

Times, separately:
  1. one fused Swin block fwd (pallas kernel)
  2. one fused Swin block fwd+bwd (custom VJP)
  3. full model fwd (train shapes)
  4. full model fwd+bwd (loss grad, no optimizer)
  5. full train step (pipeline + grad + optimizer + EMA)
so the gap hunt is measured, not asserted.  Run on the real TPU.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np


def timeit(fn, *args, n=20, warmup=2):
    import jax
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    # axon block_until_ready unreliability: force a host read
    _force_read(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _force_read(r)
    return (time.perf_counter() - t0) / n * 1e3   # ms


def _force_read(r):
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(r)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)).ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--steps', type=int, default=20)
    ns = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             '..', '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp
    from srcaco2_tpu import constants
    from srcaco2_tpu.config.defaults import get_config
    from srcaco2_tpu.data import pipeline as P
    from srcaco2_tpu.losses.master import build_loss
    from srcaco2_tpu.models.swinir import SwinIR
    from srcaco2_tpu.train.schedule import build_optimizer
    from srcaco2_tpu.train.state import TrainState
    from srcaco2_tpu.train.steps import make_train_step

    from srcaco2_tpu.models.swin_fused import FusedBlockStack
    from srcaco2_tpu.ops.pallas.swin_block import build_attn_bias

    scale, h_size = 8, 128
    ls = h_size // scale       # 16 -> T=256
    b = ns.batch
    c, heads, mlp = 180, 6, 2.0
    key = jax.random.key(0)

    print(f'device={jax.devices()[0]} batch={b}', flush=True)

    # ---- 1/2: single fused block stack (depth 2 = one scan pair) ----
    stack = FusedBlockStack(dim=c, depth=2, num_heads=heads,
                            window_size=8, mlp_ratio=mlp,
                            dtype=jnp.bfloat16)
    x = jax.random.normal(key, (b, ls, ls, c), jnp.bfloat16)
    sp = stack.init(key, x)

    fwd = jax.jit(lambda p, x: stack.apply(p, x))
    ms = timeit(fwd, sp, x, n=ns.steps)
    print(f'fused 2-block stack fwd:        {ms:8.3f} ms '
          f'({ms/2:6.3f} /block)', flush=True)

    def loss2(p, x):
        return jnp.sum(stack.apply(p, x).astype(jnp.float32))
    g2 = jax.jit(jax.grad(loss2))
    ms2 = timeit(g2, sp, x, n=ns.steps)
    print(f'fused 2-block stack fwd+bwd:    {ms2:8.3f} ms '
          f'({ms2/2:6.3f} /block)', flush=True)
    print(f'  -> extrapolated 36 blocks train: {ms2*18:8.1f} ms',
          flush=True)

    # ---- 3/4: full model ----
    model = SwinIR(in_chans=1, upscale=scale, window_size=8,
                   embed_dim=c, depths=(6,) * 6, num_heads=(heads,) * 6,
                   mlp_ratio=mlp,
                   upsampler=constants.US_PIXEL_SHUFFLE_DIRECT,
                   dtype=jnp.bfloat16, fused_blocks=True)
    x0 = jnp.zeros((1, 1, ls, ls), jnp.float32)
    params = model.init(jax.random.key(0), x0, train=False)['params']
    xb = jax.random.uniform(key, (b, 1, ls, ls), jnp.float32)

    mfwd = jax.jit(lambda p, x: model.apply({'params': p}, x,
                                            train=True)['out'])
    ms = timeit(mfwd, params, xb, n=ns.steps)
    print(f'full model fwd:                 {ms:8.3f} ms', flush=True)

    yb = jax.random.uniform(key, (b, 1, h_size, h_size), jnp.float32)

    def mloss(p, x, y):
        out = model.apply({'params': p}, x, train=True)['out']
        return jnp.mean((out - y) ** 2)
    mgrad = jax.jit(jax.grad(mloss))
    ms = timeit(mgrad, params, xb, yb, n=ns.steps)
    print(f'full model fwd+bwd (l2 only):   {ms:8.3f} ms', flush=True)

    # ---- 5: full train step ----
    args = get_config(constants.SWINIR)
    args['l2'] = True
    args['ssim'] = True
    args['ssim_lambda'] = 5.0
    args['ssim_window_s'] = 19
    master = build_loss(args)
    tx = build_optimizer(args['train'])
    state = TrainState.create(params, tx)
    pipe_cfg = P.PipeConfig(scale=scale, h_size=h_size)
    step_fn = make_train_step(model, master, tx, constants.SWINIR,
                              pipe_cfg, steps_per_epoch=1000)
    rng = np.random.default_rng(0)
    n_img = 256
    hr = jnp.asarray(rng.integers(0, 256, (n_img, 512, 512, 1)),
                     jnp.uint8)
    lr = jnp.asarray(rng.integers(0, 256, (n_img, 512 // scale,
                                           512 // scale, 1)), jnp.uint8)
    idx = jax.random.randint(jax.random.key(1), (b,), 0, n_img)

    def run_step(state):
        s2, holder, ok = step_fn(state, hr, lr, idx, key)
        return holder['total']
    ms = timeit(run_step, state, n=ns.steps)
    print(f'full train step:                {ms:8.3f} ms '
          f'-> {b / (ms / 1e3):7.1f} patches/s', flush=True)


if __name__ == '__main__':
    main()
