#!/usr/bin/env python
"""In-process A/B timing of fused-kernel variants.

The axon TPU shows +-25% process-to-process throughput drift (a fixed
conv-net workload swings as much as the kernel under test), so kernel
variants are compared by INTERLEAVED timing inside one process:
round-robin over the compiled variants, several rounds, report medians.
"""
import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=15)
    ap.add_argument('--rounds', type=int, default=5)
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--grad', action='store_true', default=True)
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from srcaco2_tpu.models.swin_fused import FusedBlockStack

    c, heads, mlp, ws = 180, 6, 2.0, 8
    b = ns.batch
    key = jax.random.key(0)

    # (name, env overrides)
    # default set: production kernel vs its main documented variants;
    # edit freely for one-off experiments (bwd ablation flags 'dw',
    # 'attnbwd', 'mlpbwd' give the component breakdown).
    # NOTE: HD_PAD defaults to 'auto' and F32_SOFTMAX defaults to '1'
    # since round 4 (MLP_PAD stays '0' — measured and retired), so
    # every arm pins ALL THREE explicitly — an unset key is NOT the
    # unpadded/bf16 base. Base arms pin the bf16 softmax chain
    # (bench.py's cross-round comparison chain); the last arm prices
    # the f32 chain main.py training defaults to.
    CONFIGS = [
        ('pads-off', {'SRCACO2_SWIN_HD_PAD': '0',
                      'SRCACO2_SWIN_MLP_PAD': '0',
                      'SRCACO2_SWIN_F32_SOFTMAX': '0'}),
        ('hd-pad-32 (prod)', {'SRCACO2_SWIN_HD_PAD': '32',
                              'SRCACO2_SWIN_MLP_PAD': '0',
                              'SRCACO2_SWIN_F32_SOFTMAX': '0'}),
        ('mlp-pad-384', {'SRCACO2_SWIN_HD_PAD': '0',
                         'SRCACO2_SWIN_MLP_PAD': '384',
                         'SRCACO2_SWIN_F32_SOFTMAX': '0'}),
        ('hd32+mlp384', {'SRCACO2_SWIN_HD_PAD': '32',
                         'SRCACO2_SWIN_MLP_PAD': '384',
                         'SRCACO2_SWIN_F32_SOFTMAX': '0'}),
        ('prod f32sm', {'SRCACO2_SWIN_HD_PAD': '32',
                        'SRCACO2_SWIN_MLP_PAD': '0',
                        'SRCACO2_SWIN_F32_SOFTMAX': '1'}),
    ]
    ENV_KEYS = ['SRCACO2_SWIN_BWD_RS', 'SRCACO2_SWIN_IB_ROWS',
                'SRCACO2_SWIN_VMEM_MB', 'SRCACO2_SWIN_BWD_ABLATE',
                'SRCACO2_SWIN_HEADS_BATCHED', 'SRCACO2_SWIN_PAIR',
                'SRCACO2_SWIN_F32_SOFTMAX', 'SRCACO2_SWIN_HD_PAD',
                'SRCACO2_SWIN_MLP_PAD']

    stack = FusedBlockStack(dim=c, depth=36, num_heads=heads,
                            window_size=ws, mlp_ratio=mlp,
                            dtype=jnp.bfloat16)
    x = jax.random.normal(key, (b, 16, 16, c), jnp.bfloat16)
    sp = stack.init(key, x)

    fns = []
    for name, env in CONFIGS:
        for k in ENV_KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)

        @jax.jit
        def vjpf(p, x):
            y, f = jax.vjp(lambda pp: stack.apply(pp, x), p)
            return f(jnp.ones_like(y))

        try:
            r = vjpf(sp, x)   # compile under this env
            float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                          .astype(jnp.float32)))
            fns.append((name, vjpf))
            print(f'compiled: {name}', flush=True)
        except Exception as e:
            print(f'COMPILE FAILED {name}: {type(e).__name__} '
                  f'{str(e)[:300]}', flush=True)

    results = {name: [] for name, _ in fns}
    for rnd in range(ns.rounds):
        for name, fn in fns:
            r = fn(sp, x)
            float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                          .astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(ns.iters):
                r = fn(sp, x)
            float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                          .astype(jnp.float32)))
            ms = (time.perf_counter() - t0) / ns.iters * 1e3
            results[name].append(ms)
    for name, vals in results.items():
        print(f'{name:24s} median {statistics.median(vals):7.2f} ms  '
              f'runs {["%.1f" % v for v in vals]}', flush=True)


if __name__ == '__main__':
    main()
