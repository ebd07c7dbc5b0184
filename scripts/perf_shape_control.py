#!/usr/bin/env python
"""Shape-control falsification of the flagship throughput ceiling
(VERDICT r3 #2).

docs/BENCH_ANALYSIS.md argues the flagship's 52%-of-target throughput
is dominated by an ARCHITECTURAL padding tax: embed C=180 pads to 256
lanes on dense matmuls and head_dim 30 runs QK^T/PV at ~23% MXU
efficiency. If that is true, the IDENTICAL unmodified kernel at
MXU-friendly widths must show a large drop in time-per-executed-MAC;
if time/MAC stays flat, the implementation has slack instead.

Method (perf_ab.py discipline): interleaved in-process fwd+bwd timing
of the SAME FusedBlockStack (36 blocks, window 8, 16x16 tokens, bf16)
at several (C, heads) widths, several rounds, medians; each config's
analytic MAC count normalizes the comparison (the vjp multiple is
common to all configs and cancels).

  C=180 h=6  -> hd=30, C pads 180->256 (the published architecture)
  C=192 h=6  -> hd=32, C pads 192->256 (sublane-aligned head)
  C=128 h=4  -> hd=32, C = 1x128 lane-exact
  C=256 h=8  -> hd=32, C = 2x128 lane-exact
  C=240 h=2  -> hd=120 (the '120-packed' head: contraction ~128-filled)
"""
import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))


def macs_per_step(b, t, c, depth):
    """Executed MACs of the fused full-attention stack, forward:
    dense (qkv 3C^2 + proj C^2 + mlp 4C^2 per token) + attention
    (QK^T + PV = 2*T^2*C per image per block)."""
    return b * depth * (8 * c * c * t + 2 * t * t * c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=15)
    ap.add_argument('--rounds', type=int, default=5)
    ap.add_argument('--batch', type=int, default=64)
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from srcaco2_tpu.models.swin_fused import FusedBlockStack

    depth, mlp, ws = 36, 2.0, 8
    b, hw = ns.batch, 16
    t = hw * hw
    key = jax.random.key(0)
    # production bf16-chain numerics (the benchmark's definition)
    os.environ['SRCACO2_SWIN_F32_SOFTMAX'] = '0'
    # the shape control measures the RAW architecture widths — pin the
    # (round-4, default-auto) lane pads off so C=180 stays hd=30/ch=360
    os.environ['SRCACO2_SWIN_HD_PAD'] = '0'
    os.environ['SRCACO2_SWIN_MLP_PAD'] = '0'

    CONFIGS = [
        ('C180 h6 (hd30, prod)', 180, 6),
        ('C192 h6 (hd32)', 192, 6),
        ('C128 h4 (hd32, lane-exact)', 128, 4),
        ('C256 h8 (hd32, lane-exact)', 256, 8),
        ('C240 h2 (hd120 packed)', 240, 2),
    ]

    fns = []
    for name, c, heads in CONFIGS:
        stack = FusedBlockStack(dim=c, depth=depth, num_heads=heads,
                                window_size=ws, mlp_ratio=mlp,
                                dtype=jnp.bfloat16)
        x = jax.random.normal(key, (b, hw, hw, c), jnp.bfloat16)
        sp = stack.init(key, x)

        def make(stack):
            @jax.jit
            def vjpf(p, x):
                y, f = jax.vjp(lambda pp: stack.apply(pp, x), p)
                return f(jnp.ones_like(y))
            return vjpf

        fn = make(stack)
        try:
            r = fn(sp, x)
            float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                          .astype(jnp.float32)))
            fns.append((name, fn, sp, x, macs_per_step(b, t, c, depth)))
            print(f'compiled: {name}', flush=True)
        except Exception as e:
            print(f'COMPILE FAILED {name}: {type(e).__name__} '
                  f'{str(e)[:300]}', flush=True)

    results = {name: [] for name, *_ in fns}
    for rnd in range(ns.rounds):
        for name, fn, sp, x, _ in fns:
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

    base_eff = None
    for name, fn, sp, x, macs in fns:
        med = statistics.median(results[name])
        eff = macs / (med * 1e-3) / 1e12   # executed TMAC/s (fwd-count)
        if base_eff is None:
            base_eff = eff
        print(f'{name:28s} median {med:7.2f} ms  '
              f'{eff:6.2f} TMAC/s (fwd-count)  '
              f'{eff / base_eff:5.2f}x vs prod  '
              f'runs {["%.1f" % v for v in results[name]]}', flush=True)


if __name__ == '__main__':
    main()
