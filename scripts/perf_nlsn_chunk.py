#!/usr/bin/env python
"""NLSN chunked-contraction check on the TPU (VERDICT r3 #7 done-bar):

1. The benchmarked x8 shape (S=1024): in-process interleaved A/B of the
   default single-shot one-hot path vs the FORCED chunked path — the
   production default must show no regression (it takes the same
   single-shot branch; the forced-chunk arm prices the fallback).
2. The previously-OOMing regime x2 / h_size 128 (S = 4096*4 = 16384,
   one-hot would be ~1 GiB PER IMAGE): run fwd+bwd at batch 4 — under
   the default 1024 MB budget this auto-chunks and must fit on one chip.

Prints one JSON line per measurement.
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--rounds', type=int, default=3)
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from srcaco2_tpu.models.nlsn import NLSN

    key = jax.random.key(0)

    # --- 1. benchmark shape A/B (x8: LR 16x16, S = 256*4 = 1024)
    m = NLSN(in_chans=1, upscale=8, n_resblocks=8, n_feats=64)
    x = jax.random.uniform(key, (64, 1, 16, 16), jnp.float32)
    p = m.init({'params': key, 'lsh': key}, x, train=False)['params']

    arms = []
    for name, env in (('oneshot (default)', None),
                      ('forced-chunk', '64')):
        if env is None:
            os.environ.pop('SRCACO2_NLSN_ONEHOT_MB', None)
        else:
            os.environ['SRCACO2_NLSN_ONEHOT_MB'] = env

        @jax.jit
        def vjpf(p, x):
            y, f = jax.vjp(
                lambda pp: m.apply({'params': pp}, x, train=True,
                                   rngs={'lsh': jax.random.key(1)}
                                   )['out'], p)
            return f(jnp.ones_like(y))

        r = vjpf(p, x)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                      .astype(jnp.float32)))
        arms.append((name, vjpf))
        print(f'# compiled: {name}', flush=True)

    res = {n: [] for n, _ in arms}
    for _ in range(ns.rounds):
        for name, fn in arms:
            r = fn(p, x)
            float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                          .astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(ns.iters):
                r = fn(p, x)
            float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                          .astype(jnp.float32)))
            res[name].append((time.perf_counter() - t0)
                             / ns.iters * 1e3)
    for name, vals in res.items():
        print(json.dumps({'arm': name, 'shape': 'x8 b64 S=1024',
                          'median_ms': round(statistics.median(vals),
                                             2),
                          'runs': [round(v, 1) for v in vals]}),
              flush=True)

    # --- 2. the large-S regime: x2, h_size 128 -> LR 64x64, S=16384
    os.environ.pop('SRCACO2_NLSN_ONEHOT_MB', None)
    m2 = NLSN(in_chans=1, upscale=2, n_resblocks=8, n_feats=64)
    x2 = jax.random.uniform(key, (4, 1, 64, 64), jnp.float32)
    p2 = m2.init({'params': key, 'lsh': key}, x2, train=False)['params']

    @jax.jit
    def vjpf2(p, x):
        y, f = jax.vjp(
            lambda pp: m2.apply({'params': pp}, x, train=True,
                                rngs={'lsh': jax.random.key(1)}
                                )['out'], p)
        return f(jnp.ones_like(y))

    t0 = time.perf_counter()
    r = vjpf2(p2, x2)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        r = vjpf2(p2, x2)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / 3 * 1e3
    print(json.dumps({'arm': 'auto-chunk (default budget)',
                      'shape': 'x2 b4 S=16384 fwd+bwd',
                      'median_ms': round(ms, 1),
                      'compile_s': round(compile_s, 1),
                      'note': 'one-hot would be ~1 GiB/image; fits '
                              'and runs on one chip'}), flush=True)


if __name__ == '__main__':
    main()
