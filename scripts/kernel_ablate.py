#!/usr/bin/env python
"""Ablation microbench for the fused Swin block kernel (fwd only).

Builds variants of the forward kernel with pieces disabled and times a
36-block scan of each, so per-piece cost = full - ablated.  Also sweeps
the images-per-program block size (ib).
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--depth', type=int, default=36)
    ap.add_argument('--iters', type=int, default=10)
    ns = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '..', '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from srcaco2_tpu.ops.pallas import swin_block as SB

    b, t, c, heads, mlp = ns.batch, 256, 180, 6, 2.0
    ch = int(c * mlp)
    h = w = 16
    ws = 8
    cdt = jnp.bfloat16
    key = jax.random.key(0)
    d = ns.depth

    # stacked params + bias, as in FusedBlockStack
    ks = jax.random.split(key, 16)
    nb = (2 * ws - 1) ** 2
    p = dict(
        g1=jnp.ones((d, 1, c)), b1=jnp.zeros((d, 1, c)),
        wqkv=jax.random.normal(ks[0], (d, c, 3 * c)) * 0.05,
        bqkv=jnp.zeros((d, 1, 3 * c)),
        wproj=jax.random.normal(ks[1], (d, c, c)) * 0.05,
        bproj=jnp.zeros((d, 1, c)),
        g2=jnp.ones((d, 1, c)), b2=jnp.zeros((d, 1, c)),
        w1=jax.random.normal(ks[2], (d, c, ch)) * 0.05,
        bm1=jnp.zeros((d, 1, ch)),
        w2=jax.random.normal(ks[3], (d, ch, c)) * 0.05,
        bm2=jnp.zeros((d, 1, c)),
    )
    tables = jax.random.normal(ks[4], (d, nb, heads)) * 0.02
    bias = SB.build_attn_bias(tables, h, w, ws)      # (d, nh, t, t)
    x = jax.random.normal(ks[5], (b, t, c), cdt)

    def make_fwd_kernel(ablate):
        def _attn(qkv, bias_ref, ib):
            hd = c // heads
            outs = []
            for hh in range(heads):
                q = qkv[:, hh * hd:(hh + 1) * hd].reshape(ib, t, hd)
                k = qkv[:, c + hh * hd:c + (hh + 1) * hd].reshape(
                    ib, t, hd)
                v = qkv[:, 2 * c + hh * hd:2 * c + (hh + 1) * hd] \
                    .reshape(ib, t, hd)
                if 'noqk' in ablate:
                    s = jnp.zeros((ib, t, t), jnp.float32)
                else:
                    s = SB._dotg(q, k, SB._QK, cdt)
                if 'nobias' not in ablate:
                    s = s + bias_ref[hh][None]
                if 'nosoftmax' in ablate:
                    e = s.astype(cdt)
                    rinv = 1.0
                else:
                    m = jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp(s - m).astype(cdt)
                    r = jnp.sum(e, axis=-1, keepdims=True,
                                dtype=jnp.float32)
                    rinv = 1.0 / r
                if 'nopv' in ablate:
                    o = v.astype(jnp.float32)
                else:
                    o = SB._dotg(e, v, SB._PV, cdt) * rinv
                outs.append(o.astype(cdt).reshape(ib * t, hd))
            return jnp.concatenate(outs, axis=-1)

        def kern(x_ref, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1,
                 bm1, w2, bm2, bias_ref, out_ref):
            ib = x_ref.shape[0]
            xx = x_ref[:].reshape(ib * t, c).astype(jnp.float32)
            if 'noln' in ablate:
                y = xx
            else:
                y, _, _ = SB._ln(xx, g1[:], b1[:])
            yc = y.astype(cdt)
            if 'noattn' in ablate:
                a = yc.astype(jnp.float32)
            else:
                qkv = (SB._dot(yc, wqkv[:], cdt) + bqkv[:]).astype(cdt)
                o = _attn(qkv, bias_ref, ib)
                a = SB._dot(o, wproj[:], cdt) + bproj[:]
            x2 = xx + a
            if 'nomlp' in ablate:
                out = x2
            else:
                if 'noln' in ablate:
                    y2 = x2
                else:
                    y2, _, _ = SB._ln(x2, g2[:], b2[:])
                y2c = y2.astype(cdt)
                u = (SB._dot(y2c, w1[:], cdt) + bm1[:]).astype(cdt)
                if 'nogelu' in ablate:
                    hact = u
                else:
                    hact = SB._gelu(u)
                o2 = SB._dot(hact, w2[:], cdt) + bm2[:]
                out = x2 + o2
            out_ref[:] = out.reshape(ib, t, c).astype(out_ref.dtype)
        return kern

    def make_stack(ablate, ib):
        kern = make_fwd_kernel(ablate)
        wsh = SB._w_shapes(c, ch, heads, t)

        def block(xx, wb):
            grid = (b // ib,)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((b, t, c), xx.dtype),
                grid=grid,
                in_specs=[pl.BlockSpec((ib, t, c), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)]
                + SB._weight_specs(wsh),
                out_specs=pl.BlockSpec((ib, t, c), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(xx, *wb)

        @jax.jit
        def run(x, p, bias):
            def body(carry, pb):
                wb = (pb['g1'], pb['b1'], pb['wqkv'], pb['bqkv'],
                      pb['wproj'], pb['bproj'], pb['g2'], pb['b2'],
                      pb['w1'], pb['bm1'], pb['w2'], pb['bm2'],
                      pb['bias'])
                return block(carry, wb), None
            pb = dict(p)
            pb['bias'] = bias
            out, _ = jax.lax.scan(body, x, pb)
            return out
        return run

    def timeit(fn, *args, n=ns.iters):
        r = fn(*args)
        float(jnp.sum(r.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        float(jnp.sum(r.astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3

    configs = [
        ('full ib=2', (), 2),
        ('full ib=4', (), 4),
        ('full ib=8', (), 8),
        ('noattn ib=2', ('noattn',), 2),
        ('nosoftmax ib=2', ('nosoftmax',), 2),
        ('noqk+nopv ib=2', ('noqk', 'nopv'), 2),
        ('nobias ib=2', ('nobias',), 2),
        ('nomlp ib=2', ('nomlp',), 2),
        ('nogelu ib=2', ('nogelu',), 2),
        ('noln ib=2', ('noln',), 2),
    ]
    base = None
    for name, abl, ib in configs:
        try:
            ms = timeit(make_stack(frozenset(abl), ib), x, p, bias)
        except Exception as e:
            print(f'{name:18s}  FAILED {type(e).__name__}: {e}',
                  flush=True)
            continue
        note = ''
        if not abl and ib == 2:
            base = ms
        elif base is not None:
            note = f'  (delta {base - ms:+7.3f} ms)'
        print(f'{name:18s} {ms:8.3f} ms / {d} blocks{note}', flush=True)


if __name__ == '__main__':
    main()
