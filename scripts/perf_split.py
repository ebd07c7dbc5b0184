#!/usr/bin/env python
"""Split fwd / bwd timing of the REAL fused 36-block stack at bench
conditions, sweeping batch and images-per-program rows."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=30)
    ns = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '..', '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp
    from srcaco2_tpu.models.swin_fused import FusedBlockStack

    c, heads, mlp, ws = 180, 6, 2.0, 8
    key = jax.random.key(0)

    def timeit(fn, *args, n=ns.iters):
        r = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                      .astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                      .astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3

    cfgs = [(64, 512, ''), (64, 512, '100'), (64, 1024, '100'),
            (64, 2048, '100')]
    for b, rows, vmem in cfgs:
            os.environ['SRCACO2_SWIN_IB_ROWS'] = str(rows)
            os.environ['SRCACO2_SWIN_VMEM_MB'] = vmem
            # 36 blocks = 6 stacks of depth 6; use ONE depth-36 stack
            # (same kernel count, one scan)
            stack = FusedBlockStack(dim=c, depth=36, num_heads=heads,
                                    window_size=ws, mlp_ratio=mlp,
                                    dtype=jnp.bfloat16)
            x = jax.random.normal(key, (b, 16, 16, c), jnp.bfloat16)
            try:
                sp = stack.init(key, x)
                fwd = jax.jit(lambda p, x: stack.apply(p, x))
                msf = timeit(fwd, sp, x)

                @jax.jit
                def vjpf(p, x):
                    y, f = jax.vjp(
                        lambda pp: stack.apply(pp, x), p)
                    return f(jnp.ones_like(y))

                msb = timeit(vjpf, sp, x)
                print(f'b={b} rows={rows} v={vmem or 16}: fwd {msf:7.2f} ms  '
                      f'fwd+bwd {msb:7.2f} ms  '
                      f'[{b / ((msb + 0.0) / 1e3):7.0f} pps upper]',
                      flush=True)
            except Exception as e:
                print(f'b={b} rows={rows} v={vmem or 16}: FAILED {type(e).__name__} '
                      f'{str(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()
