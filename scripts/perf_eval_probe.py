#!/usr/bin/env python
"""In-process eval-throughput probe: flagship SwinIR x8 full-image
(64x64 LR -> 512^2) forward vs eval batch size, on the real chip.

Eval is overhead-bound (docs/THROUGHPUT.md flagship eval roofline:
3% MXU, 14% HBM at batch 4), so batch amortization is the first
lever; this measures how far it goes before HBM caps it.
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
    ap.add_argument('--batches', default='2,4,8,16,32,64')
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--tile-rows', default='',
                    help='comma list: A/B SRCACO2_SWIN_TILE_ROWS '
                         'settings (fresh jit per setting, '
                         'interleaved timing)')
    ap.add_argument('--hd-pad', default='',
                    help='comma list: A/B SRCACO2_SWIN_HD_PAD '
                         'settings (0 = off); same fresh-jit '
                         'interleaved discipline as --tile-rows')
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from srcaco2_tpu import constants
    from srcaco2_tpu.models.swinir import SwinIR
    from srcaco2_tpu.train.steps import make_eval_forward

    scale = 8
    model = SwinIR(in_chans=1, upscale=scale, window_size=8,
                   embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                   mlp_ratio=2.0,
                   upsampler=constants.US_PIXEL_SHUFFLE_DIRECT,
                   fused_blocks=True, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 1, 64, 64), jnp.float32)
    params = model.init(jax.random.key(0), x0, train=False)['params']
    efwd = make_eval_forward(model, constants.SWINIR, scale)

    rng = np.random.default_rng(0)
    batches = [int(b) for b in ns.batches.split(',')]
    # configurations: (batch, tile_rows-or-None). Each non-default
    # tile_rows setting gets its OWN jitted forward (the env var is
    # read at trace time), so settings A/B inside one process.
    rows_list = ([int(r) for r in ns.tile_rows.split(',')]
                 if ns.tile_rows else [None])
    pad_list = ([int(p) for p in ns.hd_pad.split(',')]
                if ns.hd_pad else [None])

    def set_env(rv, hp):
        if rv is not None:
            os.environ['SRCACO2_SWIN_TILE_ROWS'] = str(rv)
        if hp is not None:
            os.environ['SRCACO2_SWIN_HD_PAD'] = str(hp)

    fwds = {}
    for rv in rows_list:
        for hp in pad_list:
            set_env(rv, hp)
            fwds[rv, hp] = make_eval_forward(model, constants.SWINIR,
                                             scale)
    configs = [(b, rv, hp) for b in batches for rv in rows_list
               for hp in pad_list]
    results = {cfg: [] for cfg in configs}
    # interleave reps across configs so tunnel drift hits all equally
    for rep in range(ns.reps):
        for cfg in configs:
            b, rv, hp = cfg
            if results[cfg] and results[cfg][-1] is None:
                continue
            set_env(rv, hp)
            xe = {'l_im': jnp.asarray(
                rng.normal(0.4, 0.2, (b, 1, 64, 64)).clip(0, 1),
                jnp.float32)}
            try:
                r = fwds[rv, hp](params, xe)
                float(jnp.sum(r))
                t0 = time.perf_counter()
                for _ in range(ns.iters):
                    r = fwds[rv, hp](params, xe)
                float(jnp.sum(r))
                dt = time.perf_counter() - t0
                results[cfg].append(ns.iters * b / dt)
            except Exception as e:
                print(f'batch {b} rows {rv} pad {hp}: '
                      f'{type(e).__name__}: {e}', file=sys.stderr)
                results[cfg].append(None)
    for cfg in configs:
        b, rv, hp = cfg
        tag = f' rows {rv:5d}' if rv is not None else ''
        tag += f' pad {hp:2d}' if hp is not None else ''
        vals = [v for v in results[cfg] if v]
        if vals:
            print(f'batch {b:3d}{tag}: {max(vals):7.1f} img/s  '
                  f'(reps {", ".join(f"{v:.0f}" for v in vals)})')
        else:
            print(f'batch {b:3d}{tag}: FAILED')


if __name__ == '__main__':
    main()
