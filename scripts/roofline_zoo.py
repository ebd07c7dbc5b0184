#!/usr/bin/env python
"""Analytic rooflines for the zoo's slow rows (VERDICT r2 #2).

For each net, lower the SAME jitted train step scripts/bench_zoo.py
times and read XLA's own HLO cost analysis (flops). Combined with the
measured ms/step from docs/THROUGHPUT.md this gives an honest
"achieved TFLOP/s vs the v5e 197 bf16 peak" figure per net — i.e.
whether a slow row is implementation slack or architecture (tiny
channel counts, recursion at HR size, gather-heavy attention).

Runs on CPU (JAX_PLATFORMS=cpu): HLO flop counts are
platform-independent for the dot/conv ops that dominate.

Usage: JAX_PLATFORMS=cpu python scripts/roofline_zoo.py --nets DRRN,ProSR
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nets', default='DRRN,MemNet,ProSR,GRL,CSRCNN,'
                                      'EDSR_LIIF,DBPN,SRFBN')
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

    scale, h_size = ns.scale, 128
    from scripts.bench_zoo import batch_caps
    BATCH_CAP = batch_caps()   # shared: FLOPs must describe the same
                               # configs bench_zoo measured
    rng = np.random.default_rng(0)
    n_img = 8
    hr = jnp.asarray(rng.integers(0, 256, (n_img, 512, 512, 1)),
                     jnp.uint8)
    lr = jnp.asarray(rng.integers(0, 256, (n_img, 512 // scale,
                                           512 // scale, 1)), jnp.uint8)
    key = jax.random.key(0)
    for net in ns.nets.split(','):
        b = min(ns.batch, BATCH_CAP.get(net, ns.batch))
        try:
            args = get_config(net)
            args['l2'] = True
            args['scale'] = scale
            args['h_size'] = h_size
            args['n_channels'] = 1
            args['amp'] = True
            args = _derive(args)
            model = define_g(args)
            master = build_loss(args)
            tx = build_optimizer(args['train'])
            pipe_cfg = P.PipeConfig(scale=scale, h_size=h_size)
            in_hw = h_size if net in constants.PRE_UPSAMPLED_INPUT_NETS \
                else h_size // scale
            sample = jnp.zeros((1, 1, in_hw, in_hw), jnp.float32)
            params, model_state = init_variables(model, key, sample)
            state = TrainState.create(params, tx,
                                      model_state=model_state or None)
            step_fn = make_train_step(model, master, tx, net, pipe_cfg,
                                      steps_per_epoch=1000,
                                      netG=args['netG'])
            idx = jax.random.randint(jax.random.key(1), (b,), 0, n_img)
            lowered = jax.jit(step_fn).lower(state, hr, lr, idx, key)
            ca = lowered.cost_analysis()
            fl = ca.get('flops', float('nan'))
            nparam = sum(int(np.prod(p.shape))
                         for p in jax.tree_util.tree_leaves(params))
            print(f'{net:12s} batch {b:3d}  params {nparam/1e6:6.2f}M  '
                  f'train-step GFLOP {fl/1e9:8.1f}  '
                  f'GFLOP/patch {fl/1e9/b:7.2f}', flush=True)
        except Exception as e:
            print(f'{net:12s} FAILED {type(e).__name__}: {str(e)[:160]}',
                  flush=True)


if __name__ == '__main__':
    main()
