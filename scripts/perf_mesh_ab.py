#!/usr/bin/env python
"""Real-chip measurement of the mesh machinery's overhead (VERDICT r3
'multi-chip performance story'): the flagship train step jitted plain
vs through shard_train_step on a 1-device mesh (identical math, same
chip — isolates the sharding/collective machinery cost), each at
superstep K=1 and K=8. Interleaved in-process timing (perf_ab
discipline). Prints one JSON line per arm.

With only one tunneled TPU chip, true multi-chip scaling cannot be
measured here; this bounds the per-step cost the mesh path adds, and
the virtual-CPU-mesh characterization in __graft_entry__.dryrun covers
collective insertion across widths.
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--rounds', type=int, default=4)
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--quick', action='store_true')
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as PS
    from srcaco2_tpu import constants
    from srcaco2_tpu.config.defaults import get_config
    from srcaco2_tpu.config.parser import _derive
    from srcaco2_tpu.data import pipeline as P
    from srcaco2_tpu.losses.master import build_loss
    from srcaco2_tpu.models.registry import define_g, init_variables
    from srcaco2_tpu.parallel.mesh import (data_sharded, make_mesh,
                                           replicated)
    from srcaco2_tpu.train.schedule import build_optimizer
    from srcaco2_tpu.train.state import TrainState
    from srcaco2_tpu.train.steps import make_train_step

    args = get_config(constants.SWINIR)
    args['l2'] = True
    args['ssim'] = True
    args['ssim_lambda'] = 5.0
    args['ssim_window_s'] = 19
    args['scale'] = 8
    args['h_size'] = 128
    args['n_channels'] = 1
    args['amp'] = True
    if ns.quick:
        args['netG'].update({'swinir_embed_dim': 32,
                             'swinir_depths': [2, 2],
                             'swinir_num_heads': [2, 2]})
    args = _derive(args)
    model = define_g(args)
    master = build_loss(args)
    tx = build_optimizer(args['train'])
    pipe_cfg = P.from_args(args)

    b = ns.batch
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.integers(0, 256, (256, 128, 128, 1)),
                     jnp.uint8)
    lr = jnp.asarray(rng.integers(0, 256, (256, 16, 16, 1)), jnp.uint8)
    key = jax.random.key(0)
    x0 = jnp.zeros((1, 1, 16, 16), jnp.float32)
    params, _ = init_variables(model, jax.random.key(0), x0)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])

    def fresh(put=None):
        st = TrainState.create(jax.tree.map(jnp.copy, params), tx)
        return jax.device_put(st, put) if put else st

    # Sequential per-arm timing. The interleaved (perf_ab) discipline
    # is NOT usable here: the axon tunnel deterministically rejects
    # re-executing the plain program after a mesh-program warmup
    # (INVALID_ARGUMENT on the next fetch, reproduced twice at the
    # same line). Drift guard instead: arm 0 is re-timed at the end
    # and reported as 'plain K=1 (recheck)'.
    def measure(name, use_mesh, k):
        fn = make_train_step(model, master, tx, constants.SWINIR,
                             pipe_cfg, steps_per_epoch=100,
                             netG=args['netG'], donate=False,
                             mesh=mesh if use_mesh else None,
                             steps_per_call=k)
        if k > 1:
            ix = (jnp.arange(k * b, dtype=jnp.int32) % 256
                  ).reshape(k, b)
            ixs = NamedSharding(mesh, PS(None, constants.DATA_AXIS)) \
                if use_mesh else None
        else:
            ix = jnp.arange(b, dtype=jnp.int32) % 256
            ixs = data_sharded(mesh) if use_mesh else None
        rep = replicated(mesh) if use_mesh else None
        st = fresh(rep)
        h = jax.device_put(hr, rep) if use_mesh else hr
        l = jax.device_put(lr, rep) if use_mesh else lr
        i = jax.device_put(ix, ixs) if use_mesh else ix
        st2, holder, ok = fn(st, h, l, i, key)
        float(jnp.sum(jnp.atleast_1d(holder['total'])
                      .astype(jnp.float32)))
        print(f'# compiled: {name}', flush=True)
        vals = []
        for _ in range(ns.rounds):
            t0 = time.perf_counter()
            for _ in range(ns.iters):
                s2, hd, _ = fn(st, h, l, i, key)
            float(jnp.sum(jnp.atleast_1d(hd['total'])
                          .astype(jnp.float32)))
            dt = time.perf_counter() - t0
            vals.append(ns.iters * k * ns.batch / dt)
        print(json.dumps({'arm': name,
                          'patches_per_s': round(
                              statistics.median(vals), 1),
                          'runs': [round(v) for v in vals]}),
              flush=True)
        return statistics.median(vals)

    for name, use_mesh, k in (('plain K=1', False, 1),
                              ('mesh1 K=1', True, 1),
                              ('plain K=8', False, 8),
                              ('mesh1 K=8', True, 8)):
        measure(name, use_mesh, k)
    try:
        measure('plain K=1 (recheck)', False, 1)
    except Exception as e:  # the known tunnel mesh->plain rejection
        print(f'# recheck arm failed (tunnel mesh->plain '
              f'rejection): {type(e).__name__}', flush=True)


if __name__ == '__main__':
    main()
