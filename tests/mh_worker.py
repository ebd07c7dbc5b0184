"""Worker for the REAL 2-process jax.distributed test
(tests/test_multihost.py). Each process contributes 4 virtual CPU
devices (8 global), stages a shared synthetic split as GLOBAL
replicated arrays, runs sharded train steps, and runs the
process-sharded fast_eval. Prints one JSON result line."""
import json
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['PALLAS_AXON_POOL_IPS'] = ''
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=4').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')


def main():
    coord, nproc, rank, data_root = sys.argv[1:5]
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(nproc),
                               process_id=int(rank),
                               local_device_ids=list(range(4)))
    assert jax.device_count() == 4 * int(nproc), jax.device_count()
    assert jax.process_count() == int(nproc)

    import jax.numpy as jnp
    import numpy as np
    from srcaco2_tpu import constants
    from srcaco2_tpu.config.defaults import get_config
    from srcaco2_tpu.data import pipeline as P
    from srcaco2_tpu.data.dataset import load_dataset
    from srcaco2_tpu.losses.master import build_loss
    from srcaco2_tpu.models.cnn_pre import SRCNN
    from srcaco2_tpu.parallel.mesh import (data_sharded, make_mesh,
                                           replicated,
                                           shard_train_step)
    from srcaco2_tpu.train.evaluator import fast_eval
    from srcaco2_tpu.train.schedule import build_optimizer
    from srcaco2_tpu.train.state import TrainState
    from srcaco2_tpu.train.steps import (make_eval_forward,
                                         make_train_step)

    mesh = make_mesh(data=jax.device_count(), model=1)
    rep = replicated(mesh)

    args = get_config(constants.SRCNN)
    args.update(data_root=data_root, splits_root=data_root,
                scale=2, n_channels=1, l2=True, is_master=(rank == '0'))
    name = constants.caco2_name(constants.TRAINSET, 2, constants.CELL0)
    ds = load_dataset(args, name, constants.TRAINSET)
    ds.stage(rep)     # global replicated arrays across both processes

    model = SRCNN(in_chans=1)
    x0 = jnp.zeros((1, 1, 16, 16), jnp.float32)
    params = model.init(jax.random.key(0), x0, train=False)['params']
    tx = build_optimizer(args['train'])
    state = TrainState.create(params, tx)
    state = jax.device_put(state, rep)

    cfg = P.PipeConfig(scale=2, h_size=16)
    step = make_train_step(model, build_loss(args), tx,
                           constants.SRCNN, cfg, steps_per_epoch=10,
                           mesh=mesh)
    idxs = jax.device_put(
        jnp.arange(8, dtype=jnp.int32) % len(ds), data_sharded(mesh))
    losses = []
    for i in range(3):
        state, holder, ok = step(state, ds.hr_dev, ds.lr_dev, idxs,
                                 jax.random.key(1))
        losses.append(float(holder['total']))
    assert bool(ok)

    # process-sharded eval with cross-process metric gather
    eds = load_dataset(args, constants.caco2_name(
        constants.VALIDSET, 2, constants.CELL0), constants.EVAL_PHASE)
    eds.stage(rep)
    fwd = make_eval_forward(model, constants.SRCNN, 2)
    perf = fast_eval(lambda p, b: fwd(p, b), state.params, eds, args,
                     eval_bsize=2, split=constants.VALIDSET)

    print(json.dumps({
        'rank': int(rank),
        'devices': jax.device_count(),
        'losses': losses,
        'eval_n': perf['n'],
        'psnr': perf['full']['psnr'],
        'n_details': len(perf['details']),
    }))


if __name__ == '__main__':
    main()
