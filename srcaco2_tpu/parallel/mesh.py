"""Device-mesh data parallelism.

Reference analog: §2.8 of SURVEY — the reference's only parallelism is
DDP (gradient all-reduce over gloo/nccl, DistributedSampler sharding,
utils_parallel.sync_*). TPU-native replacement: a `jax.sharding.Mesh`
with a 'data' axis (and a reserved 'model' axis for TP); the train step
is jitted with batch indices sharded over 'data' and state replicated —
XLA partitions the in-step input pipeline + model along the batch dim and
inserts the gradient all-reduce over ICI. Metric reduction happens the
same way: per-sample metric vectors come back sharded and are summed
under jit (psum analog), replacing sync_tensor_across_gpus /
sync_dict_across_gpus (utils_parallel.py:13-66).

Multi-host: jax.distributed.initialize() is called by the config
bootstrap (config/parser._setup_process). Every process loads the full
split and SRDataset.stage builds GLOBAL (replicated) arrays with
jax.make_array_from_process_local_data; `epoch_indices` is keyed
identically on every process so the sharded batch indices are globally
consistent, and fast_eval shards eval batches by process_index and
all-gathers the per-sample metrics. Exercised end-to-end by a real
2-process CPU jax.distributed run (tests/test_multihost.py).
"""
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srcaco2_tpu import constants

DATA = constants.DATA_AXIS
MODEL = constants.MODEL_AXIS


def make_mesh(args: Optional[dict] = None,
              data: Optional[int] = None,
              model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if args is not None:
        model = int(args.get('mesh_model', 1) or 1)
        data = int(args.get('mesh_data', -1))
        if data in (-1, 0):
            data = n // model
    if data is None:
        data = n // model
    assert data * model <= n, (data, model, n)
    dev = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(dev, (DATA, MODEL))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, rank: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(DATA, *([None] * (rank - 1))))


def shard_train_step(step_fn, mesh: Mesh, idxs_rank: int = 1):
    """Jit a (state, hr, lr, idxs, key) step for the mesh: state and the
    staged dataset replicated, batch indices sharded over 'data'. XLA
    propagates the sharding through the in-jit pipeline and model, and
    all-reduces the gradients over ICI.

    idxs_rank=2 is the superstep: idxs (K, batch) with the batch
    (last) axis sharded over 'data' and the scan axis K unsharded."""
    rep = replicated(mesh)
    ds = NamedSharding(mesh, P(*([None] * (idxs_rank - 1) + [DATA])))
    return jax.jit(step_fn,
                   in_shardings=(rep, rep, rep, ds, rep),
                   out_shardings=(rep, rep, rep),
                   donate_argnums=(0,))


def shard_eval_forward(fwd, mesh: Mesh):
    """Jit an eval forward with the batch dim sharded over 'data' and
    params replicated."""
    rep = replicated(mesh)
    ds4 = NamedSharding(mesh, P(DATA, None, None, None))

    def wrapped(params, batch):
        batch = {k: jax.lax.with_sharding_constraint(v, ds4)
                 for k, v in batch.items()}
        return fwd(params, batch)

    return jax.jit(wrapped, in_shardings=(rep, None),
                   out_shardings=ds4)


def device_count() -> int:
    return jax.device_count()


def process_index() -> int:
    return jax.process_index()


def is_master() -> bool:
    return jax.process_index() == 0
