"""Serving endpoint: AOT compile, tail batching, uint8 IO."""
import os

import numpy as np
import pytest

from srcaco2_tpu import constants
from srcaco2_tpu.config.parser import get_args


@pytest.fixture(scope='module')
def trained_exp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('serve'))
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    from srcaco2_tpu.train.trainer import Experiment
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=4, n_val=2, n_test=2,
                                   size=64)
    args = get_args([
        '--net_type', 'SRCNN', '--scale', '2', '--h_size', '32',
        '--n_channels', '1',
        '--train_dsets', names[0], '--valid_dsets', names[1],
        '--test_dsets', names[2],
        '--data_root', root, '--splits_root', root,
        '--l2', 'True', '--max_epochs', '1', '--batch_size', '2',
        '--eval_bsize', '2', '--checkpoint_eval', '1.0',
        '--checkpoint_save', '1.0'])
    exp_dir = os.path.join(root, 'exp')
    args['abs_fd_exp'] = exp_dir
    os.makedirs(exp_dir, exist_ok=True)
    exp = Experiment(args)
    exp.train_valid()
    import yaml
    with open(os.path.join(exp_dir, 'config_model.yml'), 'w') as f:
        yaml.safe_dump(args, f)
    return exp_dir


def test_server_roundtrip(trained_exp):
    from srcaco2_tpu.inference.serve import SRServer
    srv = SRServer(trained_exp, batch_size=2, lr_hw=(16, 16))
    assert srv.compile_seconds >= 0
    # 3 images through a batch-2 endpoint: tail padding must not
    # duplicate or drop
    x = np.random.default_rng(0).integers(
        0, 256, (3, 1, 16, 16)).astype(np.uint8)
    out = srv(x)
    assert out.shape == (3, 1, 32, 32)
    assert out.dtype == np.uint8
    # deterministic
    out2 = srv(x)
    np.testing.assert_array_equal(out, out2)
    # throughput probe runs
    assert srv.throughput(iters=2) > 0
