"""Reconstruct task (blurred LR -> real LR at scale 1) end-to-end."""
import os

import numpy as np

from srcaco2_tpu import constants
from srcaco2_tpu.config.parser import get_args


def test_reconstruct_dataset_mapping(tmp_path):
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    from srcaco2_tpu.data.dataset import load_dataset
    root = str(tmp_path)
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=4, n_val=2, n_test=2, size=64)
    args = {'data_root': root, 'splits_root': root, 'scale': 2,
            'n_channels': 1, 'myseed': 0, 'use_interpolated_low': False,
            'inter_low_th': 7., 'inter_low_sigma': 6., 'num_workers': 2,
            'task': constants.RECONSTRUCT}
    ds = load_dataset(args, names[0], 'train')
    # both sides on the LR grid, scale 1
    assert ds.scale == 1
    assert ds.hr.shape == (4, 32, 32, 1)
    assert ds.lr.shape == (4, 32, 32, 1)
    # blurred input differs from the target but is correlated
    a = ds.lr.astype(np.float32).ravel()
    b = ds.hr.astype(np.float32).ravel()
    assert (a != b).mean() > 0.05   # blur chain changed pixels
    assert np.corrcoef(a, b)[0, 1] > 0.7


def test_reconstruct_trains(tmp_path):
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    from srcaco2_tpu.train.trainer import Experiment
    root = str(tmp_path)
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=4, n_val=2, n_test=2, size=64)
    args = get_args([
        '--net_type', 'VDSR', '--task', constants.RECONSTRUCT,
        '--scale', '2', '--h_size', '32', '--n_channels', '1',
        '--train_dsets', names[0], '--valid_dsets', names[1],
        '--test_dsets', names[2],
        '--data_root', root, '--splits_root', root,
        '--l2', 'True', '--max_epochs', '1', '--batch_size', '2',
        '--eval_bsize', '2', '--checkpoint_eval', '1.0',
        '--checkpoint_save', '1.0'])
    args['abs_fd_exp'] = os.path.join(root, 'exp')
    os.makedirs(args['abs_fd_exp'], exist_ok=True)
    exp = Experiment(args)
    exp.train_valid()
    assert os.path.isfile(os.path.join(args['abs_fd_exp'], 'passed.txt'))
