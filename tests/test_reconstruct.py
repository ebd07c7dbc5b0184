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


def test_reconstruct_input_real_mapping(tmp_path):
    """reconstruct_input='real' (eval-only): input == target == the
    clean HR downscale (dataset_dpsr.py:969-972)."""
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    from srcaco2_tpu.data.dataset import load_dataset
    import pytest
    root = str(tmp_path)
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=4, n_val=2, n_test=2,
                                   size=64)
    args = {'data_root': root, 'splits_root': root, 'scale': 2,
            'n_channels': 1, 'myseed': 0, 'use_interpolated_low': False,
            'inter_low_th': 7., 'inter_low_sigma': 6., 'num_workers': 2,
            'task': constants.RECONSTRUCT, 'reconstruct_input': 'real'}
    ds = load_dataset(args, names[2], constants.EVAL_PHASE)
    assert ds.scale == 1
    assert (ds.hr == ds.lr).all()
    assert ds.hr.shape == (2, 32, 32, 1)
    with pytest.raises(AssertionError):
        load_dataset(args, names[0], 'train')   # eval-only


def test_reevaluate_reconstruct_and_figure(tmp_path):
    """Full reconstruct inference surface: train a tiny exp, then
    reevaluate under both input variants + the comparison figure."""
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    from srcaco2_tpu.train.trainer import Experiment
    from srcaco2_tpu.inference.reconstruct import (
        reevaluate_reconstruct, reconstruct_figure)
    root = str(tmp_path)
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=4, n_val=2, n_test=2,
                                   size=64)
    args = get_args([
        '--net_type', 'SRCNN', '--task', constants.RECONSTRUCT,
        '--scale', '2', '--h_size', '32', '--n_channels', '1',
        '--train_dsets', names[0], '--valid_dsets', names[1],
        '--test_dsets', names[2],
        '--data_root', root, '--splits_root', root,
        '--l2', 'True', '--max_epochs', '1', '--batch_size', '2',
        '--eval_bsize', '2', '--checkpoint_eval', '1.0',
        '--checkpoint_save', '1.0'])
    exp_dir = os.path.join(root, 'exp')
    args['abs_fd_exp'] = exp_dir
    os.makedirs(exp_dir, exist_ok=True)
    Experiment(args).train_valid()
    import yaml
    with open(os.path.join(exp_dir, 'config_model.yml'), 'w') as f:
        yaml.safe_dump(args, f)   # main.py writes this after training

    out = reevaluate_reconstruct(exp_dir, 'fake')
    tname = names[2]
    assert tname in out and f'{tname}_bicubic' in out
    assert np.isfinite(out[tname]['full'][constants.PSNR_MTR])
    assert os.path.isdir(os.path.join(
        exp_dir, 'inference_reconstruct', 'images', 'fake'))

    out_real = reevaluate_reconstruct(exp_dir, 'real', n=1)
    assert tname in out_real

    fig = reconstruct_figure(exp_dir, os.path.join(root, 'recon.png'))
    assert os.path.isfile(fig)
