"""Batch inference tools: load_exp, reevaluate, noise study, figures."""
import os

import numpy as np
import pytest

from srcaco2_tpu.config.parser import get_args


@pytest.fixture(scope='module')
def exp_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('inf'))
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    from srcaco2_tpu.train.trainer import Experiment
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=4, n_val=2, n_test=3,
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
    d = os.path.join(root, 'exp')
    args['abs_fd_exp'] = d
    os.makedirs(d, exist_ok=True)
    Experiment(args).train_valid()
    import yaml
    with open(os.path.join(d, 'config_model.yml'), 'w') as f:
        yaml.safe_dump(args, f)
    return d


def test_load_exp_and_reevaluate(exp_dir):
    from srcaco2_tpu.inference.super_res import load_exp, reevaluate
    model, params, args = load_exp(exp_dir)
    assert args['netG']['net_type'] == 'SRCNN'
    out = reevaluate(exp_dir, n=2)
    (name, perf), = out.items()
    assert perf['n'] == 2
    assert np.isfinite(perf['full']['psnr'])


def test_noise_study_perturbs_input(exp_dir):
    """The synthetic-noise study must actually change the evaluated
    input (a barely-trained model gives no monotonicity guarantee)."""
    from srcaco2_tpu.inference.super_res import reevaluate
    clean = reevaluate(exp_dir, n=2, noise_sigma=0.0)
    noisy = reevaluate(exp_dir, n=2, noise_sigma=60.0,
                       inter_low_th=0.0)  # noise everywhere
    (p0,), (p1,) = clean.values(), noisy.values()
    assert p1['full']['psnr'] != p0['full']['psnr']


def test_comparison_figure(exp_dir, tmp_path):
    from srcaco2_tpu.inference.super_res import comparison_figure
    out = comparison_figure([exp_dir], str(tmp_path / 'cmp.png'),
                            sample_idx=0)
    assert os.path.isfile(out)


def test_eval_all_discovery(exp_dir):
    import eval_all
    found = list(eval_all.find_experiments(os.path.dirname(exp_dir)))
    assert exp_dir in found
