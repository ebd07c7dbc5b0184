"""End-to-end smoke: tiny SRCNN experiment on synthetic data — trainer,
loss drop, checkpointing, best-model selection, eval protocol."""
import os

import numpy as np
import pytest

from srcaco2_tpu import constants
from srcaco2_tpu.config.parser import get_args


@pytest.fixture(scope='module')
def tiny_exp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('e2e'))
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=8, n_val=2, n_test=2, size=64)
    args = get_args([
        '--net_type', 'SRCNN', '--scale', '2', '--h_size', '32',
        '--n_channels', '1',
        '--train_dsets', names[0], '--valid_dsets', names[1],
        '--test_dsets', names[2],
        '--data_root', root, '--splits_root', root,
        '--l2', 'True', '--max_epochs', '2', '--batch_size', '4',
        '--eval_bsize', '2', '--checkpoint_eval', '1.0',
        '--checkpoint_save', '1.0', '--G_optimizer_lr', '0.001',
        '--eval_over_roi_also', 'True'])
    args['abs_fd_exp'] = os.path.join(root, 'exp')
    os.makedirs(args['abs_fd_exp'], exist_ok=True)
    return args


def test_experiment_trains(tiny_exp):
    from srcaco2_tpu.train.trainer import Experiment
    from srcaco2_tpu.train import checkpoint as CKPT
    exp = Experiment(tiny_exp)
    exp.train_valid()
    d = tiny_exp['abs_fd_exp']
    # checkpoint + GC to latest
    assert CKPT.find_last_checkpoint(d) == 4  # 8 samples / bs4 * 2 epochs
    # best model exists
    assert os.path.isdir(os.path.join(d, 'best-models', 'G-model'))
    # tracker has eval points and train losses
    vals = exp.tracker[constants.VALIDSET][tiny_exp['valid_dsets']]
    assert len(vals[constants.PSNR_MTR]['vals']) >= 2
    assert vals[constants.PSNR_MTR]['best_val'] is not None
    assert len(exp.tracker['train']['period_epoch']['l2']) == 2
    # training is sane: loss finite and did not explode
    l2 = exp.tracker['train']['period_epoch']['l2']
    assert all(np.isfinite(v) for v in l2)
    assert min(l2) <= l2[0] * 1.05
    # test + bicubic rows exist
    tn = tiny_exp['test_dsets']
    assert exp.tracker[constants.TESTSET][tn][
        constants.PSNR_MTR]['vals']
    assert exp.tracker[constants.TESTSET][tn + '_bicubic'][
        constants.PSNR_MTR]['vals']
    assert os.path.isfile(os.path.join(d, 'passed.txt'))


def test_resume_restores_step(tiny_exp):
    from srcaco2_tpu.train.trainer import Experiment
    exp = Experiment(tiny_exp)
    step = exp.resume()
    assert step == 4
    assert int(exp.state.step) == 4
