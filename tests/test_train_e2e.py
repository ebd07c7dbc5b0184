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


def test_ema_eval_netE(tmp_path):
    """E_decay > 0 + train.eval_netE: validation/model-selection/test
    run on the EMA weights (round-4 EMA arm wiring). The reference only
    checkpoints netE (model_base.py:214); eval_netE is the documented
    beyond-reference opt-in."""
    import jax
    import numpy as np
    root = str(tmp_path)
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    from srcaco2_tpu.train.trainer import Experiment
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=4, n_val=1, n_test=1, size=32)
    args = get_args([
        '--net_type', 'SRCNN', '--scale', '2', '--h_size', '16',
        '--n_channels', '1',
        '--train_dsets', names[0], '--valid_dsets', names[1],
        '--test_dsets', names[2],
        '--data_root', root, '--splits_root', root,
        '--l2', 'True', '--max_epochs', '1', '--batch_size', '2',
        '--eval_bsize', '1', '--checkpoint_eval', '1.0',
        '--checkpoint_save', '1.0', '--G_optimizer_lr', '0.01',
        '--E_decay', '0.99', '--eval_netE', 'True'])
    args['abs_fd_exp'] = os.path.join(root, 'exp')
    os.makedirs(args['abs_fd_exp'], exist_ok=True)
    exp = Experiment(args)
    assert exp.eval_netE is True
    exp.train_valid()
    assert exp.state.ema_params is not None
    # eval_params() returns the EMA tree, which lags the raw params
    ev = exp.eval_params()
    assert ev is exp.state.ema_params
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree.leaves(ev),
                             jax.tree.leaves(exp.state.params))]
    assert max(diffs) > 0.0
    # without the flag, eval_params() is the raw params
    exp.eval_netE = False
    assert exp.eval_params() is exp.state.params


def test_roi_model_select_override(tmp_path, monkeypatch):
    """`eval_over_roi_also_model_select=True` switches best-checkpoint
    selection from full-image PSNR to ROI PSNR (the reference's
    published flagship protocol, README cmd / utils_trainer.py:874
    model-select arm). Scripted metric schedules where the two axes
    disagree must make the saves follow the ROI axis."""
    import srcaco2_tpu.train.trainer as TR
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    from srcaco2_tpu.train.trainer import Experiment

    root = str(tmp_path)
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=4, n_val=1, n_test=1, size=32)
    args = get_args([
        '--net_type', 'SRCNN', '--scale', '2', '--h_size', '16',
        '--n_channels', '1',
        '--train_dsets', names[0], '--valid_dsets', names[1],
        '--test_dsets', names[2],
        '--data_root', root, '--splits_root', root,
        '--l2', 'True', '--max_epochs', '1', '--batch_size', '2',
        '--eval_bsize', '1',
        '--eval_over_roi_also', 'True',
        '--eval_over_roi_also_model_select', 'True'])
    args['abs_fd_exp'] = os.path.join(root, 'exp')
    os.makedirs(args['abs_fd_exp'], exist_ok=True)
    exp = Experiment(args)

    # full PSNR improves monotonically; ROI PSNR peaks at call 1
    full_psnr = [20.0, 21.0, 22.0]
    roi_psnr = [30.0, 35.0, 31.0]
    call = {'i': -1}

    def mk(v):
        return {constants.PSNR_MTR: v, 'psnr_y': v, 'ssim': 0.5,
                'nrmse': 0.1, 'mse': 10.0}

    def fake_eval(forward, params, ds, a, bs, split, **kw):
        i = call['i'] = call['i'] + 1
        return {'full': mk(full_psnr[i]), 'roi': mk(roi_psnr[i]),
                'details': {}, 'n': 1, 'time': 0.0}

    saves = []

    def fake_save_best(d, p, n=None):
        os.makedirs(os.path.join(d, 'best-models'), exist_ok=True)
        saves.append(call['i'])

    monkeypatch.setattr(TR, 'fast_eval', fake_eval)
    monkeypatch.setattr(TR.CKPT, 'save_best', fake_save_best)
    monkeypatch.setattr(Experiment, 'evaluate_test',
                        lambda self, step, use_best=True: None)

    for step in (100, 200, 300):
        exp._validate(step)
    # calls 0 and 1 improve ROI; call 2 improves FULL only — with the
    # override on, no save may happen there
    assert saves == [0, 1]
    # the roi tracker's best index is the ROI peak, and the full
    # tracker's best_val tracked its own axis independently
    ds = args['valid_dsets']
    assert exp.roi_tracker[constants.VALIDSET][ds][
        constants.PSNR_MTR]['idx_best'] == 1
    assert exp.tracker[constants.VALIDSET][ds][
        constants.PSNR_MTR]['best_val'] == 22.0

    # control: same schedules with the override OFF select call 2
    args2 = dict(args)
    args2['eval_over_roi_also_model_select'] = False
    args2['abs_fd_exp'] = os.path.join(root, 'exp2')
    os.makedirs(args2['abs_fd_exp'], exist_ok=True)
    exp2 = Experiment(args2)
    call['i'] = -1
    saves.clear()
    for step in (100, 200, 300):
        exp2._validate(step)
    assert saves == [0, 1, 2]


def test_superstep_equivalent():
    """K lax.scan'ed steps (steps_per_call) must equal K dispatched
    steps: same per-step RNG folds, optimizer, EMA. Losses match
    bit-for-bit; params to a few ulps (XLA reorders fused ops inside
    scan, so cross-compilation bit-exactness is not guaranteed)."""
    import jax
    import jax.numpy as jnp
    from srcaco2_tpu.config.defaults import get_config
    from srcaco2_tpu.config.parser import _derive
    from srcaco2_tpu.data import pipeline as P
    from srcaco2_tpu.losses.master import build_loss
    from srcaco2_tpu.models.registry import define_g, init_variables
    from srcaco2_tpu.train.schedule import build_optimizer
    from srcaco2_tpu.train.state import TrainState
    from srcaco2_tpu.train.steps import make_train_step

    args = get_config('SRCNN')
    args['l2'] = True
    args['scale'] = 2
    args['h_size'] = 16
    args['n_channels'] = 1
    args = _derive(args)
    model = define_g(args)
    master = build_loss(args)
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.integers(0, 256, (8, 32, 32, 1)), jnp.uint8)
    lr = jnp.asarray(rng.integers(0, 256, (8, 16, 16, 1)), jnp.uint8)
    key = jax.random.key(7)
    pipe_cfg = P.PipeConfig(scale=2, h_size=16)
    sample = jnp.zeros((1, 1, 16, 16), jnp.float32)
    params, _ = init_variables(model, jax.random.key(0), sample)

    def fresh():
        tx = build_optimizer(args['train'])
        return TrainState.create(
            jax.tree.map(jnp.copy, params), tx), tx

    idxs = jnp.asarray(rng.integers(0, 8, (6, 4)), jnp.int32)

    s1, tx1 = fresh()
    one = make_train_step(model, master, tx1, 'SRCNN', pipe_cfg,
                          steps_per_epoch=3, netG=args['netG'],
                          donate=False)
    holders1 = []
    for i in range(6):
        s1, h1, _ = one(s1, hr, lr, idxs[i], key)
        holders1.append(float(h1['total']))

    s2, tx2 = fresh()
    multi = make_train_step(model, master, tx2, 'SRCNN', pipe_cfg,
                            steps_per_epoch=3, netG=args['netG'],
                            donate=False, steps_per_call=3)
    s2, h2a, _ = multi(s2, hr, lr, idxs[:3], key)
    s2, h2b, _ = multi(s2, hr, lr, idxs[3:], key)
    holders2 = [float(v) for v in np.concatenate(
        [np.asarray(h2a['total']), np.asarray(h2b['total'])])]

    np.testing.assert_array_equal(np.asarray(holders1),
                                  np.asarray(holders2))
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    assert int(s2.step) == 6
