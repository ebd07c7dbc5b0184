"""Evaluator unit tests: tail-batch padding, details keys, corruption
guard, interpolate baseline forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.data.dataset import load_dataset
from srcaco2_tpu.data.synthetic import make_synthetic_dataset
from srcaco2_tpu.train.evaluator import (fast_eval,
                                         make_interpolate_forward)


@pytest.fixture(scope='module')
def ds5(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('evalds'))
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=2, n_val=5, n_test=2,
                                   size=64)
    args = {'data_root': root, 'splits_root': root, 'scale': 2,
            'n_channels': 1, 'myseed': 0, 'use_interpolated_low': False,
            'inter_low_th': 7., 'inter_low_sigma': 6., 'num_workers': 2,
            'eval_over_roi_also': True,
            'eval_over_roi_also_ths': constants.ROI_THRESH,
            'is_master': False}
    ds = load_dataset(args, names[1], constants.EVAL_PHASE).stage()
    return args, ds


def test_fast_eval_tail_padding(ds5):
    """5 samples, batch 2: padded tail must not duplicate or drop."""
    args, ds = ds5
    fwd = make_interpolate_forward(2, constants.INTER_BICUBIC)
    perf = fast_eval(fwd, None, ds, args, eval_bsize=2,
                     split=constants.VALIDSET)
    assert perf['n'] == 5
    assert len(perf['details']) == 5
    assert set(perf['details']) == set(ds.ids)
    # mean equals mean of per-image details
    per_img = [d[constants.PSNR_MTR] for d in perf['details'].values()]
    np.testing.assert_allclose(perf['full'][constants.PSNR_MTR],
                               np.mean(per_img), rtol=1e-6)
    assert 'roi' in perf and len(perf['roi_details']) == 5


def test_fast_eval_corruption_guard(ds5):
    args, ds = ds5

    def bad_fwd(params, batch):
        return jnp.full_like(batch['h_im'], jnp.nan)

    with pytest.raises(FloatingPointError):
        fast_eval(bad_fwd, None, ds, args, eval_bsize=2,
                  split=constants.VALIDSET)


def test_negative_ssim_guard_fast_sweep(ds5, monkeypatch):
    """SSIM is legitimately in [-1, 1]: a finite-negative metric must
    hard-stop under the reference-parity guard (utils_trainer.py:933)
    but only warn in fast-sweep mode, where few-epoch smoke seeds
    produce anticorrelated outputs without corruption. Non-finite
    stays fatal in both modes."""
    import srcaco2_tpu.train.evaluator as EV
    args, ds = ds5
    fwd = make_interpolate_forward(2, constants.INTER_BICUBIC)

    real_make = EV.make_metric_fn

    def neg_ssim_metric_fn(*a, **kw):
        inner = real_make(*a, **kw)

        def wrapped(e_img, h_img):
            res = inner(e_img, h_img)
            res['full'][constants.SSIM_MTR] = (
                -jnp.abs(res['full'][constants.SSIM_MTR]) - 0.1)
            return res
        return wrapped

    monkeypatch.setattr(EV, 'make_metric_fn', neg_ssim_metric_fn)
    monkeypatch.delenv('SRCACO2_FAST_SWEEP', raising=False)
    with pytest.raises(FloatingPointError):
        fast_eval(fwd, None, ds, args, eval_bsize=2,
                  split=constants.VALIDSET)
    monkeypatch.setenv('SRCACO2_FAST_SWEEP', '1')
    perf = fast_eval(fwd, None, ds, args, eval_bsize=2,
                     split=constants.VALIDSET)
    assert perf['n'] == 5
    assert perf['full'][constants.SSIM_MTR] < 0

    def nan_fwd(params, batch):
        return jnp.full_like(batch['h_im'], jnp.nan)

    # non-finite stays fatal even in fast-sweep mode
    with pytest.raises(FloatingPointError):
        fast_eval(nan_fwd, None, ds, args, eval_bsize=2,
                  split=constants.VALIDSET)
