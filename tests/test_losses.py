"""Loss system: every term, ELB, epoch windows, residual switch,
curriculum/progressive dispatch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.config.defaults import get_config
from srcaco2_tpu.losses import ops as L
from srcaco2_tpu.losses.elb import elb, update_t
from srcaco2_tpu.losses.master import build_loss


def _batch(b=2, c=1, h=24, w=24, seed=0):
    rng = np.random.default_rng(seed)
    pred = jnp.asarray(rng.uniform(0, 1, (b, c, h, w)), jnp.float32)
    trg = jnp.asarray(rng.uniform(0, 1, (b, c, h, w)), jnp.float32)
    return pred, trg


ALL_FLAGS = ['l1', 'l2', 'l2sum', 'ssim', 'charbonnier', 'boundpred',
             'local_moments', 'img_grad', 'norm_img_grad', 'laplace',
             'norm_laplace', 'loc_var', 'norm_loc_var', 'hist', 'kde',
             'w_sparsity']


@pytest.mark.parametrize('flag', ALL_FLAGS)
def test_every_term_finite_and_differentiable(flag):
    args = get_config(constants.SRCNN)
    args[flag] = True
    if flag == 'kde':
        args['kde_nbins'] = 64
    master = build_loss(args)
    pred, trg = _batch()
    params = {'w': jnp.ones((3, 3))}

    def f(p):
        total, holder = master({'out': p}, {'h_im': trg}, params,
                               epoch=0, elb_t=1.0)
        return total

    val, grad = jax.value_and_grad(f)(pred)
    assert np.isfinite(float(val)), flag
    assert np.all(np.isfinite(np.asarray(grad))), flag


def test_l2_value():
    args = get_config(constants.SRCNN)
    args['l2'] = True
    master = build_loss(args)
    pred, trg = _batch()
    total, holder = master({'out': pred}, {'h_im': trg})
    want = float(((np.asarray(pred) - np.asarray(trg)) ** 2).mean())
    np.testing.assert_allclose(float(holder['l2']), want, rtol=1e-6)
    np.testing.assert_allclose(float(total), want, rtol=1e-6)


def test_weighted_l1_uses_ppiw():
    args = get_config(constants.SRCNN)
    args['l1'] = True
    master = build_loss(args)
    pred, trg = _batch()
    w = jnp.ones_like(trg) * 2.0
    t_unw, _ = master({'out': pred}, {'h_im': trg})
    t_w, _ = master({'out': pred}, {'h_im': trg,
                                    'h_per_pixel_weight': w})
    np.testing.assert_allclose(float(t_w), 2 * float(t_unw), rtol=1e-6)


def test_composite_flagship_loss():
    """l2 + 5*ssim(window 19): the benchmark loss."""
    args = get_config(constants.SWINIR)
    args['l2'] = True
    args['ssim'] = True
    args['ssim_lambda'] = 5.0
    args['ssim_window_s'] = 19
    master = build_loss(args)
    pred, trg = _batch(h=32, w=32)
    total, holder = master({'out': pred}, {'h_im': trg})
    assert set(holder) == {'l2', 'ssim', 'total'}
    # identical images: l2=0, ssim=-5
    t2, h2 = master({'out': trg}, {'h_im': trg})
    np.testing.assert_allclose(float(h2['l2']), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(h2['ssim']), -5.0, atol=1e-3)


def test_ssim_train_matches_direct_conv():
    """Banded-matmul SSIM == direct 2D-conv SSIM (scipy oracle)."""
    import scipy.signal
    pred, trg = _batch(h=20, w=20, seed=3)
    ws = 11
    got = np.asarray(L.ssim_train(pred, trg, ws))
    xs = np.arange(ws) - ws // 2
    g = np.exp(-(xs ** 2) / (2 * 1.5 ** 2))
    g = g / g.sum()
    k = g[:, None] * g[None, :]

    def conv(img):
        return scipy.signal.convolve2d(img, k[::-1, ::-1], mode='same')

    x = np.asarray(pred)[0, 0].astype(np.float64)
    y = np.asarray(trg)[0, 0].astype(np.float64)
    mx, my = conv(x), conv(y)
    sx = conv(x * x) - mx ** 2
    sy = conv(y * y) - my ** 2
    sxy = conv(x * y) - mx * my
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
        (mx ** 2 + my ** 2 + c1) * (sx + sy + c2))
    np.testing.assert_allclose(got[0], m.mean(), atol=1e-4)


def test_elb_piecewise_and_t_update():
    t = 1.0
    # log branch for strongly negative constraints
    v = float(elb(jnp.asarray([-4.0]), t))
    np.testing.assert_allclose(v, -(1 / t) * np.log(4.0), rtol=1e-5)
    # linear branch for positive constraints
    v2 = float(elb(jnp.asarray([2.0]), t))
    np.testing.assert_allclose(
        v2, t * 2.0 - (1 / t) * np.log(1 / t ** 2) + 1 / t, rtol=1e-5)
    # t ramps toward max
    tt = 1.0
    for _ in range(500):
        tt = float(update_t(tt, 1.01, 10.0))
    assert tt == 10.0


def test_epoch_window_activation():
    from srcaco2_tpu.losses.master import MasterLoss, Term
    term = Term('l2', 1.0, lambda p, y, ctx: ((p - y) ** 2).mean(),
                start_epoch=5, end_epoch=10)
    master = MasterLoss([term])
    pred, trg = _batch()
    t0, _ = master({'out': pred}, {'h_im': trg}, epoch=0)
    t7, _ = master({'out': pred}, {'h_im': trg}, epoch=7)
    t12, _ = master({'out': pred}, {'h_im': trg}, epoch=12)
    assert float(t0) == 0.0 and float(t12) == 0.0
    assert float(t7) > 0.0


def test_residual_switch():
    args = get_config(constants.VDSR)
    args['l2'] = True
    args['l2_use_residuals'] = True
    master = build_loss(args)
    pred, trg = _batch()
    x_interp = trg * 0.5
    residual = pred - x_interp
    total, _ = master({'out': pred, 'x_interp': x_interp,
                       'global_residual': residual}, {'h_im': trg})
    want = float(((np.asarray(residual)
                   - (np.asarray(trg) - np.asarray(x_interp))) ** 2
                  ).mean())
    np.testing.assert_allclose(float(total), want, rtol=1e-5)


def test_curriculum_and_progressive_dispatch():
    from srcaco2_tpu.train.steps import compute_model_loss
    args = get_config(constants.SRCNN)
    args['l2'] = True
    master = build_loss(args)
    pred, trg = _batch(h=16, w=16)
    # SRFBN: mean over intermediate outs
    outs = {'out': pred, 'intermediate_outs': [pred, trg]}
    total, holder = compute_model_loss(constants.SRFBN, master, outs,
                                       {'h_im': trg}, None, 0, 1.0)
    t_a, _ = master({'out': pred}, {'h_im': trg})
    np.testing.assert_allclose(float(total), float(t_a) / 2, rtol=1e-5)
    # ProSR: (final + levels) / (n+1), downscaled targets
    small = jnp.asarray(np.zeros((2, 1, 8, 8)), jnp.float32)
    outs = {'out': pred, 'intermediate_outs': [small]}
    total2, _ = compute_model_loss(constants.PROSR, master, outs,
                                   {'h_im': trg}, None, 0, 1.0)
    assert np.isfinite(float(total2))
