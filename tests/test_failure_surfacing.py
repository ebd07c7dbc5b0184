"""Per-step failure surfacing (VERDICT r1 #8) and EDT sampling
behavior vs exact scipy EDT on realistic-size ROI maps (#10)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srcaco2_tpu import constants
from srcaco2_tpu.config.defaults import get_config
from srcaco2_tpu.data import pipeline as P
from srcaco2_tpu.train.schedule import build_optimizer
from srcaco2_tpu.train.state import TrainState
from srcaco2_tpu.train.steps import make_train_step

import flax.linen as nn


class _ExplodingNet(nn.Module):
    """Prediction overflows to inf when w grows: finite loss+grads at
    first, then corrupt predictions — exercises the corrupt flag."""
    blowup: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        w = self.param('w', nn.initializers.ones, ())
        out = x * w
        if self.blowup:     # static: excluded from the graph when 0
            out = out + self.blowup * jnp.exp(
                (w * 500.0).astype(jnp.float32))
        return {'out': out}


def _mk(net, loss_total):
    class _Master:
        def __call__(self, outputs, batch, params, epoch, elb_t):
            t = loss_total(outputs, batch)
            return t, {'total': t}
    cfg = P.PipeConfig(scale=2, h_size=8)
    tx = build_optimizer(get_config(constants.SRCNN)['train'])
    step = make_train_step(net, _Master(), tx, constants.VDSR, cfg,
                           steps_per_epoch=10)
    x = jnp.zeros((1, 1, 4, 4), jnp.float32)
    params = net.init(jax.random.key(0), x)['params']
    state = TrainState.create(params, tx)
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.integers(0, 255, (4, 16, 16, 1)), jnp.uint8)
    lr = jnp.asarray(rng.integers(0, 255, (4, 8, 8, 1)), jnp.uint8)
    idxs = jnp.zeros((2,), jnp.int32)
    return step, state, hr, lr, idxs


def test_skip_flag_surfaces_same_step():
    """A non-finite loss sets holder['_skipped'] on THAT step and the
    update is skipped (params unchanged)."""
    net = _ExplodingNet()
    step, state, hr, lr, idxs = _mk(
        net, lambda o, b: jnp.mean(o['out']) * jnp.nan)
    w0 = np.asarray(state.params['w'])   # state buffers are donated
    new_state, holder, ok = step(state, hr, lr, idxs,
                                 jax.random.key(0))
    assert not bool(ok)
    assert float(holder['_skipped']) == 1.0
    assert float(holder['_corrupt']) == 0.0
    np.testing.assert_array_equal(np.asarray(new_state.params['w']),
                                  w0)


def test_corrupt_flag_surfaces_same_step():
    """Non-finite predictions raise the corrupt flag that the trainer
    hard-stops on (reference check_corruption, tools.py:55)."""
    net = _ExplodingNet(blowup=1.0)   # exp(500) -> inf prediction
    step, state, hr, lr, idxs = _mk(
        net, lambda o, b: jnp.mean(jnp.clip(o['out'], 0, 1)))
    new_state, holder, ok = step(state, hr, lr, idxs,
                                 jax.random.key(0))
    assert float(holder['_corrupt']) == 1.0
    assert not bool(ok)


def test_edt_device_vs_scipy_behavioral():
    """Device chamfer EDT (cap 48) vs exact scipy EDT on a 512^2
    cell-like ROI: the induced SAMPLING distributions (weight edt+1,
    normalized) must agree closely (VERDICT r1 #10)."""
    scipy_ndimage = pytest.importorskip('scipy.ndimage')
    from srcaco2_tpu.data.sampling import edt_device, edt_map

    rng = np.random.default_rng(0)
    roi = np.zeros((512, 512), np.float32)
    yy, xx = np.mgrid[:512, :512]
    for _ in range(24):                      # cell-like blobs r<=40
        cy, cx = rng.integers(40, 472, 2)
        r = rng.integers(8, 40)
        roi[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1.0

    exact = edt_map(roi)
    approx = np.asarray(edt_device(jnp.asarray(roi)))

    w_exact = (exact + 1.0).ravel()
    w_approx = (approx + 1.0).ravel()
    p_exact = w_exact / w_exact.sum()
    p_approx = w_approx / w_approx.sum()
    tv = 0.5 * np.abs(p_exact - p_approx).sum()
    # chamfer measures L-inf distance and caps at 48; for blob radii
    # <= 40 the cap never binds and the metric difference shifts <4%
    # of the probability mass.
    assert tv < 0.04, tv
    # exact on ROI-boundary behavior: zero outside ROI, positive inside
    assert (approx[roi == 0] == 0).all()
    assert (approx[roi > 0] >= 1).all()
