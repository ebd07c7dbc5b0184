"""Schedules, optimizer semantics, checkpoint GC and nonstrict load."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from srcaco2_tpu import constants
from srcaco2_tpu.config.defaults import get_config
from srcaco2_tpu.train.schedule import build_optimizer, build_schedule


def test_mysteplr_floor():
    tr = dict(get_config(constants.SRCNN)['train'])
    tr['G_scheduler_type'] = constants.MYSTEPLR
    tr['G_optimizer_lr'] = 2e-4
    tr['G_scheduler_step_size'] = 10
    tr['G_scheduler_gamma'] = 0.5
    tr['G_scheduler_min_lr'] = 1e-4
    s = build_schedule(tr)
    np.testing.assert_allclose(float(s(0)), 2e-4)
    np.testing.assert_allclose(float(s(10)), 1e-4)
    np.testing.assert_allclose(float(s(100)), 1e-4)  # floored


def test_multistep_milestones():
    tr = dict(get_config(constants.SRCNN)['train'])
    tr['G_scheduler_type'] = constants.MULTISTEPLR
    tr['G_optimizer_lr'] = 1e-3
    tr['G_scheduler_milestones'] = [5, 10]
    tr['G_scheduler_gamma'] = 0.1
    s = build_schedule(tr)
    np.testing.assert_allclose(float(s(4)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(7)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(12)), 1e-5, rtol=1e-6)


def test_adam_wd_matches_torch_semantics():
    """add_decayed_weights BEFORE scale_by_adam == torch Adam(wd)."""
    import torch
    tr = dict(get_config(constants.SRCNN)['train'])
    tr['G_optimizer_lr'] = 1e-2
    tr['G_optimizer_wd'] = 0.1
    tx = build_optimizer(tr)
    p0 = np.array([1.0, -2.0, 0.5], np.float32)
    g0 = np.array([0.1, 0.2, -0.3], np.float32)
    params = {'w': jnp.asarray(p0)}
    st = tx.init(params)
    updates, _ = tx.update({'w': jnp.asarray(g0)}, st, params)
    mine = p0 + np.asarray(updates['w'])

    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.Adam([tp], lr=1e-2, weight_decay=0.1,
                           betas=(0.9, 0.999), eps=1e-8)
    tp.grad = torch.tensor(g0)
    opt.step()
    np.testing.assert_allclose(mine, tp.detach().numpy(), atol=1e-6)


def test_checkpoint_gc_and_nonstrict(tmp_path):
    from srcaco2_tpu.train import checkpoint as CKPT
    from srcaco2_tpu.train.state import TrainState
    tr = get_config(constants.SRCNN)['train']
    tx = build_optimizer(tr)
    params = {'a': jnp.ones((3,)), 'b': jnp.zeros((2, 2))}
    st = TrainState.create(params, tx)
    d = str(tmp_path)
    for step in (5, 10):
        st = st.replace(step=jnp.asarray(step, jnp.int32))
        CKPT.save_checkpoint(d, st)
    assert CKPT.find_last_checkpoint(d) == 10
    CKPT.gc_checkpoints(d, 10)
    assert CKPT.find_last_checkpoint(d) == 10
    assert not os.path.isdir(os.path.join(d, 'models', '5_G'))
    # resume restores step
    st2, step = CKPT.load_checkpoint(d, TrainState.create(params, tx))
    assert step == 10 and int(st2.step) == 10
    # nonstrict: template with an extra leaf keeps its value
    CKPT.save_params(os.path.join(d, 'pre'), {'a': jnp.full((3,), 7.0)})
    tpl = {'a': jnp.zeros((3,)), 'extra': jnp.ones((4,))}
    out = CKPT.load_params_nonstrict(os.path.join(d, 'pre'), tpl)
    np.testing.assert_allclose(np.asarray(out['a']), 7.0)
    np.testing.assert_allclose(np.asarray(out['extra']), 1.0)
