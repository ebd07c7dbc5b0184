"""Checkpointing: iteration-numbered state + best-model params, orbax.

Reference layout parity (model_plain.save:95, utils_config.py:407-458):
  <exp>/models/<iter>_G/           (params)
  <exp>/models/<iter>_optimizerG/  (opt state + step + elb_t)
  <exp>/models/<iter>_E/           (EMA params, when E_decay > 0)
  <exp>/best-models/G-model/       (best params per validation ds;
                                    G-<ds>/ when multi-valid)
with resume = max-iteration auto-discovery and GC-to-latest.
"""
import os
import re
import shutil
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from srcaco2_tpu.train.state import TrainState

_CKPT = ocp.PyTreeCheckpointer()


def _restore(path, template=None):
    """Cross-platform restore. A checkpoint written on one platform
    (TPU training) must load on any other (CPU host tooling: eval.py
    re-scores, roi_rescore, torch_port) — the reference analog is
    torch.load(map_location=...) (eval.py:113). Plain restore(item=)
    leaves the deserialization sharding unset and fails when the
    writing device set differs from the reading one, so with a
    template we build explicit per-leaf restore args carrying the
    template's (current-platform) shardings; without one we restore
    to host numpy."""
    path = os.path.abspath(path)
    if template is not None:
        ra = ocp.checkpoint_utils.construct_restore_args(template)
        return _CKPT.restore(path, item=template, restore_args=ra)
    meta = _CKPT.metadata(path)          # StepMetadata
    tree = meta.item_metadata.tree       # pytree of ArrayMetadata
    ra = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return _CKPT.restore(path, restore_args=ra)


def _models_dir(exp_dir: str) -> str:
    # orbax/tensorstore requires absolute paths.
    return os.path.abspath(os.path.join(exp_dir, 'models'))


def save_checkpoint(exp_dir: str, state: TrainState):
    step = int(state.step)
    md = _models_dir(exp_dir)
    os.makedirs(md, exist_ok=True)
    _CKPT.save(os.path.join(md, f'{step}_G'), state.params, force=True)
    aux = {'opt_state': state.opt_state, 'step': state.step,
           'elb_t': state.elb_t}
    _CKPT.save(os.path.join(md, f'{step}_optimizerG'), aux, force=True)
    if state.ema_params is not None:
        _CKPT.save(os.path.join(md, f'{step}_E'), state.ema_params,
                   force=True)
    if state.model_state:
        _CKPT.save(os.path.join(md, f'{step}_S'), state.model_state,
                   force=True)


def find_last_checkpoint(exp_dir: str) -> int:
    """Largest saved iteration, 0 if none (utils_config.py:407)."""
    md = _models_dir(exp_dir)
    if not os.path.isdir(md):
        return 0
    steps = [int(m.group(1)) for d in os.listdir(md)
             if (m := re.match(r'^(\d+)_G$', d))]
    return max(steps, default=0)


def load_checkpoint(exp_dir: str, state: TrainState,
                    step: Optional[int] = None,
                    load_optimizer: bool = True) -> Tuple[TrainState, int]:
    """Restore params (+optimizer) at `step` (default: latest)."""
    step = step if step is not None else find_last_checkpoint(exp_dir)
    if step <= 0:
        return state, 0
    md = _models_dir(exp_dir)
    params = _restore(os.path.join(md, f'{step}_G'),
                      state.params)
    new = state.replace(params=params)
    opt_path = os.path.join(md, f'{step}_optimizerG')
    if load_optimizer and os.path.isdir(opt_path):
        aux = _restore(opt_path,
                       {'opt_state': state.opt_state,
                        'step': state.step,
                        'elb_t': state.elb_t})
        new = new.replace(opt_state=aux['opt_state'],
                          step=aux['step'], elb_t=aux['elb_t'])
    else:
        new = new.replace(step=jax.numpy.asarray(step, jax.numpy.int32))
    e_path = os.path.join(md, f'{step}_E')
    if state.ema_params is not None and os.path.isdir(e_path):
        new = new.replace(ema_params=_restore(
            e_path, state.ema_params))
    s_path = os.path.join(md, f'{step}_S')
    if state.model_state and os.path.isdir(s_path):
        new = new.replace(model_state=_restore(
            s_path, state.model_state))
    return new, step


def gc_checkpoints(exp_dir: str, keep_step: int):
    """Delete all but the latest iteration (utils_config.py:436)."""
    md = _models_dir(exp_dir)
    if not os.path.isdir(md):
        return
    for d in os.listdir(md):
        m = re.match(r'^(\d+)_(G|optimizerG|E|S)$', d)
        if m and int(m.group(1)) != keep_step:
            shutil.rmtree(os.path.join(md, d), ignore_errors=True)


def save_best(exp_dir: str, params, ds_name: Optional[str] = None):
    """best-models/G-model (single valid) or G-<ds> (multi-valid)."""
    bd = os.path.abspath(os.path.join(exp_dir, 'best-models'))
    os.makedirs(bd, exist_ok=True)
    name = 'G-model' if ds_name is None else f'G-{ds_name}'
    _CKPT.save(os.path.join(bd, name), params, force=True)


def load_best(exp_dir: str, template, ds_name: Optional[str] = None):
    bd = os.path.abspath(os.path.join(exp_dir, 'best-models'))
    name = 'G-model' if ds_name is None else f'G-{ds_name}'
    path = os.path.join(bd, name)
    if not os.path.isdir(path) and ds_name is not None:
        path = os.path.join(bd, 'G-model')
    return _restore(path, template)


def save_params(path: str, params):
    _CKPT.save(os.path.abspath(path), params, force=True)


def load_params(path: str, template):
    return _restore(path, template)


def load_params_nonstrict(path: str, template):
    """Non-strict restore (reference: model_base.load_network:183 with
    strict=False — copy what matches, keep the template elsewhere).
    Leaves present in the checkpoint with matching shapes are taken;
    everything else keeps the template's value."""
    import flax
    raw = _restore(path)
    flat_t = flax.traverse_util.flatten_dict(template)
    flat_r = flax.traverse_util.flatten_dict(raw) \
        if isinstance(raw, dict) else {}
    out = {}
    for k, v in flat_t.items():
        r = flat_r.get(k)
        if r is not None and getattr(r, 'shape', None) == v.shape:
            out[k] = jax.numpy.asarray(r, v.dtype)
        else:
            out[k] = v
    return flax.traverse_util.unflatten_dict(out)
