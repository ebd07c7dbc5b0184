"""Network factory + weight-init schemes.

Reference analog: select_network.define_G:19 (dispatch over
constants.MODELS reading `netG['<nt>_<param>']` keys) and init_weights:294
(8 schemes applied post-construction). Here define_g builds a flax module;
apply_init re-draws kernels per scheme on the initialized pytree.
"""
import math
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import flax
import flax.linen as nn

from srcaco2_tpu import constants
from srcaco2_tpu.config.net_defaults import safe_str_var


def _p(netG: dict, nt: str, key: str):
    return netG[f'{safe_str_var(nt)}_{key}']


def define_g(args: dict) -> nn.Module:
    """Build the generator module from the resolved config."""
    netG = args['netG']
    nt = netG['net_type']
    dtype = jnp.bfloat16 if args.get('amp', False) else jnp.float32

    if nt == constants.SRCNN:
        from srcaco2_tpu.models.cnn_pre import SRCNN
        return SRCNN(in_chans=_p(netG, nt, 'in_chans'), dtype=dtype)
    if nt == constants.VDSR:
        from srcaco2_tpu.models.cnn_pre import VDSR
        return VDSR(in_chans=_p(netG, nt, 'in_chans'),
                    upscale=_p(netG, nt, 'upscale'), dtype=dtype)
    if nt == constants.DRRN:
        from srcaco2_tpu.models.cnn_pre import DRRN
        return DRRN(in_chans=_p(netG, nt, 'in_chans'),
                    upscale=_p(netG, nt, 'upscale'),
                    num_residual_units=_p(netG, nt, 'num_residual_units'),
                    dtype=dtype)
    if nt == constants.MEMNET:
        from srcaco2_tpu.models.cnn_pre import MemNet
        return MemNet(in_chans=_p(netG, nt, 'in_chans'),
                      upscale=_p(netG, nt, 'upscale'),
                      num_memory_blocks=_p(netG, nt, 'num_memory_blocks'),
                      num_residual_blocks=_p(netG, nt,
                                             'num_residual_blocks'),
                      # per-pass remat of the R^2 recursion (identical
                      # math; the order-based torch port needs False —
                      # see _MemoryBlock docstring)
                      remat_passes=netG.get('memnet_remat_passes', True),
                      dtype=dtype)
    if nt == constants.SWINIR:
        from srcaco2_tpu.models.swinir import SwinIR
        return SwinIR(in_chans=_p(netG, nt, 'in_chans'),
                      upscale=_p(netG, nt, 'upscale'),
                      img_range=_p(netG, nt, 'img_range'),
                      window_size=_p(netG, nt, 'window_size'),
                      embed_dim=_p(netG, nt, 'embed_dim'),
                      depths=tuple(_p(netG, nt, 'depths')),
                      num_heads=tuple(_p(netG, nt, 'num_heads')),
                      mlp_ratio=float(_p(netG, nt, 'mlp_ratio')),
                      upsampler=_p(netG, nt, 'upsampler'),
                      resi_connection=_p(netG, nt, 'resi_connection'),
                      fused_blocks=bool(netG.get(
                          f'{safe_str_var(nt)}_use_fused_blocks',
                          False)),
                      dtype=dtype)
    if nt == constants.DFCAN:
        from srcaco2_tpu.models.dfcan import DFCAN
        return DFCAN(in_chans=_p(netG, nt, 'in_chans'),
                     upscale=_p(netG, nt, 'upscale'), dtype=dtype)
    if nt == constants.NLSN:
        from srcaco2_tpu.models.nlsn import NLSN
        return NLSN(in_chans=_p(netG, nt, 'in_chans'),
                    upscale=_p(netG, nt, 'upscale'),
                    n_resblocks=_p(netG, nt, 'n_resblocks'),
                    n_feats=_p(netG, nt, 'n_feats'),
                    n_hashes=_p(netG, nt, 'n_hashes'),
                    chunk_size=_p(netG, nt, 'chunk_size'),
                    res_scale=_p(netG, nt, 'res_scale'), dtype=dtype)
    if nt == constants.ENLCN:
        from srcaco2_tpu.models.enlcn import ENLCN
        return ENLCN(in_chans=_p(netG, nt, 'in_chans'),
                     upscale=_p(netG, nt, 'upscale'),
                     n_resblocks=_p(netG, nt, 'n_resblock'),
                     n_feats=_p(netG, nt, 'n_feats'),
                     res_scale=_p(netG, nt, 'res_scale'), dtype=dtype)
    if nt == constants.OMNISR:
        from srcaco2_tpu.models.omnisr import OmniSR
        return OmniSR(in_chans=_p(netG, nt, 'in_chans'),
                      upscale=_p(netG, nt, 'upscale'),
                      num_feat=_p(netG, nt, 'num_feat'),
                      res_num=_p(netG, nt, 'res_num'),
                      block_num=_p(netG, nt, 'block_num'),
                      window_size=_p(netG, nt, 'window_size'),
                      pe=_p(netG, nt, 'pe'),
                      bias=_p(netG, nt, 'bias'),
                      ffn_bias=_p(netG, nt, 'ffn_bias'), dtype=dtype)
    if nt == constants.DBPN:
        from srcaco2_tpu.models.dbpn import DBPN
        return DBPN(in_chans=_p(netG, nt, 'in_chans'),
                    upscale=_p(netG, nt, 'upscale'),
                    base_filter=_p(netG, nt, 'base_filter'),
                    feat=_p(netG, nt, 'feat'),
                    num_stages=_p(netG, nt, 'num_stages'),
                    remat_blocks=netG.get('dbpn_remat_blocks', True),
                    dtype=dtype)
    if nt == constants.SRFBN:
        from srcaco2_tpu.models.srfbn import SRFBN
        return SRFBN(in_chans=_p(netG, nt, 'in_chans'),
                     upscale=_p(netG, nt, 'upscale'),
                     num_features=_p(netG, nt, 'num_features'),
                     num_steps=_p(netG, nt, 'num_steps'),
                     num_groups=_p(netG, nt, 'num_groups'),
                     remat_steps=netG.get('srfbn_remat_steps', False),
                     dtype=dtype)
    if nt == constants.MSLAPSR:
        from srcaco2_tpu.models.mslapsr import MSLapSRN
        return MSLapSRN(in_chans=_p(netG, nt, 'in_chans'),
                        upscale=_p(netG, nt, 'upscale'), dtype=dtype)
    if nt == constants.PROSR:
        from srcaco2_tpu.models.prosr import ProSR
        return ProSR(in_chans=_p(netG, nt, 'in_chans'),
                     upscale=_p(netG, nt, 'upscale'),
                     num_init_features=_p(netG, nt, 'num_init_features'),
                     growth_rate=_p(netG, nt, 'growth_rate'),
                     bn_size=_p(netG, nt, 'bn_size'),
                     max_num_feature=_p(netG, nt, 'max_num_feature'),
                     level_config=_p(netG, nt, 'level_config'),
                     res_factor=_p(netG, nt, 'res_factor'),
                     block_compression=_p(netG, nt, 'block_compression'),
                     ps_woReLU=bool(netG.get(
                         f'{safe_str_var(nt)}_ps_woReLU', False)),
                     dtype=dtype)
    if nt == constants.ACT:
        from srcaco2_tpu.models.act import ACT
        return ACT(in_chans=_p(netG, nt, 'in_chans'),
                   upscale=_p(netG, nt, 'upscale'),
                   n_feats=_p(netG, nt, 'n_feats'),
                   n_resgroups=_p(netG, nt, 'n_resgroups'),
                   n_resblocks=_p(netG, nt, 'n_resblocks'),
                   reduction=_p(netG, nt, 'reduction'),
                   n_heads=_p(netG, nt, 'n_heads'),
                   n_layers=_p(netG, nt, 'n_layers'),
                   n_fusionblocks=_p(netG, nt, 'n_fusionblocks'),
                   token_size=_p(netG, nt, 'token_size'),
                   expansion_ratio=_p(netG, nt, 'expansion_ratio'),
                   dtype=dtype)
    if nt == constants.GRL:
        from srcaco2_tpu.models.grl import GRL
        return GRL(in_chans=_p(netG, nt, 'in_chans'),
                   upscale=_p(netG, nt, 'upscale'),
                   window_size=_p(netG, nt, 'window_size'),
                   embed_dim=_p(netG, nt, 'embed_dim'),
                   depths=tuple(_p(netG, nt, 'depths')),
                   num_heads_window=tuple(_p(netG, nt,
                                             'num_heads_window')),
                   num_heads_stripe=tuple(_p(netG, nt,
                                             'num_heads_stripe')),
                   mlp_ratio=float(_p(netG, nt, 'mlp_ratio')),
                   anchor_window_down_factor=_p(
                       netG, nt, 'anchor_window_down_factor'),
                   local_connection=_p(netG, nt, 'local_connection'),
                   upsampler=_p(netG, nt, 'upsampler'), dtype=dtype)
    if nt == constants.EDSR_LIIF:
        from srcaco2_tpu.models.edsr_liif import EDSRLIIF
        return EDSRLIIF(in_chans=_p(netG, nt, 'in_chans'),
                        upscale=_p(netG, nt, 'upscale'),
                        n_feats=_p(netG, nt, 'n_feats'),
                        n_resblocks=_p(netG, nt, 'n_resblocks'),
                        res_scale=_p(netG, nt, 'res_scale'),
                        local_ensemble=_p(netG, nt, 'local_ensemble'),
                        feat_unfold=_p(netG, nt, 'feat_unfold'),
                        cell_decode=_p(netG, nt, 'cell_decode'),
                        dtype=dtype)
    if nt == constants.DSRSPLINES:
        from srcaco2_tpu.models.dsr_splines import DSRSplines
        return DSRSplines(in_planes=_p(netG, nt, 'in_planes'),
                          upscale=_p(netG, nt, 'upscale'),
                          in_ksz=_p(netG, nt, 'in_ksz'),
                          splinenet_type=_p(netG, nt, 'splinenet_type'),
                          n_splines_per_color=_p(
                              netG, nt, 'n_splines_per_color'),
                          color_min=_p(netG, nt, 'color_min'),
                          color_max=_p(netG, nt, 'color_max'),
                          use_local_residual=_p(netG, nt,
                                                'use_local_residual'),
                          use_global_residual=_p(netG, nt,
                                                 'use_global_residual'),
                          dtype=dtype)
    if nt == constants.CSRCNN:
        from srcaco2_tpu.models.csrcnn import CSRCNN
        return CSRCNN(in_planes=_p(netG, nt, 'in_planes'),
                      upscale=_p(netG, nt, 'upscale'),
                      net_type=_p(netG, nt, 'net_type'),
                      in_ksz=_p(netG, nt, 'in_ksz'),
                      ngroups=_p(netG, nt, 'ngroups'),
                      inner_channel=_p(netG, nt, 'inner_channel'),
                      norm_groups=_p(netG, nt, 'norm_groups'),
                      channel_mults=_p(netG, nt, 'channel_mults'),
                      res_blocks=_p(netG, nt, 'res_blocks'),
                      dropout=_p(netG, nt, 'dropout'),
                      use_global_residual=_p(netG, nt,
                                             'use_global_residual'),
                      use_local_residual=netG.get(
                          f'{safe_str_var(nt)}_use_local_residual',
                          False),
                      net_task=netG.get('net_task',
                                        constants.REGRESSION),
                      dtype=dtype)
    raise NotImplementedError(nt)


def init_params(module: nn.Module, rng: jax.Array,
                sample_input: jax.Array) -> Dict:
    return module.init(rng, sample_input, train=False)['params']


def init_variables(module: nn.Module, rng: jax.Array,
                   sample_input: jax.Array) -> Tuple[Dict, Dict]:
    """(params, model_state): model_state holds the non-param
    collections (batch_stats for BN models like MemNet); empty dict
    when the model is stateless."""
    variables = module.init(rng, sample_input, train=False)
    params = variables['params']
    model_state = {k: v for k, v in variables.items() if k != 'params'}
    return params, model_state


# ------------------------------------------------------------ init schemes
def _fans(shape):
    """fan_in/fan_out for conv (H,W,I,O) or dense (I,O) kernels."""
    if len(shape) == 2:
        return shape[0], shape[1]
    rf = 1
    for s in shape[:-2]:
        rf *= s
    return shape[-2] * rf, shape[-1] * rf


def apply_init(params: Dict, scheme: str, gain: float,
               rng: jax.Array) -> Dict:
    """Re-draw kernel leaves per the requested scheme
    (reference: init_weights, select_network.py:294). 'default' keeps each
    model's own initialization."""
    if scheme == constants.INIT_W_DEFAULT:
        return params

    flat = flax.traverse_util.flatten_dict(params)
    new = {}
    keys = jax.random.split(rng, len(flat))
    for k_i, (path, leaf) in zip(keys, flat.items()):
        name = path[-1]
        if name != 'kernel' or leaf.ndim < 2:
            new[path] = leaf
            continue
        shape = leaf.shape
        fan_in, fan_out = _fans(shape)
        if scheme == constants.INIT_W_NORMAL:
            w = jax.random.normal(k_i, shape) * 0.1 * gain
        elif scheme == constants.INIT_W_UNIFORM:
            w = (jax.random.uniform(k_i, shape) * 0.2 - 0.1) * gain
        elif scheme == constants.INIT_W_XAVIER_NORMAL:
            std = gain * math.sqrt(2.0 / (fan_in + fan_out))
            w = jax.random.normal(k_i, shape) * std
        elif scheme == constants.INIT_W_XAVIER_UNIFORM:
            a = gain * math.sqrt(6.0 / (fan_in + fan_out))
            w = jax.random.uniform(k_i, shape, minval=-a, maxval=a)
        elif scheme == constants.INIT_W_KAIMING_NORMAL:
            std = math.sqrt(2.0 / fan_in)
            w = jax.random.normal(k_i, shape) * std * gain
        elif scheme == constants.INIT_W_KAIMING_UNIFORM:
            a = math.sqrt(6.0 / fan_in)
            w = jax.random.uniform(k_i, shape, minval=-a, maxval=a) * gain
        elif scheme == constants.INIT_W_ORTHOGONAL:
            w = nn.initializers.orthogonal(scale=gain)(k_i, shape)
        else:
            raise NotImplementedError(scheme)
        new[path] = w.astype(leaf.dtype)
    return flax.traverse_util.unflatten_dict(new)


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
