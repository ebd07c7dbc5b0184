"""Differential parity tests against the REFERENCE torch models.

For each network, the reference torch module (imported from
/root/reference via tests/ref_import — never copied) is built from the
same netG config, its state_dict is ported into the flax params
(diagnosis/torch_port), and the forward outputs are compared on the
same random input. This is the only test class that catches silent
architecture drift (it already caught: DRRN's in-place-ReLU residual
shortcut, MemNet's unshared BN residual blocks, SwinIR's patch-embed
LayerNorm, and square-Linear weights ported untransposed).

Stochastic models (NLSN's per-forward LSH rotations, ENLCN's random
kernel feature projections — torch.randn in their forward/init) cannot
match bit-for-bit; they get statistical/structural checks instead.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_import import install

torch = pytest.importorskip('torch')

from srcaco2_tpu import constants
from srcaco2_tpu.config.defaults import get_config
from srcaco2_tpu.models.registry import define_g
from srcaco2_tpu.diagnosis.torch_port import (port_dbpn,
                                              port_dsr_splines,
                                              port_grl,
                                              port_state_dict,
                                              port_swinir,
                                              torch_named_params)

MEAN_SHIFT_SKIP = {f'{m}.{p}': 'skip' for m in ('sub_mean', 'add_mean')
                   for p in ('weight', 'bias')}


def build_ref(args):
    """Construct the reference torch net from MY config dict via the
    reference's own define_G (same netG key surface, upper-case keys)."""
    install()
    from types import SimpleNamespace
    from dlib.models.select_network import define_G
    from dlib.utils import constants as ref_C
    from dlib.utils.shared import safe_str_var as ssv
    from srcaco2_tpu import constants as my_C
    nt = args['netG']['net_type']
    attr = next(a for a in dir(my_C) if a.isupper()
                and getattr(my_C, a, None) == nt)
    ref_nt = getattr(ref_C, attr)
    netG = dict(args['netG'])
    netG['net_type'] = ref_nt
    lo, up = nt.lower(), ssv(ref_nt)
    for k, v in list(netG.items()):
        if k.startswith(lo + '_'):
            netG[up + k[len(lo):]] = v
    return define_G(SimpleNamespace(
        netG=netG, is_train=False,
        color_min=args.get('color_min', 0),
        color_max=args.get('color_max', 255)))


def both_outputs(net_type, shrink=None, in_hw=16, overrides=None,
                 porter=None, seed=0, lsh_seed=1):
    args = get_config(net_type)
    args['n_channels'] = 1
    args['netG'][f'{net_type.lower()}_in_chans'] = 1
    if shrink:
        args['netG'].update(shrink)
    torch.manual_seed(seed)
    tnet = build_ref(args).eval()
    fnet = define_g(args)
    x = np.random.default_rng(seed).normal(
        0.45, 0.15, (2, 1, in_hw, in_hw)).astype(np.float32).clip(0, 1)
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x))
    if isinstance(tout, (list, tuple)):
        tout = tout[-1]
    tout = tout.numpy()
    variables = fnet.init(jax.random.key(0), jnp.asarray(x),
                          train=False)
    rest = {k: v for k, v in variables.items() if k != 'params'}
    tp = torch_named_params(tnet)
    if porter is not None:
        ported = porter(tp, variables['params'])
    else:
        ported = port_state_dict(tp, variables['params'],
                                 overrides=overrides)
    fout = fnet.apply({'params': ported, **rest}, jnp.asarray(x),
                      train=False,
                      rngs={'lsh': jax.random.key(lsh_seed)})['out']
    return np.asarray(fout), tout


def assert_close(fout, tout, rtol):
    scale = max(np.abs(tout).max(), 1e-3)
    np.testing.assert_allclose(fout, tout, atol=rtol * scale, rtol=0)


def test_srcnn():
    assert_close(*both_outputs(constants.SRCNN), rtol=1e-5)


def test_vdsr():
    assert_close(*both_outputs(constants.VDSR), rtol=1e-5)


def test_drrn():
    # 25 shared-weight recursions amplify f32 rounding
    assert_close(*both_outputs(constants.DRRN), rtol=3e-5)


def test_memnet():
    # remat_passes=False: the order-based port needs creation-ordered
    # params (the remat lift canonicalizes them — same constraint as
    # dbpn_remat_blocks below; math is identical either way)
    assert_close(*both_outputs(
        constants.MEMNET,
        shrink={'memnet_num_memory_blocks': 2,
                'memnet_num_residual_blocks': 2,
                'memnet_remat_passes': False}, in_hw=12), rtol=3e-5)


def test_swinir_fused():
    """Flagship: fused-block production layout (stage scan + stacked
    block params), name-based port."""
    assert_close(*both_outputs(
        constants.SWINIR,
        shrink={'swinir_embed_dim': 32, 'swinir_depths': [2, 2],
                'swinir_num_heads': [2, 2], 'swinir_window_size': 4,
                'swinir_use_fused_blocks': True},
        porter=port_swinir), rtol=1e-5)


def test_grl():
    """Weight-ported GRL (mixed window/anchor-stripe attention, CPB
    MLPs, pair-scanned blocks) matches the reference. Found + fixed:
    missing norm_start token LayerNorm after conv_first
    (network_grl.py:1258,1456) and constant-zero (not reflect)
    image-size padding."""
    assert_close(*both_outputs(constants.GRL, porter=port_grl),
                 rtol=3e-4)


def test_dfcan():
    # tanh-GELU vs erf-GELU bounds the gap (PARITY.md)
    assert_close(*both_outputs(constants.DFCAN), rtol=3e-4)


def test_nlsn_stochastic_envelope():
    """NLSN draws LSH rotations per forward (network_nlsn.py:153);
    outputs can't match bit-for-bit, but the rotations only reshuffle
    hash buckets — outputs agree to ~0.1% (this envelope caught a real
    res_scale-on-the-wrong-operand bug that produced 50% divergence)."""
    fout, tout = both_outputs(constants.NLSN,
                              overrides=MEAN_SHIFT_SKIP)
    assert fout.shape == tout.shape
    assert np.isfinite(fout).all()
    scale = np.abs(tout).max()
    assert np.abs(fout - tout).max() < 0.02 * scale + 1e-3


def test_dbpn():
    # port_dbpn enforces remat_blocks=False (the remat lift sorts the
    # param dict, breaking the creation-order zip; the math is
    # identical either way — see torch_port.py module docstring).
    assert_close(*both_outputs(
        constants.DBPN, shrink={'dbpn_remat_blocks': False},
        porter=lambda tp, fp: port_dbpn(tp, fp, remat_blocks=False)),
        rtol=3e-5)


def test_dbpn_port_guard():
    with pytest.raises(ValueError, match='remat_blocks=False'):
        port_dbpn([], {}, remat_blocks=True)


def test_mslapsr():
    assert_close(*both_outputs(constants.MSLAPSR), rtol=1e-5)


def _srfbn_order(name):
    """torch named_parameters walks ModuleLists list-major
    (upBlocks.0..G, downBlocks.0..G, ...) while execution (and the
    flax creation order) interleaves per group
    (network_srfbn.py:507-560)."""
    import re
    m = re.match(r'block\.(up|down|uptran|downtran)Blocks\.(\d+)\.',
                 name)
    if m:
        kind, i = m.group(1), int(m.group(2))
        return {'uptran': (3, i + 1, 0), 'up': (3, i, 1),
                'downtran': (3, i + 1, 2), 'down': (3, i, 3)}[kind]
    for j, pfx in enumerate(('conv_in', 'feat_in',
                             'block.compress_in')):
        if name.startswith(pfx):
            return (j - 3,)
    if name.startswith('block.compress_out'):
        return (4,)
    if name.startswith('out.'):
        return (5,)
    if name.startswith('conv_out'):
        return (6,)
    return (9,)


def _port_srfbn(tp, fp):
    tp = [t for t in tp if t[0] not in MEAN_SHIFT_SKIP]
    tp = [t for _, t in sorted(enumerate(tp),
                               key=lambda e: (_srfbn_order(e[1][0]),
                                              e[0]))]
    return port_state_dict(tp, fp)


def test_srfbn():
    # like DBPN, the per-step remat lift reorders the flattened param
    # walk; the port path uses the remat-free (creation-ordered) tree.
    # Numerics are identical either way (tests/test_models_zoo2).
    assert_close(*both_outputs(
        constants.SRFBN, shrink={'srfbn_remat_steps': False},
        porter=_port_srfbn), rtol=1e-5)


def _act_key(name):
    """torch ACT registers branch ModuleLists list-major
    (network_act.py:431-456) while execution interleaves per fusion
    stage (forward :495-529)."""
    import re
    if name.startswith('head'):
        return (0, 0, 0)
    if name.startswith('linear_encoding'):
        return (1, 0, 0)
    for pat, sub in ((r'mhsa_block\.(\d+)\.', 0),
                     (r'cnn_branch\.(\d+)\.', 10),
                     (r'fusion_block\.(\d+)\.', 11),
                     (r'fusion_mlp\.(\d+)\.', 12),
                     (r'fusion_cnn\.(\d+)\.', 13)):
        m = re.match(pat, name)
        if m:
            return (2, int(m.group(1)), sub)
    m = re.match(r'csta_block\.(\d+)\.(\d+)\.', name)
    if m:
        return (2, int(m.group(1)), 1 + int(m.group(2)))
    if name.startswith('conv_last'):
        return (3, 0, 0)
    return (4, 0, 0)


def _port_act(tp, fp):
    # cnn_branch registers a trailing conv the forward never calls
    # (network_act.py:427 vs :513) — dead weights, skipped.
    tp = [t for t in tp if not t[0].startswith('cnn_branch.4.')
          and t[0] not in MEAN_SHIFT_SKIP]
    tp = [t for _, t in sorted(enumerate(tp),
                               key=lambda e: (_act_key(e[1][0]), e[0]))]
    return port_state_dict(tp, fp)


def test_act():
    """Weight-ported ACT matches within the tanh-vs-erf GELU bound
    (caught + fixed: FB 1x1 convs must be bias-free)."""
    assert_close(*both_outputs(constants.ACT, in_hw=24,
                               porter=_port_act), rtol=5e-4)


def test_act_indivisible():
    """ACT at the x8 benchmark input (16x16, NOT a token-size
    multiple): the reference's F.unfold/F.fold silently crop the token
    grid and zero-fill the border — verify the rebuild reproduces that
    end-to-end, not just on divisible shapes."""
    assert_close(*both_outputs(constants.ACT, in_hw=16,
                               porter=_port_act), rtol=5e-4)


def test_prosr():
    """Exact after two differential-test-found fixes: the pyramid
    upsampler's post-pixel-shuffle ReLU (ps_woReLU=False default) and
    REFLECTION padding on every 3x3 conv (the reference's custom
    Conv2d, network_prosr.py:41-86)."""
    assert_close(*both_outputs(constants.PROSR), rtol=1e-5)


def _port_omnisr(tp, fp):
    """OmniSR registration order differs from execution order at three
    levels: the top module registers residual_layer before the input
    conv (network_omni_sr.py:551-556), the attention submodules
    register rel_pos_bias/temperature out of call order, and ESA
    registers conv_f second while it is consumed fourth
    (network_omni_sr.py:96-100)."""
    import re
    TOP = {'input': 0, 'residual_layer': 1, 'output': 2, 'up': 3}
    LEAF = {'norm.weight': 0, 'norm.bias': 1,
            'fn.to_qkv.weight': 2, 'fn.rel_pos_bias.weight': 3,
            'fn.to_out.0.weight': 4,
            'fn.qkv.weight': 2, 'fn.qkv_dwconv.weight': 3,
            'fn.temperature': 4, 'fn.project_out.weight': 5}
    ESA = {'conv1': 0, 'conv2': 1, 'conv3': 2, 'conv_f': 3, 'conv4': 4}
    mod_first, mod_leaves, parsed = {}, {}, []
    for i, t in enumerate(tp):
        name = t[0]
        m = re.match(r'(.*layer\.\d+)\.(.*)$', name)
        mod, leaf = (m.group(1), m.group(2)) if m else (name, '')
        mod_first.setdefault(mod, i)
        mod_leaves.setdefault(mod, set()).add(leaf)
        parsed.append((name, mod, leaf, i))
    keys = []
    for name, mod, leaf, i in parsed:
        attn = ('fn.temperature' in mod_leaves[mod]
                or 'fn.rel_pos_bias.weight' in mod_leaves[mod])
        rank = LEAF.get(leaf, 100) if attn else 100
        em = re.match(r'.*\.esa\.(conv\w*)\.', name)
        if em:
            rank = ESA.get(em.group(1), 100)
        keys.append((TOP.get(name.split('.')[0], 9), mod_first[mod],
                     rank, i))
    tp = [t for _, t in sorted(zip(keys, tp), key=lambda e: e[0])]
    return port_state_dict(tp, fp)


def test_omnisr():
    """Exact after fixing the grid channel attention partition: the
    reference groups by WITHIN-WINDOW OFFSET with window indices as
    tokens (network_omni_sr.py:408), not the dilated spatial-grid
    partition."""
    assert_close(*both_outputs(constants.OMNISR, porter=_port_omnisr),
                 rtol=3e-4)


def test_csrcnn_unet():
    """CSR-CNN default sub-type: the DWDN-style UNet
    (network_unet2.py:80). Both sides consume the bicubic pre-upscaled
    input (model_plain.py:186), so outputs compare at input size.
    Found + fixed: Deconv k3/output_padding=1 (ours used k4)."""
    assert_close(*both_outputs(
        constants.CSRCNN, shrink={'csrcnn_in_planes': 1}), rtol=3e-5)


def test_csrcnn_pyramid():
    """CSR-CNN 'pyramid' sub-type: the X2 deconv net
    (network_deconv.py:78) on the raw LR."""
    assert_close(*both_outputs(
        constants.CSRCNN, shrink={'csrcnn_in_planes': 1,
                                  'csrcnn_net_type':
                                  constants.NET_TYPE_PYRAMID}),
        rtol=3e-5)


def test_csrcnn_snet():
    """CSR-CNN small grouped-conv variant (ConstrainedSupResCnn,
    network_csr_cnn.py:132) with reflect-padded k3 input conv. The
    reference's internal bicubic re-upscale of the already-upscaled
    input (the documented 'snet' double-upscale quirk, PARITY.md) is
    neutralized by setting upscale=1 so the conv-stack weights port
    verifiably; the quirk itself stays documented as a deliberate
    deviation."""
    assert_close(*both_outputs(
        constants.CSRCNN,
        shrink={'csrcnn_in_planes': 1,
                'csrcnn_net_type': 'snet_type3',
                'csrcnn_upscale': 1}), rtol=3e-5)


def test_csrcnn_snet_local_residual():
    """snet with use_local_residual=True exercises the per-layer
    match_sz 1x1 shortcut convs (network_csr_cnn.py:85-92)."""
    assert_close(*both_outputs(
        constants.CSRCNN,
        shrink={'csrcnn_in_planes': 1,
                'csrcnn_net_type': 'snet_type2',
                'csrcnn_upscale': 1,
                'csrcnn_use_local_residual': True}), rtol=3e-5)


def test_dsr_splines():
    """DSR-Splines via the stacked-layout porter (port_dsr_splines):
    the reference's per-knot _SplineNet modules
    (network_dsr_splines.py:102) stack onto this framework's vmapped
    (S,)-leading parameter bank. Found + fixed: zero (not reflect)
    padding on the k3 input conv."""
    assert_close(*both_outputs(
        constants.DSRSPLINES,
        shrink={'dsrsplines_in_planes': 1,
                'dsrsplines_n_splines_per_color': 4},
        porter=port_dsr_splines), rtol=3e-5)


def test_dsr_splines_residuals():
    """Residual variants: tanh head + global bicubic residual, and the
    per-layer match_sz shortcuts."""
    assert_close(*both_outputs(
        constants.DSRSPLINES,
        shrink={'dsrsplines_in_planes': 1,
                'dsrsplines_n_splines_per_color': 3,
                'dsrsplines_splinenet_type': 'snet_type2',
                'dsrsplines_use_global_residual': True,
                'dsrsplines_use_local_residual': True},
        porter=port_dsr_splines), rtol=3e-5)


def test_enlcn_stochastic_envelope():
    """ENLCN builds random kernel-feature projections
    (network_enlcn.py:73,102)."""
    fout, tout = both_outputs(constants.ENLCN,
                              overrides=MEAN_SHIFT_SKIP)
    assert fout.shape == tout.shape
    assert np.isfinite(fout).all()
    scale = np.abs(tout).max()
    assert np.abs(fout - tout).max() < 0.05 * scale + 1e-2
