"""Port reference (torch) state_dicts into this framework's flax
params — the bridge for differential parity tests and for loading the
reference's published pretrained weights.

Reference analog: the reference loads `{iter}_G.pth` state_dicts
directly (dlib/models/model_base.py:load_network); here the same
tensors are re-laid-out into flax conventions:

  torch Conv2d  weight (O, I, kh, kw) -> flax Conv   kernel (kh, kw, I, O)
  torch ConvT2d weight (I, O, kh, kw) -> flax ConvT  kernel (kh, kw, I, O)
  torch Linear  weight (O, I)         -> flax Dense  kernel (I, O)
  1-D tensors (biases, LN/BN scales, PReLU slopes)   -> unchanged
  2-D non-layer tensors (bias tables)                -> unchanged

Matching is ORDER-based: flax param dicts preserve module-creation
order (Python dict insertion order through init), and torch
`named_parameters()` yields registration order — for these
architectures (both sides built in the same construction sequence by
design) the sequences align 1:1. Every match is shape-checked after
re-layout, and the differential tests verify the ported forward
outputs agree, so a silent mis-pairing cannot survive.

KNOWN ORDER CONSTRAINT — DBPN: `nn.remat` lifting canonicalizes
(sorts) the flax param dict, and DBPN's many up/down projection
blocks share identical shapes, so porting into a remat-lifted DBPN
can mis-pair parameters WITHOUT tripping the shape check. Port DBPN
through `port_dbpn` (which enforces it), or init the model with
`remat_blocks=False` (models/dbpn.py) — the math is identical either
way; remat only changes activation memory.

Same constraint for MemNet's `remat_passes` (models/cnn_pre.py): the
lifted chain inserts a `Checkpoint_MemChain_0` level that sorts before
`Conv_0`, so order-based porting requires `memnet_remat_passes=False`
(in MemNet's case the shape check DOES catch a mis-pair — BN vectors
hit conv kernels — so a wrong port fails loudly rather than silently).
"""
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict


def _fits(t_shape: tuple, f_shape: tuple,
          kind: str = '') -> Optional[Callable]:
    """Returns the torch->flax relayout fn, or None if incompatible.

    2-D transposition takes priority over shape equality: a SQUARE
    torch Linear weight (O==I) has the same shape as the flax kernel
    but still needs the (O,I)->(I,O) transpose — matching by equality
    here silently ported square proj/mlp weights untransposed (caught
    by the SwinIR differential test). Square non-layer 2-D tables are
    the rare converse; use `overrides` for those."""
    convT = lambda a: a[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
    if kind == 'ConvTranspose2d' and len(t_shape) == 4:
        # torch convT weight is (I, O, kh, kw) and computes the conv
        # GRADIENT (kernel flipped relative to flax's fractionally-
        # strided conv): flip spatial dims on port (verified
        # empirically in tests/test_parity_torch.py). Kind is needed
        # because square channel counts are shape-ambiguous with Conv2d.
        i, o, kh, kw = t_shape
        return convT if f_shape == (kh, kw, i, o) else None
    if len(t_shape) == 2 and f_shape == t_shape[::-1]:   # Linear
        return lambda a: a.T
    if t_shape == f_shape:
        return lambda a: a
    if len(t_shape) == 4:
        o, i, kh, kw = t_shape
        if f_shape == (kh, kw, i, o):                    # Conv2d
            return lambda a: a.transpose(2, 3, 1, 0)
        if f_shape == (kh, kw, o, i):                    # ConvTranspose
            return convT
    if t_shape == (1,) and f_shape == ():                # PReLU slope
        return lambda a: a.reshape(())
    return None


def port_state_dict(torch_params: List[Tuple[str, np.ndarray]],
                    flax_params: Dict,
                    overrides: Optional[Dict[str, str]] = None,
                    strict: bool = True) -> Dict:
    """Map an ordered [(torch_name, array)] list onto a flax params
    tree of identical parameter sequence. Returns the new tree.

    overrides: {torch_name: 'skip'} drops a torch entry (e.g. buffers
    the flax side computes at trace time)."""
    overrides = overrides or {}
    tp = [t[:3] if len(t) > 2 else (t[0], t[1], '')
          for t in torch_params if overrides.get(t[0]) != 'skip']
    flat = flatten_dict(flax_params)
    keys = list(flat.keys())
    if strict and len(tp) != len(keys):
        tnames = [n for n, _, _ in tp]
        raise ValueError(
            f'param count mismatch: torch {len(tp)} vs flax '
            f'{len(keys)}\ntorch: {tnames}\nflax: '
            f'{["/".join(k) for k in keys]}')
    out = {}
    for (tname, arr, kind), fkey in zip(tp, keys):
        relayout = _fits(tuple(arr.shape), tuple(flat[fkey].shape),
                         kind)
        if relayout is None:
            raise ValueError(
                f'shape mismatch {tname} {tuple(arr.shape)} -> '
                f'{"/".join(fkey)} {tuple(flat[fkey].shape)}')
        out[fkey] = jnp.asarray(
            relayout(np.asarray(arr)), flat[fkey].dtype)
    return unflatten_dict(out)


def port_dsr_splines(torch_params: List[Tuple[str, np.ndarray]],
                     flax_params: Dict) -> Dict:
    """Stacked-layout port for DSR-Splines: the reference builds one
    small _SplineNet module PER knot interval
    (network_dsr_splines.py:102, `splines.{s}.model.{l}.conv.*`) while
    this framework runs all S branches as ONE vmapped network whose
    every kernel carries a leading (S,) axis (models/dsr_splines.py).
    Same transpose+stack approach as port_swinir: for each flax leaf
    (in creation order, which matches the per-spline torch
    registration order), relayout the S per-spline torch tensors and
    stack them along the new leading axis."""
    arrs = {n: np.asarray(a) for n, a, *_ in torch_params}
    n_s = 1 + max(int(n.split('.')[1]) for n in arrs
                  if n.startswith('splines.'))
    # flax Conv_{i} indices follow execution order, which matches the
    # torch registration order of spline 0's conv modules — but the
    # vmap lift canonicalizes (sorts) the param dict, so match by
    # NAME, not position.
    mods = []
    for n, _a, *_k in torch_params:
        if n.startswith('splines.0.'):
            mod = n[len('splines.0.'):].rsplit('.', 1)[0]
            if mod not in mods:
                mods.append(mod)
    conv_of = {f'Conv_{i}': m for i, m in enumerate(mods)}
    leaf_of = {'kernel': 'weight', 'bias': 'bias'}
    flat = flatten_dict(flax_params)
    if len(flat) != len(mods) * 2:
        raise ValueError(
            f'param count mismatch: torch per-spline {len(mods)} convs '
            f'vs flax {len(flat)} leaves\n{mods}\n'
            f'{["/".join(k) for k in flat]}')
    out = {}
    for key in flat:
        mod = conv_of[key[-2]]
        suffix = f'{mod}.{leaf_of[key[-1]]}'
        want = tuple(flat[key].shape[1:])
        stack = []
        for s in range(n_s):
            a = arrs[f'splines.{s}.{suffix}']
            fn = _fits(tuple(a.shape), want)
            if fn is None:
                raise ValueError(
                    f'shape mismatch splines.{s}.{suffix} '
                    f'{tuple(a.shape)} -> {"/".join(key)} (S,){want}')
            stack.append(fn(a))
        out[key] = jnp.asarray(np.stack(stack), flat[key].dtype)
    return unflatten_dict(out)


def port_dbpn(torch_params: List[Tuple[str, np.ndarray]],
              flax_params: Dict, remat_blocks: bool) -> Dict:
    """Order-based DBPN port with the remat guard (see module
    docstring): the caller passes the model's `remat_blocks` setting
    explicitly so a default-config (remat=True) tree cannot be ported
    silently."""
    if remat_blocks:
        raise ValueError(
            'DBPN port requires remat_blocks=False: the remat lift '
            'sorts the param dict and DBPN\'s identically-shaped '
            'blocks would silently mis-pair under the creation-order '
            'zip (see torch_port.py module docstring).')
    return port_state_dict(torch_params, flax_params)


def torch_named_params(module) -> List[Tuple[str, np.ndarray, str]]:
    """Ordered [(name, numpy array, owner-module class name)] of a
    torch module's parameters; the kind disambiguates shape-ambiguous
    relayouts (square ConvTranspose2d vs Conv2d)."""
    kinds = {}
    for mname, m in module.named_modules():
        for pname, _ in m.named_parameters(recurse=False):
            full = f'{mname}.{pname}' if mname else pname
            kinds[full] = type(m).__name__
    return [(n, p.detach().cpu().numpy(), kinds.get(n, ''))
            for n, p in module.named_parameters()]


_SWIN_LEAF_OF = {
    'norm1.weight': 'ln1_scale', 'norm1.bias': 'ln1_bias',
    'attn.relative_position_bias_table': 'rel_pos_table',
    'attn.qkv.weight': 'qkv_kernel', 'attn.qkv.bias': 'qkv_bias',
    'attn.proj.weight': 'proj_kernel', 'attn.proj.bias': 'proj_bias',
    'norm2.weight': 'ln2_scale', 'norm2.bias': 'ln2_bias',
    'mlp.fc1.weight': 'mlp1_kernel', 'mlp.fc1.bias': 'mlp1_bias',
    'mlp.fc2.weight': 'mlp2_kernel', 'mlp.fc2.bias': 'mlp2_bias',
}
_SWIN_TORCH_OF = {v: k for k, v in _SWIN_LEAF_OF.items()}


def port_swinir(torch_params: List[Tuple[str, np.ndarray]],
                flax_params: Dict) -> Dict:
    """Name-based port of a reference SwinIR state_dict into this
    framework's SwinIR with fused_blocks=True (the production layout:
    lax.scan over uniform stages stacks stage params with a leading
    stage dim; FusedBlockStack stacks block params over depth).

    Reference names (network_swinir.py:710): conv_first,
    patch_embed.norm, layers.{s}.conv,
    layers.{s}.residual_group.blocks.{b}.<leaf>, norm, conv_after_body,
    conv_before_upsample.0, upsample.{2i}, conv_last."""
    import re
    tp = {t[0]: np.asarray(t[1]) for t in torch_params}
    flat = flatten_dict(flax_params)
    out = {}

    def relayout(arr, want):
        fn = _fits(tuple(arr.shape), tuple(want))
        if fn is None:
            raise ValueError((arr.shape, want))
        return fn(arr)

    def stacked(key, names_nd):
        """names_nd: nested list matching the leading stack dims."""
        want_leaf = flat[key].shape[len(np.shape(names_nd)):]

        def build(n):
            if isinstance(n, str):
                return relayout(tp.pop(n), want_leaf)
            return np.stack([build(x) for x in n])
        out[key] = jnp.asarray(build(names_nd), flat[key].dtype)

    # infer stage/depth structure from the torch names
    stages = sorted({int(m.group(1)) for n in tp
                     if (m := re.match(r'layers\.(\d+)\.', n))})
    depth = {s: 1 + max(int(m.group(1)) for n in tp
                        if (m := re.search(
                            rf'layers\.{s}\.residual_group\.blocks'
                            rf'\.(\d+)\.', n)))
             for s in stages}

    for key in flat.keys():
        ks = '/'.join(key)
        leaf = key[-1]
        wb = 'weight' if leaf in ('kernel', 'scale') else 'bias'
        if ks.startswith('conv_first/'):
            stacked(key, f'conv_first.{wb}')
        elif ks.startswith('patch_norm/'):
            stacked(key, f'patch_embed.norm.{wb}')
        elif ks.startswith('LayerNorm_0/'):
            stacked(key, f'norm.{wb}')
        elif ks.startswith('conv_after_body/'):
            stacked(key, f'conv_after_body.{wb}')
        elif ks.startswith('conv_before_up/'):
            stacked(key, f'conv_before_upsample.0.{wb}')
        elif ks.startswith('conv_last/'):
            stacked(key, f'conv_last.{wb}')
        elif ks.startswith('UpsamplerDirect_0/'):
            stacked(key, f'upsample.0.{wb}')
        elif ks.startswith('Upsampler_0/'):
            i = int(re.search(r'Conv_(\d+)', ks).group(1))
            stacked(key, f'upsample.{2 * i}.{wb}')
        elif 'blocks' in key and leaf in _SWIN_TORCH_OF:
            tleaf = _SWIN_TORCH_OF[leaf]
            if key[0] == 'stages':      # (S, d, ...) double stack
                names = [[f'layers.{s}.residual_group.blocks.{b}.'
                          f'{tleaf}' for b in range(depth[s])]
                         for s in stages]
            else:                        # rstb{s}: (d, ...) stack
                s0 = int(re.match(r'rstb(\d+)', key[0]).group(1))
                names = [f'layers.{s0}.residual_group.blocks.{b}.'
                         f'{tleaf}' for b in range(depth[s0])]
            stacked(key, names)
        elif key[0] == 'stages' and 'Conv' in ks:
            names = [f'layers.{s}.conv.{wb}' for s in stages]
            stacked(key, names)
        elif re.match(r'rstb\d+$', key[0]):
            s0 = int(re.match(r'rstb(\d+)', key[0]).group(1))
            stacked(key, f'layers.{s0}.conv.{wb}')
        else:
            raise KeyError(f'unmapped flax param {ks}')
    if tp:
        raise ValueError(f'unconsumed torch params: {sorted(tp)}')
    return unflatten_dict(out)


_GRL_PLAIN = {
    'conv_first/Conv_0': 'conv_first',
    'norm_start': 'norm_start',
    'norm_end': 'norm_end',
    'conv_after_body/Conv_0': 'conv_after_body',
    'conv_before_up/Conv_0': 'conv_before_upsample.0',
    'Upsampler_0/Conv_0/Conv_0': 'upsample.up.0',
    'conv_last/Conv_0': 'conv_last',
}
_GRL_BLOCK = {
    'CAB_0/Conv_0/Conv_0': 'conv.cab.0',
    'CAB_0/Conv_1/Conv_0': 'conv.cab.2',
    'CAB_0/Conv_2/Conv_0': 'conv.cab.3.attention.1',
    'CAB_0/Conv_3/Conv_0': 'conv.cab.3.attention.3',
    'LayerNorm_0': 'norm1',
    'LayerNorm_1': 'norm2',
    'Dense_0': 'mlp.fc1',
    'Dense_1': 'mlp.fc2',
    'MixedAttention_0/qkv': 'attn.qkv.body',
    'MixedAttention_0/anchor_proj': 'attn.anchor.body.0.reduction',
    'MixedAttention_0/proj': 'attn.proj',
    'MixedAttention_0/affine_w/cpb1':
        'attn.window_attn.attn_transform.cpb_mlp.0',
    'MixedAttention_0/affine_w/cpb2':
        'attn.window_attn.attn_transform.cpb_mlp.2',
    'MixedAttention_0/affine_w/logit_scale':
        'attn.window_attn.attn_transform.logit_scale',
    'MixedAttention_0/affine_s1/cpb1':
        'attn.stripe_attn.attn_transform1.cpb_mlp.0',
    'MixedAttention_0/affine_s1/cpb2':
        'attn.stripe_attn.attn_transform1.cpb_mlp.2',
    'MixedAttention_0/affine_s1/logit_scale':
        'attn.stripe_attn.attn_transform1.logit_scale',
    'MixedAttention_0/affine_s2/cpb1':
        'attn.stripe_attn.attn_transform2.cpb_mlp.0',
    'MixedAttention_0/affine_s2/cpb2':
        'attn.stripe_attn.attn_transform2.cpb_mlp.2',
    'MixedAttention_0/affine_s2/logit_scale':
        'attn.stripe_attn.attn_transform2.logit_scale',
}
_WB = {'kernel': 'weight', 'scale': 'weight', 'bias': 'bias',
       'logit_scale': ''}


def port_grl(torch_params: List[Tuple[str, np.ndarray]],
             flax_params: Dict) -> Dict:
    """Name-based port of a reference GRL state_dict onto this
    framework's GRL (blocks scanned as (no-shift, shift) pairs with a
    leading pair dim: torch layers.{s}.blocks.{b} maps to
    s{s}_blocks/GRLBlock_{b%2} at stack index b//2). Reference names:
    network_grl.py:1203 (GRL), :1008 (block), :1094 (stage convs)."""
    import re
    tp = {t[0]: np.asarray(t[1]) for t in torch_params}
    flat = flatten_dict(flax_params)
    out = {}

    def relayout(arr, want):
        fn = _fits(tuple(arr.shape), tuple(want))
        if fn is None:
            raise ValueError((arr.shape, want))
        return fn(arr)

    for key in flat.keys():
        ks = '/'.join(key)
        leaf = key[-1]
        m = re.match(r's(\d+)_blocks/GRLBlock_(\d+)/(.*)$', ks)
        if m:
            s_i, member, rest = int(m.group(1)), int(m.group(2)), \
                m.group(3)
            if rest.endswith('/logit_scale') or rest == \
                    'MixedAttention_0/affine_w/logit_scale' or \
                    leaf == 'logit_scale':
                mod, suffix = rest, ''
            else:
                mod, suffix = rest.rsplit('/', 1), None
                mod, suffix = mod[0], '.' + _WB[leaf]
            tleaf = _GRL_BLOCK[mod] + (suffix or '')
            n_pairs = flat[key].shape[0]
            arrs = []
            for p_i in range(n_pairs):
                b = p_i * 2 + member
                tname = f'layers.{s_i}.blocks.{b}.{tleaf}'
                arrs.append(relayout(tp.pop(tname),
                                     flat[key].shape[1:]))
            out[key] = jnp.asarray(np.stack(arrs), flat[key].dtype)
            continue
        m = re.match(r's(\d+)_conv/Conv_0/(kernel|bias)$', ks)
        if m:
            tname = f'layers.{m.group(1)}.conv.' + _WB[m.group(2)]
            out[key] = jnp.asarray(relayout(tp.pop(tname),
                                            flat[key].shape),
                                   flat[key].dtype)
            continue
        mod = ks.rsplit('/', 1)[0]
        if mod in _GRL_PLAIN or key[0] in _GRL_PLAIN:
            base = _GRL_PLAIN.get(mod, _GRL_PLAIN.get(key[0]))
            tname = f'{base}.{_WB[leaf]}'
            out[key] = jnp.asarray(relayout(tp.pop(tname),
                                            flat[key].shape),
                                   flat[key].dtype)
            continue
        raise KeyError(f'unmapped flax param {ks}')
    if tp:
        raise ValueError(f'unconsumed torch params: {sorted(tp)[:8]} '
                         f'(+{max(0, len(tp) - 8)} more)')
    return unflatten_dict(out)
