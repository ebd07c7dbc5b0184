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
"""
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict


def _fits(t_shape: tuple, f_shape: tuple) -> Optional[Callable]:
    """Returns the torch->flax relayout fn, or None if incompatible."""
    if t_shape == f_shape:
        return lambda a: a
    if len(t_shape) == 4:
        o, i, kh, kw = t_shape
        if f_shape == (kh, kw, i, o):                    # Conv2d
            return lambda a: a.transpose(2, 3, 1, 0)
        if f_shape == (kh, kw, o, i):                    # ConvTranspose
            return lambda a: a.transpose(2, 3, 0, 1)
    if len(t_shape) == 2 and f_shape == t_shape[::-1]:   # Linear
        return lambda a: a.T
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
    tp = [(n, a) for n, a in torch_params
          if overrides.get(n) != 'skip']
    flat = flatten_dict(flax_params)
    keys = list(flat.keys())
    if strict and len(tp) != len(keys):
        tnames = [n for n, _ in tp]
        raise ValueError(
            f'param count mismatch: torch {len(tp)} vs flax '
            f'{len(keys)}\ntorch: {tnames}\nflax: '
            f'{["/".join(k) for k in keys]}')
    out = {}
    for (tname, arr), fkey in zip(tp, keys):
        relayout = _fits(tuple(arr.shape), tuple(flat[fkey].shape))
        if relayout is None:
            raise ValueError(
                f'shape mismatch {tname} {tuple(arr.shape)} -> '
                f'{"/".join(fkey)} {tuple(flat[fkey].shape)}')
        out[fkey] = jnp.asarray(
            relayout(np.asarray(arr)), flat[fkey].dtype)
    return unflatten_dict(out)


def torch_named_params(module) -> List[Tuple[str, np.ndarray]]:
    """Ordered [(name, numpy array)] of a torch module's parameters."""
    return [(n, p.detach().cpu().numpy())
            for n, p in module.named_parameters()]


def port_swin_fused(torch_params: List[Tuple[str, np.ndarray]],
                    flax_params: Dict) -> Dict:
    """SwinIR with fused_blocks=True: the FusedBlockStack stores each
    RSTB's block params as depth-stacked arrays. Torch per-block params
    named '...layers.{s}.residual_group.blocks.{b}.<leaf>' are stacked
    over b into the stack leaves; everything else ports in order."""
    flat = flatten_dict(flax_params)
    # split flax keys into stacked-block leaves and plain leaves
    blocks = {}           # (stage_path, leaf) -> key
    plain_keys = []
    for k in flat:
        if 'blocks' in k and k[-1] in (
                'ln1_scale', 'ln1_bias', 'qkv_kernel', 'qkv_bias',
                'rel_pos_table', 'proj_kernel', 'proj_bias',
                'ln2_scale', 'ln2_bias', 'mlp1_kernel', 'mlp1_bias',
                'mlp2_kernel', 'mlp2_bias'):
            blocks[k] = []
        else:
            plain_keys.append(k)

    leaf_of = {
        'norm1.weight': 'ln1_scale', 'norm1.bias': 'ln1_bias',
        'attn.relative_position_bias_table': 'rel_pos_table',
        'attn.qkv.weight': 'qkv_kernel', 'attn.qkv.bias': 'qkv_bias',
        'attn.proj.weight': 'proj_kernel',
        'attn.proj.bias': 'proj_bias',
        'norm2.weight': 'ln2_scale', 'norm2.bias': 'ln2_bias',
        'mlp.fc1.weight': 'mlp1_kernel', 'mlp.fc1.bias': 'mlp1_bias',
        'mlp.fc2.weight': 'mlp2_kernel', 'mlp.fc2.bias': 'mlp2_bias',
    }
    import re
    plain_torch = []
    stacked = {}          # (stage, leaf) -> {block_idx: arr}
    for name, arr in torch_params:
        m = re.search(r'layers\.(\d+)\.residual_group\.blocks\.(\d+)\.'
                      r'(.+)$', name)
        if m and m.group(3) in leaf_of:
            s, b, leaf = int(m.group(1)), int(m.group(2)), \
                leaf_of[m.group(3)]
            stacked.setdefault((s, leaf), {})[b] = arr
        else:
            plain_torch.append((name, arr))

    out = {}
    # plain params: order-based
    sub = port_state_dict(plain_torch,
                          unflatten_dict({k: flat[k]
                                          for k in plain_keys}))
    out.update(flatten_dict(sub))

    # stacked block params: keyed by stage order in the flax tree
    stage_keys = sorted({k[:-1] for k in blocks})
    assert len(stage_keys) == len({s for s, _ in stacked}), \
        (stage_keys, sorted({s for s, _ in stacked}))
    for si, sk in enumerate(sorted(stage_keys)):
        for leaf in ('ln1_scale', 'ln1_bias', 'qkv_kernel', 'qkv_bias',
                     'rel_pos_table', 'proj_kernel', 'proj_bias',
                     'ln2_scale', 'ln2_bias', 'mlp1_kernel',
                     'mlp1_bias', 'mlp2_kernel', 'mlp2_bias'):
            key = sk + (leaf,)
            if key not in flat:
                raise KeyError(key)
            per_block = stacked[(si, leaf)]
            arrs = [per_block[b] for b in sorted(per_block)]
            want = tuple(flat[key].shape[1:])
            relayout = _fits(tuple(arrs[0].shape), want)
            if relayout is None:
                raise ValueError((leaf, arrs[0].shape, want))
            out[key] = jnp.asarray(
                np.stack([relayout(a) for a in arrs]),
                flat[key].dtype)
    return unflatten_dict(out)
