"""Pallas TPU kernel: fused windowed multi-head self-attention.

The SwinIR hot op (WindowAttention, models/swinir.py): per 8x8 window,
qkv -> scaled cosine/dot attention + relative-position bias (+ shift
mask) -> out. The XLA path materializes the (B*nW, H, N, N) attention
tensor in HBM between fused regions; this kernel keeps the whole
window-attention computation in VMEM, processing BLK windows per grid
step so the MXU sees (BLK*N, d) matmuls instead of N=64-row slivers.

Forward-only (eval/serving path); training uses the XLA path where
autodiff is free. Enable per-model with use_pallas_attn=True.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wmsa_kernel(qkv_ref, bias_ref, mask_ref, out_ref, *, heads: int,
                 scale: float, with_mask: bool):
    # qkv_ref: (BLK, N, 3C); bias_ref: (heads, N, N);
    # mask_ref: (BLK, N, N) additive; out_ref: (BLK, N, C)
    blk, n, c3 = qkv_ref.shape
    c = c3 // 3
    hd = c // heads

    qkv = qkv_ref[:].astype(jnp.float32)
    q = qkv[:, :, :c].reshape(blk, n, heads, hd).transpose(0, 2, 1, 3)
    k = qkv[:, :, c:2 * c].reshape(blk, n, heads,
                                   hd).transpose(0, 2, 1, 3)
    v = qkv[:, :, 2 * c:].reshape(blk, n, heads, hd).transpose(0, 2, 1, 3)

    attn = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)          # (blk, h, n, n)
    attn = attn + bias_ref[:].astype(jnp.float32)[None]
    if with_mask:
        attn = attn + mask_ref[:].astype(jnp.float32)[:, None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn, v,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)          # (blk, h, n, hd)
    out = out.transpose(0, 2, 1, 3).reshape(blk, n, c)
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('heads', 'block_windows',
                                             'interpret'))
def window_attention_pallas(qkv: jax.Array, bias: jax.Array,
                            mask: jax.Array = None, *, heads: int,
                            block_windows: int = 16,
                            interpret: bool = False) -> jax.Array:
    """qkv: (W, N, 3C) for W windows of N tokens; bias: (heads, N, N);
    mask: (W, N, N) additive or None. Returns (W, N, C)."""
    w, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    scale = hd ** -0.5
    blk = min(block_windows, w)
    # pad W to a multiple of blk
    pad = (-w) % blk
    if pad:
        qkv = jnp.concatenate(
            [qkv, jnp.zeros((pad, n, c3), qkv.dtype)], 0)
        if mask is not None:
            mask = jnp.concatenate(
                [mask, jnp.zeros((pad, n, n), mask.dtype)], 0)
    wp = qkv.shape[0]
    with_mask = mask is not None
    if mask is None:
        mask = jnp.zeros((wp, 1, 1), qkv.dtype)  # dummy

    grid = (wp // blk,)
    out = pl.pallas_call(
        functools.partial(_wmsa_kernel, heads=heads, scale=scale,
                          with_mask=with_mask),
        out_shape=jax.ShapeDtypeStruct((wp, n, c), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, n, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n, n) if with_mask else (blk, 1, 1),
                         lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv, bias, mask)
    return out[:w]


def window_attention_reference(qkv, bias, mask, heads):
    """jnp reference (mirrors models/swinir.WindowAttention math)."""
    w, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    t = qkv.reshape(w, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = t[0], t[1], t[2]
    attn = jnp.einsum('bhnd,bhmd->bhnm', q * hd ** -0.5, k)
    attn = attn + bias[None]
    if mask is not None:
        attn = attn + mask[:, None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
    return out.transpose(0, 2, 1, 3).reshape(w, n, c)
