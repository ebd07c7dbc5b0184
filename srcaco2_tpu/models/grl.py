"""GRL: global-regional-local image restoration transformer.

Capability parity with the reference benchmark config
(network_grl.py:1113; defaults from utils_init_default_args.py:168 —
window 8, stripes [8,8] w/ anchor down-factor 2, qkv/out 'linear',
anchor 'avgpool', local_connection=True, pixelshuffle upsampler):

  * EfficientMixAttnTransformerBlock (:915): POST-norm residuals
    x + norm1(mixed_attn(x)) + CAB(x), x + norm2(mlp(x));
  * MixedAttention (:790): channels split half/half between shifted
    window attention (shift on even blocks) and anchor stripe attention
    (H stripes on even, W stripes on odd blocks);
  * cosine attention with learned clamped logit scale and continuous
    position bias (CPB MLP -> 16*sigmoid), SwinV2-style (AffineTransform
    :248);
  * anchor stripe attention (:402): anchors = avgpooled tokens
    (down-factor 2); two-stage attention anchor->window then
    window->anchor;
  * per-stage conv + residual; pixelshuffle tail.

All bias tables / position indices / shift masks are computed at trace
time as numpy constants — static shapes per (train patch, eval image)
resolution, no data-dependent control flow.
"""
import functools
import math
import os
from typing import Any, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu import constants
from srcaco2_tpu.models.blocks import (Conv, Upsampler, UpsamplerDirect,
                                       nchw_to_nhwc, nhwc_to_nchw)

Dtype = Any


def _ablate() -> frozenset:
    """Measurement-only component ablations (SRCACO2_GRL_ABLATE, comma
    separated) for scripts/grl_component_probe.py: each token replaces
    one component with a shape-preserving identity so an in-process A/B
    prices its step-time share (the kernel-or-refusal decision for the
    small-token attention class, docs/BENCH_ANALYSIS.md). Never set in
    production; tokens: win (window-attention math -> v), stripe
    (both anchor-stripe stages -> v), anchor (skip avgpool+anchor
    projection), cpb (skip CPB bias + logit scale), cosnorm (skip q/k
    cosine normalization), cab (local-connection conv branch), mlp."""
    return frozenset(
        x for x in os.environ.get('SRCACO2_GRL_ABLATE', '').split(',')
        if x)


def _merged() -> bool:
    """Merged-attention path toggle (SRCACO2_GRL_MERGED): rewrite the
    per-window / per-stripe attention einsums as FULL attention over
    2ws x 2ws token tiles with the learned CPB bias expanded
    block-diagonally and -100 additive masking off-block — the same
    more-MACs-for-fewer-bigger-ops trade the fused SwinIR kernel made
    (docs/BENCH_ANALYSIS.md), at the XLA level. Numerically equal to
    the windowed path up to e^-100 softmax leakage (~1e-43 relative,
    tested to 1e-5 in tests/test_grl_merged.py). Applies only at
    configs whose window/stripe geometry tiles evenly (the benchmark
    config does); anything else falls back to the windowed path."""
    return os.environ.get('SRCACO2_GRL_MERGED', '1') != '0'


# ------------------------------------------------------- trace-time tables
def _mesh_coords(hw) -> np.ndarray:
    ch, cw = np.meshgrid(np.arange(hw[0]), np.arange(hw[1]),
                         indexing='ij')
    return np.stack([ch.ravel(), cw.ravel()])       # 2, N


@functools.lru_cache(maxsize=64)
def rel_index(ws: Tuple[int, int], df: int = 1,
              window_to_anchor: bool = True) -> np.ndarray:
    """Pairwise relative-position index into the CPB table
    (get_relative_position_index_simple)."""
    aws = (ws[0] // df, ws[1] // df)
    c_w = _mesh_coords(ws)
    c_a = _mesh_coords(aws)
    max_h_diff = aws[1] + ws[1] - 1
    if window_to_anchor:
        d = c_w[:, :, None] - c_a[:, None, :]
        off = (aws[0] - 1, aws[1] - 1)
    else:
        d = c_a[:, :, None] - c_w[:, None, :]
        off = (ws[0] - 1, ws[1] - 1)
    d = d.transpose(1, 2, 0).astype(np.int64)
    d[:, :, 0] += off[0]
    d[:, :, 1] += off[1]
    d[:, :, 0] *= max_h_diff
    return d.sum(-1)


@functools.lru_cache(maxsize=64)
def coords_table(ws: Tuple[int, int], df: int = 1) -> np.ndarray:
    """Continuous relative-coordinate table for the CPB MLP
    (get_relative_coords_table_all)."""
    aws = (ws[0] // df, ws[1] // df)
    ts_p = [w1 - 1 - (w1 - w2) // 2 for w1, w2 in zip(ws, aws)]
    ts_n = [-(w2 - 1) - (w1 - w2) // 2 for w1, w2 in zip(ws, aws)]
    ch = np.arange(ts_n[0], ts_p[0] + 1, dtype=np.float64)
    cw = np.arange(ts_n[1], ts_p[1] + 1, dtype=np.float64)
    t = np.stack(np.meshgrid(ch, cw, indexing='ij'), axis=-1)
    t[..., 0] /= max(ts_p[0], 1)
    t[..., 1] /= max(ts_p[1], 1)
    t *= 8.0
    t = np.sign(t) * np.log2(np.abs(t) + 1.0) / np.log2(8)
    return t.reshape(-1, 2).astype(np.float32)


def _fill_window(res, ws, ss) -> np.ndarray:
    m = np.zeros((1, res[0], res[1], 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws[0]), slice(-ws[0], -ss[0]),
               slice(-ss[0], None)):
        for wsl in (slice(0, -ws[1]), slice(-ws[1], -ss[1]),
                    slice(-ss[1], None)):
            m[:, hs, wsl, :] = cnt
            cnt += 1
    mw = m.reshape(1, res[0] // ws[0], ws[0], res[1] // ws[1], ws[1])
    mw = mw.transpose(0, 1, 3, 2, 4).reshape(-1, ws[0] * ws[1])
    return mw


@functools.lru_cache(maxsize=64)
def shift_mask(res: Tuple[int, int], ws: Tuple[int, int],
               ss: Tuple[int, int]) -> np.ndarray:
    mw = _fill_window(res, ws, ss)
    d = mw[:, None, :] - mw[:, :, None]
    return np.where(d != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _win_order_perm(tile: int, ws: int) -> np.ndarray:
    """Permutation taking raster token order (tile*tile) to
    window-contiguous order (ws x ws windows, row-major)."""
    idx = np.arange(tile * tile).reshape(tile, tile)
    return idx.reshape(tile // ws, ws, tile // ws, ws) \
        .transpose(0, 2, 1, 3).reshape(-1)


@functools.lru_cache(maxsize=16)
def _inv_perm(tile: int, ws: int) -> np.ndarray:
    p = _win_order_perm(tile, ws)
    inv = np.empty_like(p)
    inv[p] = np.arange(p.size)
    return inv


@functools.lru_cache(maxsize=16)
def _merged_offblock(nb: int, n1: int, n2: int) -> np.ndarray:
    """(nb*n1, nb*n2) additive mask: 0 on the diagonal blocks, -100
    elsewhere (e^-100 ~ 4e-44: off-block probability mass is zero at
    f32, matching per-window softmax to ~1e-40 relative)."""
    m = np.full((nb, n1, nb, n2), -100.0, np.float32)
    for i in range(nb):
        m[i, :, i, :] = 0.0
    return m.reshape(nb * n1, nb * n2)


@functools.lru_cache(maxsize=16)
def _merged_shift_masks(res: Tuple[int, int], tile: int, ws: int,
                        shift: int) -> np.ndarray:
    """Per-tile additive masks for the merged shifted-window path:
    (n_tiles, tile^2, tile^2), each the block-diagonal of its tile's
    per-window shift masks (+ -100 off-block). Tiles are raster-major
    over the (res/tile) grid, windows raster-major within a tile —
    matching win_part + _win_order_perm composition."""
    h, w = res
    base = shift_mask(res, (ws, ws), (shift, shift))  # (nw_img, n, n)
    n = ws * ws
    nwr = w // ws                      # windows per image row
    r = tile // ws                     # windows per tile side
    nb = r * r
    th, tw = h // tile, w // tile
    out = np.full((th * tw, nb * n, nb * n), -100.0, np.float32)
    for ti in range(th):
        for tj in range(tw):
            t = ti * tw + tj
            for bi in range(r):
                for bj in range(r):
                    wi = (ti * r + bi) * nwr + (tj * r + bj)
                    b = bi * r + bj
                    out[t, b * n:(b + 1) * n, b * n:(b + 1) * n] = \
                        base[wi]
    return out


def win_part(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws[0], ws[0], w // ws[1], ws[1], c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws[0] * ws[1], c)


def win_rev(x, ws, h, w):
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws[0]) * (w // ws[1]))
    x = x.reshape(b, h // ws[0], w // ws[1], ws[0], ws[1], c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


# --------------------------------------------------------------- modules
class AffineTransform(nn.Module):
    """Cosine-attention scaling + continuous position bias + mask."""
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, attn, table: np.ndarray, index: np.ndarray,
                 mask: np.ndarray = None, merge=None):
        if 'cpb' in _ablate():      # measurement-only (see _ablate)
            return attn
        logit_scale = self.param(
            'logit_scale',
            lambda k, s: jnp.log(10.0) * jnp.ones(s, jnp.float32),
            (self.num_heads, 1, 1))
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(1.0 / 0.01)))
        attn = attn * scale.astype(attn.dtype)
        # CPB MLP: 2 -> 512 -> heads
        t = jnp.asarray(table)
        h = nn.Dense(512, dtype=self.dtype, name='cpb1')(t)
        h = nn.relu(h)
        h = nn.Dense(self.num_heads, use_bias=False, dtype=self.dtype,
                     name='cpb2')(h)
        n1, n2 = index.shape
        bias = h[jnp.asarray(index.reshape(-1))]
        bias = bias.reshape(n1, n2, self.num_heads).transpose(2, 0, 1)
        bias = 16.0 * nn.sigmoid(bias)
        if merge is not None:
            # merged tile path (_merged): expand the per-window bias
            # block-diagonally to the tile token count and add the
            # static off-block / shift mask. Same params, same math —
            # the per-window softmax becomes one tile-wide softmax
            # whose off-block logits sit at -100.
            nb, static = merge
            eye = jnp.asarray(np.eye(nb, dtype=np.float32))
            big = jnp.einsum('wv,hab->hwavb', eye, bias) \
                .reshape(self.num_heads, nb * n1, nb * n2)
            attn = attn + big.astype(attn.dtype)[None]
            nt = static.shape[0]
            m = jnp.asarray(static)[None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, nt, *attn.shape[1:]) + m
            return attn.reshape(-1, *attn.shape[2:])
        attn = attn + bias.astype(attn.dtype)[None]
        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask)[None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, nw, *attn.shape[1:]) + m
            attn = attn.reshape(-1, *attn.shape[2:])
        return attn


def _cosine_attn(q, k, v, transform, table, index, mask, merge=None):
    if 'cosnorm' in _ablate():      # measurement-only (see _ablate)
        qn, kn = q, k
    else:
        qn = q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
        kn = k / jnp.sqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
    attn = jnp.einsum('bhnd,bhmd->bhnm', qn, kn)
    attn = transform(attn, table, index, mask, merge=merge)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum('bhnm,bhmd->bhnd', attn, v)


class MixedAttention(nn.Module):
    dim: int
    num_heads_w: int
    num_heads_s: int
    window_size: int
    window_shift: bool
    stripe_size: Tuple[int, int]
    stripe_type: str                  # 'H' or 'W'
    df: int                           # anchor window down factor
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        qkv = nn.Dense(3 * c, dtype=self.dtype, name='qkv')(x)
        qkv_w, qkv_s = jnp.split(qkv, 2, axis=-1)   # each 3*C/2

        ws = (self.window_size, self.window_size)
        shift = self.window_size // 2 if self.window_shift else 0
        ss = tuple(self.stripe_size if self.stripe_type == 'H'
                   else self.stripe_size[::-1])
        wsz = self.window_size
        T = 2 * wsz
        _abl = _ablate()            # measurement-only (see _ablate)
        # merged tile path applies when window and stripe geometry
        # tile evenly into 2ws x 2ws token tiles (the benchmark
        # config: window 8, stripes (8,8), df 2); see _merged().
        mergeable = (_merged() and not _abl
                     and ss == (wsz, wsz)
                     and wsz % self.df == 0
                     and h % T == 0 and w % T == 0)

        n = ws[0] * ws[1]
        hw_heads = self.num_heads_w
        hd = (c // 2) // hw_heads
        if mergeable:
            # ------------ window half, merged over 2ws tiles ------------
            yw = qkv_w
            if shift:
                yw = jnp.roll(yw, (-shift, -shift), axis=(1, 2))
            toks = win_part(yw, (T, T))           # (B*nt, T*T, 3c/2)
            perm = jnp.asarray(_win_order_perm(T, wsz))
            inv = jnp.asarray(_inv_perm(T, wsz))
            toks = toks[:, perm, :]
            tt = T * T
            nb = (T // wsz) ** 2
            t3 = toks.reshape(-1, tt, 3, hw_heads,
                              hd).transpose(2, 0, 3, 1, 4)
            q, k, v = t3[0], t3[1], t3[2]
            if shift:
                static = _merged_shift_masks((h, w), T, wsz, shift)
            else:
                static = _merged_offblock(nb, n, n)[None]
            out_w = _cosine_attn(
                q, k, v,
                AffineTransform(hw_heads, dtype=self.dtype,
                                name='affine_w'),
                coords_table(ws), rel_index(ws), None,
                merge=(nb, static))
            out_w = out_w.transpose(0, 2, 1, 3).reshape(-1, tt, c // 2)
            out_w = win_rev(out_w[:, inv, :], (T, T), h, w)
            if shift:
                out_w = jnp.roll(out_w, (shift, shift), axis=(1, 2))
        else:
            # ---------------- window attention half ----------------
            yw = qkv_w
            if shift:
                yw = jnp.roll(yw, (-shift, -shift), axis=(1, 2))
            toks = win_part(yw, ws)
            t3 = toks.reshape(-1, n, 3, hw_heads,
                              hd).transpose(2, 0, 3, 1, 4)
            q, k, v = t3[0], t3[1], t3[2]
            mask = shift_mask((h, w), ws, (shift, shift)) if shift \
                else None
            if 'win' in _abl:       # measurement-only (see _ablate)
                out_w = v
            else:
                out_w = _cosine_attn(
                    q, k, v,
                    AffineTransform(hw_heads, dtype=self.dtype,
                                    name='affine_w'),
                    coords_table(ws), rel_index(ws), mask)
            out_w = out_w.transpose(0, 2, 1, 3).reshape(-1, n, c // 2)
            out_w = win_rev(out_w, ws, h, w)
            if shift:
                out_w = jnp.roll(out_w, (shift, shift), axis=(1, 2))

        # ---------------- anchor stripe attention half ----------------
        a_ss = (ss[0] // self.df, ss[1] // self.df)
        n1 = ss[0] * ss[1]
        hs_heads = self.num_heads_s
        hds = (c // 2) // hs_heads
        n2 = a_ss[0] * a_ss[1]
        if mergeable:
            toks_s = win_part(qkv_s, (T, T))
            perm = jnp.asarray(_win_order_perm(T, wsz))
            inv = jnp.asarray(_inv_perm(T, wsz))
            toks_s = toks_s[:, perm, :]
            tt = T * T
            nb = (T // wsz) ** 2
            t3 = toks_s.reshape(-1, tt, 3, hs_heads,
                                hds).transpose(2, 0, 3, 1, 4)
            qs, ks, vs = t3[0], t3[1], t3[2]
            # anchors, merged over the matching (T/df) anchor tiles
            pooled = nn.avg_pool(x, (self.df, self.df),
                                 strides=(self.df, self.df))
            anchor = nn.Dense(c // 2, dtype=self.dtype,
                              name='anchor_proj')(pooled)
            Ta = T // self.df
            a_toks = win_part(anchor, (Ta, Ta))
            perma = jnp.asarray(_win_order_perm(Ta, wsz // self.df))
            a_toks = a_toks[:, perma, :]
            a4 = a_toks.reshape(-1, nb * n2, hs_heads,
                                hds).transpose(0, 2, 1, 3)
            y1 = _cosine_attn(
                a4, ks, vs,
                AffineTransform(hs_heads, dtype=self.dtype,
                                name='affine_s1'),
                coords_table(ss, self.df),
                rel_index(ss, self.df, window_to_anchor=False), None,
                merge=(nb, _merged_offblock(nb, n2, n1)[None]))
            y2 = _cosine_attn(
                qs, a4, y1,
                AffineTransform(hs_heads, dtype=self.dtype,
                                name='affine_s2'),
                coords_table(ss, self.df),
                rel_index(ss, self.df, window_to_anchor=True), None,
                merge=(nb, _merged_offblock(nb, n1, n2)[None]))
            out_s = y2.transpose(0, 2, 1, 3).reshape(-1, tt, c // 2)
            out_s = win_rev(out_s[:, inv, :], (T, T), h, w)
        else:
            toks_s = win_part(qkv_s, ss)
            t3 = toks_s.reshape(-1, n1, 3, hs_heads,
                                hds).transpose(2, 0, 3, 1, 4)
            qs, ks, vs = t3[0], t3[1], t3[2]
            if 'anchor' in _abl:
                a4 = vs[:, :, :n2, :]
            else:
                # anchors: avgpool down-factor + linear C -> C/2
                pooled = nn.avg_pool(x, (self.df, self.df),
                                     strides=(self.df, self.df))
                anchor = nn.Dense(c // 2, dtype=self.dtype,
                                  name='anchor_proj')(pooled)
                a_toks = win_part(anchor, a_ss)
                a4 = a_toks.reshape(-1, n2, hs_heads,
                                    hds).transpose(0, 2, 1, 3)
            if 'stripe' in _abl:
                y2 = vs
            else:
                # stage 1: anchor queries attend window keys (a2w)
                y1 = _cosine_attn(
                    a4, ks, vs,
                    AffineTransform(hs_heads, dtype=self.dtype,
                                    name='affine_s1'),
                    coords_table(ss, self.df),
                    rel_index(ss, self.df, window_to_anchor=False),
                    None)
                # stage 2: window queries attend anchors (w2a)
                y2 = _cosine_attn(
                    qs, a4, y1,
                    AffineTransform(hs_heads, dtype=self.dtype,
                                    name='affine_s2'),
                    coords_table(ss, self.df),
                    rel_index(ss, self.df, window_to_anchor=True),
                    None)
            out_s = y2.transpose(0, 2, 1, 3).reshape(-1, n1, c // 2)
            out_s = win_rev(out_s, ss, h, w)

        out = jnp.concatenate([out_w, out_s], axis=-1)
        return nn.Dense(c, dtype=self.dtype, name='proj')(out)


class CAB(nn.Module):
    """Local connection: conv-GELU-conv + RCAN channel attention."""
    num_feat: int
    compress_ratio: int = 4
    reduction: int = 18
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv(self.num_feat // self.compress_ratio, 3,
                 dtype=self.dtype)(x)
        y = nn.gelu(y)
        y = Conv(self.num_feat, 3, dtype=self.dtype)(y)
        g = y.mean(axis=(1, 2), keepdims=True)
        g = nn.relu(Conv(max(1, self.num_feat // self.reduction), 1,
                         dtype=self.dtype)(g))
        g = nn.sigmoid(Conv(self.num_feat, 1, dtype=self.dtype)(g))
        return y * g


class GRLBlock(nn.Module):
    dim: int
    num_heads_w: int
    num_heads_s: int
    window_size: int
    window_shift: bool
    stripe_size: Tuple[int, int]
    stripe_type: str
    df: int
    mlp_ratio: float
    local_connection: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        attn = MixedAttention(self.dim, self.num_heads_w,
                              self.num_heads_s, self.window_size,
                              self.window_shift, self.stripe_size,
                              self.stripe_type, self.df,
                              dtype=self.dtype)(x)
        attn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(attn)   # POST-norm (SwinV2)
        _abl = _ablate()            # measurement-only (see _ablate)
        if self.local_connection and 'cab' not in _abl:
            x = x + attn + CAB(self.dim, dtype=self.dtype)(x)
        else:
            x = x + attn
        if 'mlp' in _abl:
            return x
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(x)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(y)
        return x + y


class _DoubleGRLBlock(nn.Module):
    """Scan unit: (shifted-window + H-stripe) block then (unshifted +
    W-stripe) block — the reference's even/odd alternation. Scanned with
    remat like SwinIR (HBM-bound backward; compile shrinks ~depth/2 x)."""
    dim: int
    num_heads_w: int
    num_heads_s: int
    window_size: int
    stripe_size: Tuple[int, int]
    df: int
    mlp_ratio: float
    local_connection: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        x = GRLBlock(self.dim, self.num_heads_w, self.num_heads_s,
                     self.window_size, True, self.stripe_size, 'H',
                     self.df, self.mlp_ratio, self.local_connection,
                     dtype=self.dtype)(x)
        x = GRLBlock(self.dim, self.num_heads_w, self.num_heads_s,
                     self.window_size, False, self.stripe_size, 'W',
                     self.df, self.mlp_ratio, self.local_connection,
                     dtype=self.dtype)(x)
        return x, None


class GRL(nn.Module):
    in_chans: int = 1
    upscale: int = 2
    img_range: float = 1.0
    window_size: int = 8
    embed_dim: int = 180
    depths: Sequence[int] = (4, 4, 8, 8, 8, 4, 4)
    num_heads_window: Sequence[int] = (3,) * 7
    num_heads_stripe: Sequence[int] = (3,) * 7
    mlp_ratio: float = 2.0
    stripe_size: Tuple[int, int] = (8, 8)
    anchor_window_down_factor: int = 2
    local_connection: bool = True
    upsampler: str = constants.US_PIXEL_SHUFFLE
    dtype: Dtype = jnp.float32
    scan_blocks: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        mean = jnp.zeros((1, 1, 1, 1), x.dtype)
        x = (x - mean) * self.img_range
        y = nchw_to_nhwc(x)
        b, h0, w0, _ = y.shape
        # pad to a multiple of window and stripe granularity
        pad_unit = max(self.window_size, self.stripe_size[0],
                       self.stripe_size[1])
        ph = (pad_unit - h0 % pad_unit) % pad_unit
        pw = (pad_unit - w0 % pad_unit) % pad_unit
        if ph or pw:
            # constant-zero padding (check_image_size pads with
            # 'constant', network_grl.py:1447 — NOT reflect)
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))

        feat = Conv(self.embed_dim, 3, dtype=self.dtype,
                    name='conv_first')(y)
        body = feat
        # token LayerNorm before the stages (norm_start,
        # network_grl.py:1258,1456) — found by differential test
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name='norm_start')(body)
        for si, (d, nhw, nhs) in enumerate(zip(self.depths,
                                               self.num_heads_window,
                                               self.num_heads_stripe)):
            stage_in = body
            if self.scan_blocks and d % 2 == 0 and d >= 2:
                ScanPair = nn.scan(
                    nn.remat(_DoubleGRLBlock, prevent_cse=False),
                    variable_axes={'params': 0},
                    split_rngs={'params': True},
                    length=d // 2,
                    metadata_params={nn.PARTITION_NAME: None})
                body, _ = ScanPair(
                    self.embed_dim, nhw, nhs, self.window_size,
                    tuple(self.stripe_size),
                    self.anchor_window_down_factor, self.mlp_ratio,
                    self.local_connection, dtype=self.dtype,
                    name=f's{si}_blocks')(body, None)
            else:
                for i in range(d):
                    body = GRLBlock(
                        self.embed_dim, nhw, nhs, self.window_size,
                        window_shift=(i % 2 == 0),
                        stripe_size=tuple(self.stripe_size),
                        stripe_type='H' if i % 2 == 0 else 'W',
                        df=self.anchor_window_down_factor,
                        mlp_ratio=self.mlp_ratio,
                        local_connection=self.local_connection,
                        dtype=self.dtype, name=f's{si}_b{i}')(body)
            body = Conv(self.embed_dim, 3, dtype=self.dtype,
                        name=f's{si}_conv')(body)
            body = body + stage_in
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name='norm_end')(body)
        body = Conv(self.embed_dim, 3, dtype=self.dtype,
                    name='conv_after_body')(body)
        feat = feat + body

        if self.upsampler == constants.US_PIXEL_SHUFFLE:
            u = Conv(64, 3, dtype=self.dtype, name='conv_before_up')(feat)
            u = nn.leaky_relu(u, 0.01)
            u = Upsampler(self.upscale, 64, dtype=self.dtype)(u)
            out = Conv(self.in_chans, 3, dtype=self.dtype,
                       name='conv_last')(u)
        elif self.upsampler == constants.US_PIXEL_SHUFFLE_DIRECT:
            out = UpsamplerDirect(self.upscale, self.in_chans,
                                  dtype=self.dtype)(feat)
        else:
            raise NotImplementedError(self.upsampler)

        out = nhwc_to_nchw(out)
        out = out[..., :h0 * self.upscale, :w0 * self.upscale]
        return {'out': out / self.img_range + mean}
