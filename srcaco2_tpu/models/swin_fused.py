"""FusedBlockStack: a stack of Swin transformer blocks with explicit
stacked parameters and two compute paths.

  * pallas path (training-patch shapes, T = H*W <= 256, TPU): every
    block runs as ONE fused VMEM-resident kernel with a custom VJP
    (ops/pallas/swin_block.py) — the shifted-window structure is folded
    into a precomputed additive attention bias, so the whole stack is
    a lax.scan of matmuls with near-zero HBM activation traffic.
  * windowed jnp path (full-image eval, CPU, any shape): the classic
    roll / window-partition / masked-window-attention formulation
    (reference network_swinir.py:199), also scanned over the stacked
    params so eval on 512^2 images compiles one block body.

Both paths consume the SAME parameter tree, so a model trained through
the kernel evaluates through the windowed path bit-compatibly (same
math: f32 LN eps 1e-5 / erf-GELU / bf16 matmul inputs, f32 accum).

Parameters are stacked over depth d with torch-compatible layouts
(qkv kernel (C, 3C) with head-major columns, bias table
((2ws-1)^2, nh)) so reference state_dicts port by simple transpose.
"""
import functools
import math
import os
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.ops.pallas.swin_block import (
    MAX_T, NEG_INF, LN_EPS, _env_cfg, _gelu, build_attn_bias,
    fused_swin_block, fused_swin_block_grouped, fused_swin_block_pair,
    full_attn_mask_and_index)
from srcaco2_tpu.models.swinir import (relative_position_index,
                                       shift_attn_mask,
                                       window_partition, window_reverse)

Dtype = Any


def _pallas_ok() -> bool:
    return jax.devices()[0].platform == 'tpu'


# -----------------------------------------------------------------
# tiled full-image path: 2ws x 2ws pixel tiles (= 2x2 windows, T =
# 4ws^2 <= MAX_T tokens) run through the fused kernel. Swin attention
# is always intra-window, so a full image decomposes exactly into
# independent tiles once the cyclic shift is folded into the tile
# gather; under shift only windows on the image's last window row /
# column carry wrap masks, so every tile is one of FOUR mask types
# (interior / right-edge / bottom-edge / corner) and the kernel
# selects the (nh, T, T) bias block per tile group via scalar
# prefetch (ops/pallas/swin_block.py: fused_swin_block_grouped).
# -----------------------------------------------------------------


def _tile_group_masks(ws: int, shift: int) -> np.ndarray:
    """(4, T, T) additional edge masks for a 2x2-window tile, groups
    ordered (interior, right-edge, bottom-edge, corner). Within an
    image-edge window the shift wrap splits tokens into regions that
    must not attend to each other (reference network_swinir.py:276
    calculate_mask); cross-window pairs are already masked by the
    block-diagonal base bias."""
    tl = 2 * ws
    t = tl * tl
    ys, xs = np.meshgrid(np.arange(tl), np.arange(tl), indexing='ij')
    ys, xs = ys.ravel(), xs.ravel()
    win = (ys // ws) * 2 + xs // ws
    same_win = win[:, None] == win[None, :]

    def reg(v, edge):
        # region label along one axis: only the tile's SECOND window
        # row/col can be the image's last, and only there does the
        # wrap band [ws-shift, ws) live.
        if not (edge and shift):
            return np.zeros(t, np.int64)
        band = (v // ws) == 1
        inner = (v % ws) < (ws - shift)
        return np.where(band, np.where(inner, 1, 2), 0)

    masks = []
    for ey, ex in ((0, 0), (0, 1), (1, 0), (1, 1)):
        rr = reg(ys, ey) * 3 + reg(xs, ex)
        same_reg = rr[:, None] == rr[None, :]
        masks.append(np.where(same_win & ~same_reg, NEG_INF, 0.0))
    return np.stack(masks).astype(np.float32)


class _TileLayout(NamedTuple):
    perm: np.ndarray      # (B*H*W,) gather: rolled group-major tiles
    inv: np.ndarray       # (B*H*W,) inverse gather back to raster
    gid: np.ndarray       # (n_programs,) bias group per grid program
    ib: int               # tiles per grid program


@functools.lru_cache(maxsize=None)
def _tile_layout(b: int, h: int, w: int, ws: int, shift: int,
                 row_target: int) -> _TileLayout:
    """Token gather that folds roll(-shift) + tile partition + group-
    major tile ordering into ONE index array. Tiles are ordered
    (group, image, tile) so each ib-tile grid program sees a single
    bias group."""
    tl = 2 * ws
    t = tl * tl
    nty, ntx = h // tl, w // tl
    ty, tx = np.meshgrid(np.arange(tl), np.arange(tl), indexing='ij')
    ty, tx = ty.ravel(), tx.ravel()

    def grp(i, j):
        return (2 if i == nty - 1 else 0) + (1 if j == ntx - 1 else 0)

    by_group = [[(i, j) for i in range(nty) for j in range(ntx)
                 if grp(i, j) == g] for g in range(4)]
    rows, gid_tiles = [], []
    for g, tiles in enumerate(by_group):
        for bi in range(b):
            for (i, j) in tiles:
                sr = (i * tl + ty + shift) % h
                sc = (j * tl + tx + shift) % w
                rows.append(bi * h * w + sr * w + sc)
                gid_tiles.append(g)
    perm = np.concatenate(rows).astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)

    runs = [len(tiles) * b for tiles in by_group if tiles]
    gg = 0
    for r in runs:
        gg = math.gcd(gg, r)
    # tiles per grid program: enough rows to amortize per-program
    # overhead, bounded by VMEM (the (ib, nh, t, t) score block is the
    # big term) and by the gcd of the group runs.
    target = max(1, row_target // t)
    ib = max(d for d in range(1, min(target, gg) + 1) if gg % d == 0)
    gid = np.asarray(gid_tiles[::ib], np.int32)
    assert all(len(set(gid_tiles[k * ib:(k + 1) * ib])) == 1
               for k in range(len(gid)))
    return _TileLayout(perm, inv, gid, ib)


class FusedBlockStack(nn.Module):
    """depth Swin blocks (alternating shift 0 / ws//2) over stacked
    explicit params. Input/output: (B, H, W, C) with H, W multiples of
    window_size."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32
    use_pallas: str = 'auto'      # 'auto' | 'never' | 'interpret'
    allow_tiled: bool = False     # full-image tiled kernel path is
                                  # FORWARD-ONLY (no VJP), so it is
                                  # OPT-IN: default-safe for any
                                  # caller that may differentiate at
                                  # full-image shapes. SwinIR opts in
                                  # with `not train` for eval.

    def _params(self):
        d, c = self.depth, self.dim
        ch = int(c * self.mlp_ratio)
        nb = (2 * self.window_size - 1) ** 2
        dense = nn.initializers.lecun_normal()
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        tnorm = nn.initializers.truncated_normal(0.02)
        return {
            'ln1_scale': self.param('ln1_scale', ones, (d, c)),
            'ln1_bias': self.param('ln1_bias', zeros, (d, c)),
            'qkv_kernel': self.param('qkv_kernel', dense, (d, c, 3 * c)),
            'qkv_bias': self.param('qkv_bias', zeros, (d, 3 * c)),
            'rel_pos_table': self.param('rel_pos_table', tnorm,
                                        (d, nb, self.num_heads)),
            'proj_kernel': self.param('proj_kernel', dense, (d, c, c)),
            'proj_bias': self.param('proj_bias', zeros, (d, c)),
            'ln2_scale': self.param('ln2_scale', ones, (d, c)),
            'ln2_bias': self.param('ln2_bias', zeros, (d, c)),
            'mlp1_kernel': self.param('mlp1_kernel', dense, (d, c, ch)),
            'mlp1_bias': self.param('mlp1_bias', zeros, (d, ch)),
            'mlp2_kernel': self.param('mlp2_kernel', dense, (d, ch, c)),
            'mlp2_bias': self.param('mlp2_bias', zeros, (d, c)),
        }

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = self._params()
        t = h * w
        mode = self.use_pallas
        if mode == 'auto':
            mode = 'pallas' if _pallas_ok() else 'never'
        if t <= MAX_T and mode in ('pallas', 'interpret'):
            return self._pallas_path(x, p, interpret=(mode ==
                                                      'interpret'))
        ws = self.window_size
        if (self.allow_tiled and mode in ('pallas', 'interpret')
                and 4 * ws * ws <= MAX_T
                and h % (2 * ws) == 0 and w % (2 * ws) == 0
                and os.environ.get('SRCACO2_SWIN_TILED_EVAL',
                                   '1') != '0'):
            return self._tiled_pallas_path(
                x, p, interpret=(mode == 'interpret'))
        return self._windowed_path(x, p)

    # ------------------------------------------------------------
    def _pallas_path(self, x, p, interpret: bool):
        b, h, w, c = x.shape
        t = h * w
        bias = build_attn_bias(p['rel_pos_table'], h, w,
                               self.window_size)   # (d, nh, t, t)
        tok = x.reshape(b, t, c).astype(self.dtype)
        block_keys = [k for k in p if k != 'rel_pos_table']

        stacked = {k: p[k] for k in block_keys}
        if _env_cfg().pair and self.depth % 2 == 0:
            # pair-fused: scan over (no-shift, shift) block pairs, one
            # pallas_call per pair (SRCACO2_SWIN_PAIR=1)
            def body2(carry, ws_bias):
                wsl, bi = ws_bias     # leaves carry a leading 2-dim
                y = fused_swin_block_pair(
                    carry, {k: v[0] for k, v in wsl.items()}, bi[0],
                    {k: v[1] for k, v in wsl.items()}, bi[1],
                    heads=self.num_heads, interpret=interpret,
                    compute_dtype=self.dtype)
                return y, None

            paired = jax.tree.map(
                lambda v: v.reshape((self.depth // 2, 2)
                                    + v.shape[1:]), stacked)
            bias2 = bias.reshape((self.depth // 2, 2) + bias.shape[1:])
            tok, _ = jax.lax.scan(body2, tok, (paired, bias2))
            return tok.reshape(b, h, w, c)

        def body(carry, ws_bias):
            wsl, bi = ws_bias
            y = fused_swin_block(carry, wsl, bi, heads=self.num_heads,
                                 interpret=interpret,
                                 compute_dtype=self.dtype)
            return y, None

        tok, _ = jax.lax.scan(body, tok, (stacked, bias))
        return tok.reshape(b, h, w, c)

    # ------------------------------------------------------------
    def _tiled_pallas_path(self, x, p, interpret: bool):
        """Full-image eval through the fused kernel: the image is cut
        into 2ws x 2ws tiles (T = 4ws^2 tokens), the per-block cyclic
        shift + tile partition + group-major ordering fold into one
        precomputed token gather, and each tile runs the whole block
        in VMEM with its mask group's bias selected by scalar
        prefetch. Numerically identical math to _windowed_path (the
        masked-window formulation), ~4x fewer HBM round trips."""
        b, h, w, c = x.shape
        ws = self.window_size
        d = self.depth
        shift = ws // 2
        tl = 2 * ws
        t = tl * tl
        nt = (h // tl) * (w // tl)
        # rows per grid program (v5e A/B, perf_eval_probe --tile-rows:
        # 1024 is +0-1% vs 512, 2048 = 8 tiles exceeds the 16 MB
        # scoped-VMEM limit — per-program overhead is not the binder)
        rows = int(os.environ.get('SRCACO2_SWIN_TILE_ROWS', '512'))
        lays = (_tile_layout(b, h, w, ws, 0, rows),
                _tile_layout(b, h, w, ws, shift, rows))
        ib = lays[0].ib
        pars = [i % 2 for i in range(d)]
        trans = []
        for i in range(d):
            if i < d - 1:
                trans.append(
                    lays[pars[i]].inv[lays[pars[i + 1]].perm])
            else:
                trans.append(lays[pars[i]].inv)
        trans = jnp.asarray(np.stack(trans))          # (d, B*H*W)
        gids = jnp.asarray(np.stack([lays[pp].gid for pp in pars]))
        rel_bias = build_attn_bias(p['rel_pos_table'], tl, tl, ws,
                                   shifts=(0,) * d)   # (d, nh, t, t)
        masks_both = jnp.asarray(np.stack(
            [_tile_group_masks(ws, 0),
             _tile_group_masks(ws, shift)]))[:, :, None]
        parity = jnp.asarray(pars, jnp.int32)

        stacked = {k: p[k] for k in p if k != 'rel_pos_table'}
        tok = x.reshape(b * h * w, c).astype(self.dtype)
        carry = jnp.take(tok, jnp.asarray(lays[0].perm), axis=0, unique_indices=True).reshape(b * nt, t, c)

        def body(cy, xs):
            wsl, bias_d, tr, gid, par = xs
            mask = jax.lax.dynamic_index_in_dim(masks_both, par, 0,
                                                keepdims=False)
            bias_g = bias_d[None] + mask              # (4, nh, t, t)
            y = fused_swin_block_grouped(
                cy, wsl, bias_g, gid, heads=self.num_heads, ib=ib,
                interpret=interpret, compute_dtype=self.dtype)
            y = jnp.take(y.reshape(b * h * w, c), tr, axis=0, unique_indices=True).reshape(b * nt, t, c)
            return y, None

        out, _ = jax.lax.scan(body, carry,
                              (stacked, rel_bias, trans, gids,
                               parity))
        return out.reshape(b, h, w, c)

    # ------------------------------------------------------------
    def _windowed_path(self, x, p):
        """Classic shifted-window formulation over stacked params.
        Matches the pallas path numerically (f32 LN/softmax, bf16
        matmul inputs when dtype is bf16)."""
        b, h, w, c = x.shape
        ws = self.window_size
        nh = self.num_heads
        hd = c // nh
        n = ws * ws
        d = self.depth
        cdt = self.dtype
        rel = relative_position_index(ws).reshape(-1)
        smask = jnp.asarray(shift_attn_mask(h, w, ws, ws // 2))
        shifts = jnp.asarray([0 if i % 2 == 0 else ws // 2
                              for i in range(d)], jnp.int32)

        def ln(z, g, bb):
            zf = z.astype(jnp.float32)
            mu = jnp.mean(zf, -1, keepdims=True)
            var = jnp.var(zf, -1, keepdims=True)
            zh = (zf - mu) * jax.lax.rsqrt(var + LN_EPS)
            return (zh * g + bb).astype(cdt)

        def dense(z, k, bb):
            return (jnp.dot(z.astype(cdt), k.astype(cdt),
                            preferred_element_type=jnp.float32)
                    + bb).astype(cdt)

        def body(carry, wsl):
            shift = wsl['shift']
            y = ln(carry, wsl['ln1_scale'], wsl['ln1_bias'])
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            yw = window_partition(y, ws)          # (b*nW, n, c)
            qkv = dense(yw, wsl['qkv_kernel'], wsl['qkv_bias'])
            qkv = qkv.reshape(-1, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = jnp.einsum(
                'bhnd,bhmd->bhnm', (q * hd ** -0.5), k,
                preferred_element_type=jnp.float32)
            bias = wsl['rel_pos_table'][rel].reshape(n, n, nh)
            attn = attn + bias.transpose(2, 0, 1)[None]
            nw = (h // ws) * (w // ws)
            mask = jnp.where(shift > 0, smask,
                             jnp.zeros_like(smask))
            attn = attn.reshape(-1, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(-1, nh, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            o = jnp.einsum('bhnm,bhmd->bhnd', attn.astype(cdt), v,
                           preferred_element_type=jnp.float32)
            o = o.astype(cdt).transpose(0, 2, 1, 3).reshape(-1, n, c)
            o = dense(o, wsl['proj_kernel'], wsl['proj_bias'])
            y = window_reverse(o, ws, h, w)
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
            z = carry + y
            y2 = ln(z, wsl['ln2_scale'], wsl['ln2_bias'])
            u = dense(y2, wsl['mlp1_kernel'], wsl['mlp1_bias'])
            u = _gelu(u.astype(jnp.float32)).astype(cdt)
            y2 = dense(u, wsl['mlp2_kernel'], wsl['mlp2_bias'])
            return z + y2, None

        stacked = {k: v for k, v in p.items()}
        stacked['shift'] = shifts
        out, _ = jax.lax.scan(body, x.astype(cdt), stacked)
        return out
