"""Omni-SR: omni-axis (spatial + channel) self-attention network.

Capability parity with the reference (network_omni_sr.py:527): res_num
OSAG groups, each = block_num OSA blocks + 1x1 conv + residual + ESA gate;
an OSA block chains MBConv -> window attention -> gated-conv FFN ->
windowed channel attention -> FFN -> grid attention -> FFN -> grid
channel attention -> FFN (Attention:212, Channel_Attention:332,
ESA:85, MBConv:151). Zero-pad to window multiple, single-step
pixel-shuffle upsampling.

TPU notes: window/grid partitions are reshape+transpose with static
shapes; both spatial attentions share one implementation parameterized by
the partition order.
"""
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (Conv, StridedConv, nchw_to_nhwc,
                                       nhwc_to_nchw, pixel_shuffle)
from srcaco2_tpu.models.swinir import relative_position_index
from srcaco2_tpu.ops.resize import resize2d, BILINEAR

Dtype = Any


class ESA(nn.Module):
    """Enhanced spatial attention gate."""
    esa_channels: int
    n_feats: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.esa_channels
        c1_ = Conv(f, 1, dtype=self.dtype)(x)
        c1 = nn.Conv(f, (3, 3), strides=(2, 2), padding='VALID',
                     dtype=self.dtype)(c1_)
        # reference uses max_pool(7, stride 3); clamp for tiny inputs.
        pk = min(7, c1.shape[1], c1.shape[2])
        v_max = nn.max_pool(c1, (pk, pk), strides=(3, 3))
        c3 = Conv(f, 3, dtype=self.dtype)(v_max)
        c3 = resize2d(c3.transpose(0, 3, 1, 2),
                      (x.shape[1], x.shape[2]),
                      method=BILINEAR).transpose(0, 2, 3, 1)
        cf = Conv(f, 1, dtype=self.dtype)(c1_)
        c4 = Conv(self.n_feats, 1, dtype=self.dtype)(c3 + cf)
        return x * nn.sigmoid(c4)


class SqueezeExcitation(nn.Module):
    dim: int
    shrinkage_rate: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.shrinkage_rate)
        g = x.mean(axis=(1, 2))
        g = nn.silu(nn.Dense(hidden, use_bias=False, dtype=self.dtype)(g))
        g = nn.sigmoid(nn.Dense(self.dim, use_bias=False,
                                dtype=self.dtype)(g))
        return x * g[:, None, None, :]


class MBConv(nn.Module):
    dim: int
    expansion_rate: float = 1.0
    shrinkage_rate: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.expansion_rate * self.dim)
        y = nn.gelu(Conv(hidden, 1, dtype=self.dtype)(x))
        y = nn.gelu(nn.Conv(hidden, (3, 3), padding=[(1, 1), (1, 1)],
                            feature_group_count=hidden,
                            dtype=self.dtype)(y))
        y = SqueezeExcitation(hidden, self.shrinkage_rate,
                              dtype=self.dtype)(y)
        y = Conv(self.dim, 1, dtype=self.dtype)(y)
        return y + x


def _window_split(x, w, grid: bool):
    """(B,H,W,C) -> (B*nW, w*w, C); grid=True groups by dilated grid
    ('b d (w1 x) (w2 y)') instead of blocks ('b d (x w1) (y w2)')."""
    b, h, ww, c = x.shape
    if grid:
        x = x.reshape(b, w, h // w, w, ww // w, c)
        x = x.transpose(0, 2, 4, 1, 3, 5)
    else:
        x = x.reshape(b, h // w, w, ww // w, w, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_merge(x, w, h, ww, grid: bool):
    c = x.shape[-1]
    b = x.shape[0] // ((h // w) * (ww // w))
    x = x.reshape(b, h // w, ww // w, w, w, c)
    if grid:
        x = x.transpose(0, 3, 1, 4, 2, 5)
    else:
        x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, ww, c)


class SpatialAttention(nn.Module):
    """Window / grid MSA with optional relative position embedding."""
    dim: int
    window_size: int
    with_pe: bool
    grid: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window_size
        dim_head = self.dim // 4        # reference: dim_head = C/4
        heads = self.dim // dim_head
        y = nn.LayerNorm(dtype=self.dtype)(x)
        yw = _window_split(y, ws, self.grid)
        n = ws * ws
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype)(yw)
        qkv = qkv.reshape(-1, n, 3, heads, dim_head).transpose(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhnd,bhmd->bhnm', q * dim_head ** -0.5, k)
        if self.with_pe:
            table = self.param('rel_pos_bias',
                               nn.initializers.normal(1.0),
                               ((2 * ws - 1) ** 2, heads))
            idx = relative_position_index(ws).reshape(-1)
            bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
            attn = attn + bias.astype(attn.dtype)[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(-1, n, c)
        out = nn.Dense(c, use_bias=False, dtype=self.dtype)(out)
        return _window_merge(out, ws, h, w, self.grid) + x


class GatedConvFFN(nn.Module):
    dim: int
    mult: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        hidden = int(self.dim * self.mult)
        y = nn.Conv(2 * hidden, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.Conv(2 * hidden, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=2 * hidden, use_bias=False,
                    dtype=self.dtype)(y)
        y1, y2 = jnp.split(y, 2, axis=-1)
        y = nn.gelu(y1) * y2
        y = nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype)(y)
        return y + x


class ChannelAttention(nn.Module):
    """Transposed (channel) attention within windows or grids."""
    dim: int
    heads: int
    window_size: int
    grid: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ps = self.window_size
        y = nn.LayerNorm(dtype=self.dtype)(x)
        qkv = nn.Conv(3 * c, (1, 1), use_bias=False, dtype=self.dtype)(y)
        qkv = nn.Conv(3 * c, (3, 3), padding=[(1, 1), (1, 1)],
                      feature_group_count=3 * c, use_bias=False,
                      dtype=self.dtype)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = c // self.heads

        nw = (h // ps) * (w // ps)

        def to_tokens(t):
            # -> (b, groups, heads, d, tokens). Both variants use the
            # BLOCK partition; the grid variant swaps the group/token
            # roles: groups = within-window offsets (ph, pw), tokens =
            # window indices (network_omni_sr.py:408 '(h w)' tokens vs
            # :359 '(ph pw)' tokens) — NOT the dilated spatial-grid
            # partition (a real drift the differential test caught).
            tw = _window_split(t, ps, False)       # (b*nW, ps*ps, c)
            tw = tw.reshape(b, nw, ps * ps, self.heads, d)
            if self.grid:
                return tw.transpose(0, 2, 3, 4, 1)  # groups = offsets
            return tw.transpose(0, 1, 3, 4, 2)      # groups = windows

        qt, kt, vt = map(to_tokens, (q, k, v))
        qt = qt / jnp.sqrt(jnp.sum(qt * qt, axis=-1, keepdims=True)
                           + 1e-12)
        kt = kt / jnp.sqrt(jnp.sum(kt * kt, axis=-1, keepdims=True)
                           + 1e-12)
        temp = self.param('temperature', nn.initializers.ones,
                          (self.heads, 1, 1))
        attn = jnp.einsum('bghdt,bghet->bghde', qt, kt) \
            * temp.astype(qt.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bghde,bghet->bghdt', attn, vt)
        if self.grid:
            # (b, ps*ps, heads, d, nW) -> (b*nW, ps*ps, c)
            out = out.transpose(0, 4, 1, 2, 3).reshape(-1, ps * ps, c)
        else:
            out = out.transpose(0, 1, 4, 2, 3).reshape(-1, ps * ps, c)
        out = _window_merge(out, ps, h, w, False)
        out = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)(out)
        return out + x


class OSABlock(nn.Module):
    dim: int
    window_size: int
    with_pe: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.window_size
        x = MBConv(self.dim, dtype=self.dtype)(x)
        x = SpatialAttention(self.dim, w, self.with_pe, grid=False,
                             dtype=self.dtype)(x)
        x = GatedConvFFN(self.dim, dtype=self.dtype)(x)
        x = ChannelAttention(self.dim, 4, w, grid=False,
                             dtype=self.dtype)(x)
        x = GatedConvFFN(self.dim, dtype=self.dtype)(x)
        x = SpatialAttention(self.dim, w, self.with_pe, grid=True,
                             dtype=self.dtype)(x)
        x = GatedConvFFN(self.dim, dtype=self.dtype)(x)
        x = ChannelAttention(self.dim, 4, w, grid=True,
                             dtype=self.dtype)(x)
        x = GatedConvFFN(self.dim, dtype=self.dtype)(x)
        return x


class OSAG(nn.Module):
    dim: int
    block_num: int
    window_size: int
    pe: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x
        for _ in range(self.block_num):
            y = OSABlock(self.dim, self.window_size, self.pe,
                         dtype=self.dtype)(y)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype)(y)
        y = y + x
        esa_c = max(self.dim // 4, 16)
        return ESA(esa_c, self.dim, dtype=self.dtype)(y)


class OmniSR(nn.Module):
    in_chans: int = 1
    upscale: int = 2
    num_feat: int = 64
    res_num: int = 5
    block_num: int = 4
    window_size: int = 8
    pe: bool = True
    bias: bool = True
    ffn_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h0, w0 = x.shape[-2], x.shape[-1]
        y = nchw_to_nhwc(x)
        ws = self.window_size
        ph = (ws - h0 % ws) % ws
        pw = (ws - w0 % ws) % ws
        if ph or pw:
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
        residual = Conv(self.num_feat, 3, dtype=self.dtype,
                        name='input')(y)
        out = residual
        for i in range(self.res_num):
            out = OSAG(self.num_feat, self.block_num, ws, self.pe,
                       dtype=self.dtype, name=f'osag{i}')(out)
        out = Conv(self.num_feat, 3, dtype=self.dtype,
                   name='output')(out) + residual
        out = Conv(self.in_chans * self.upscale ** 2, 3,
                   dtype=self.dtype, name='up')(out)
        out = pixel_shuffle(out, self.upscale)
        out = nhwc_to_nchw(out)
        return {'out': out[..., :h0 * self.upscale, :w0 * self.upscale]}
