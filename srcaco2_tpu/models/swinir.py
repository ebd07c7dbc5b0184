"""SwinIR: shifted-window transformer for super-resolution.

Capability parity with the reference flagship (network_swinir.py:710 —
window attention w/ relative position bias :83, shifted blocks :199,
RSTB :490, pixelshuffle/pixelshuffledirect/nearest_conv upsamplers :685,
reflect pad to window multiple :908). Re-designed TPU-first:

  * window partition/reverse are pure reshape+transpose (static shapes —
    XLA folds them into layout changes);
  * the shift-attention mask and relative-position-bias gather index are
    computed at trace time as constants;
  * attention runs as one batched (B*nW, heads, win^2, win^2) matmul chain
    on the MXU with bf16-able compute dtype;
  * no data-dependent control flow; padding amounts are static per input
    shape, so jit specializes per (train-patch, eval-image) shape.
"""
import math
from typing import Any, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu import constants
from srcaco2_tpu.models.blocks import (Conv, Upsampler, UpsamplerDirect,
                                       nchw_to_nhwc, nhwc_to_nchw,
                                       pixel_shuffle)

Dtype = Any


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(ws: int) -> np.ndarray:
    """(ws^2, ws^2) gather index into the (2ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij'))           # 2, ws, ws
    flat = coords.reshape(2, -1)                             # 2, ws^2
    rel = flat[:, :, None] - flat[:, None, :]                # 2, n, n
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Additive (nW, ws^2, ws^2) mask (0 / -100) for shifted windows."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with learned relative position bias. use_pallas routes the
    attention core through the fused VMEM kernel
    (ops/pallas/window_attention.py; forward-only, eval path)."""
    dim: int
    window_size: int
    num_heads: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        bnw, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        ws = self.window_size

        bias_table = self.param(
            'rel_pos_bias',
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, nh))
        idx = relative_position_index(ws).reshape(-1)
        bias = bias_table[idx].reshape(n, n, nh).transpose(2, 0, 1)

        qkv = nn.Dense(3 * c, dtype=self.dtype, name='qkv')(x)
        if self.use_pallas:
            from srcaco2_tpu.ops.pallas.window_attention import \
                window_attention_pallas
            full_mask = None
            if mask is not None:
                nw = mask.shape[0]
                full_mask = jnp.tile(mask.astype(qkv.dtype),
                                     (bnw // nw, 1, 1))
            out = window_attention_pallas(
                qkv, bias.astype(qkv.dtype), full_mask, heads=nh)
        else:
            qkv = qkv.reshape(bnw, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]    # (bnw, nh, n, hd)
            attn = jnp.einsum('bhnd,bhmd->bhnm', q * (hd ** -0.5), k)
            attn = attn + bias.astype(attn.dtype)[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(bnw // nw, nw, nh, n, n) \
                    + mask[None, :, None].astype(attn.dtype)
                attn = attn.reshape(bnw, nh, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(c, dtype=self.dtype, name='proj')(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C); H, W static multiples of window_size.
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, ws, self.shift))
        else:
            mask = None
        yw = window_partition(y, ws)
        yw = WindowAttention(self.dim, ws, self.num_heads,
                             dtype=self.dtype,
                             use_pallas=self.use_pallas)(yw, mask)
        y = window_reverse(yw, ws, h, w)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y
        # MLP
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        hidden = int(c * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype)(y)
        return x + y


class _DoubleSwinBlock(nn.Module):
    """One scan unit: a non-shifted block followed by a shifted block.
    Scanning over these units compiles ONE pair body instead of
    `depth` unrolled blocks — the flagship's XLA program shrinks ~18x,
    cutting minutes off compile time at equal step math."""
    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, _):
        x = SwinBlock(self.dim, self.num_heads, self.window_size, 0,
                      self.mlp_ratio, dtype=self.dtype,
                      use_pallas=self.use_pallas)(x)
        x = SwinBlock(self.dim, self.num_heads, self.window_size,
                      self.window_size // 2, self.mlp_ratio,
                      dtype=self.dtype, use_pallas=self.use_pallas)(x)
        return x, None


class RSTB(nn.Module):
    """Residual Swin Transformer Block: depth blocks + conv + residual.
    Even depths scan over (no-shift, shift) block pairs with stacked
    params; odd depths fall back to the unrolled loop."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    resi_connection: str = constants.R_CONNECTION_1CONV
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    scan_blocks: bool = True
    scan_unroll: int = 1
    remat_blocks: bool = True
    fused: bool = False           # fused VMEM block kernel (swin_fused)
    fused_mode: str = 'auto'      # 'auto' | 'never' | 'interpret'
    fused_tiled: bool = False     # opt-in: forward-only tiled
                                  # full-image kernel (SwinIR passes
                                  # `not train`)

    @nn.compact
    def __call__(self, x):
        res = x
        if self.fused:
            from srcaco2_tpu.models.swin_fused import FusedBlockStack
            x = FusedBlockStack(self.dim, self.depth, self.num_heads,
                                self.window_size, self.mlp_ratio,
                                dtype=self.dtype,
                                use_pallas=self.fused_mode,
                                allow_tiled=self.fused_tiled,
                                name='blocks')(x)
        elif self.scan_blocks and self.depth % 2 == 0 and self.depth >= 2:
            # remat halves measured step time: the backward is HBM-
            # bandwidth bound, so recomputing the pair body from its
            # input beats streaming saved activations back from HBM.
            body = nn.remat(_DoubleSwinBlock, prevent_cse=False) \
                if self.remat_blocks else _DoubleSwinBlock
            ScanPair = nn.scan(
                body,
                variable_axes={'params': 0},
                split_rngs={'params': True},
                length=self.depth // 2,
                unroll=min(self.scan_unroll, self.depth // 2),
                metadata_params={nn.PARTITION_NAME: None})
            x, _ = ScanPair(self.dim, self.num_heads, self.window_size,
                            self.mlp_ratio, dtype=self.dtype,
                            use_pallas=self.use_pallas,
                            name='blocks')(x, None)
        else:
            for i in range(self.depth):
                shift = 0 if i % 2 == 0 else self.window_size // 2
                x = SwinBlock(self.dim, self.num_heads,
                              self.window_size, shift, self.mlp_ratio,
                              dtype=self.dtype,
                              use_pallas=self.use_pallas)(x)
        if self.resi_connection == constants.R_CONNECTION_1CONV:
            x = Conv(self.dim, 3, dtype=self.dtype)(x)
        else:  # 3conv: compressed bottleneck
            x = Conv(self.dim // 4, 3, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
            x = Conv(self.dim // 4, 1, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
            x = Conv(self.dim, 3, dtype=self.dtype)(x)
        return x + res


class _ScanRSTB(nn.Module):
    """Scan unit over uniform stages (see _DoubleSwinBlock note)."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    resi_connection: str
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    fused: bool = False
    fused_mode: str = 'auto'
    fused_tiled: bool = False

    @nn.compact
    def __call__(self, x, _):
        x = RSTB(self.dim, self.depth, self.num_heads,
                 self.window_size, self.mlp_ratio,
                 self.resi_connection, dtype=self.dtype,
                 use_pallas=self.use_pallas, fused=self.fused,
                 fused_mode=self.fused_mode,
                 fused_tiled=self.fused_tiled)(x)
        return x, None


class SwinIR(nn.Module):
    in_chans: int = 1
    upscale: int = 2
    img_range: float = 1.0
    window_size: int = 8
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    mlp_ratio: float = 2.0
    upsampler: str = constants.US_PIXEL_SHUFFLE
    resi_connection: str = constants.R_CONNECTION_1CONV
    dtype: Dtype = jnp.float32
    use_pallas_attn: bool = False
    scan_stages: bool = True
    scan_unroll: int = 1
    fused_blocks: bool = False    # fused VMEM block kernels w/ custom
    fused_mode: str = 'auto'      # VJP for training-patch shapes
    patch_norm: bool = True       # LayerNorm after embedding
                                  # (network_swinir.py:595 PatchEmbed)

    def pad_to_window(self, x_nhwc):
        """Reflect-pad H,W to window multiples (check_image_size:908);
        pad amounts are static given the traced shape."""
        b, h, w, c = x_nhwc.shape
        ws = self.window_size
        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        if ph or pw:
            x_nhwc = jnp.pad(x_nhwc, ((0, 0), (0, ph), (0, pw), (0, 0)),
                             mode='reflect')
        return x_nhwc, h, w

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: NCHW [0,1]
        if self.in_chans == 3:
            mean = jnp.asarray([0.4488, 0.4371, 0.4040],
                               x.dtype).reshape(1, 3, 1, 1)
        else:
            mean = jnp.zeros((1, 1, 1, 1), x.dtype)
        x = (x - mean) * self.img_range

        y = nchw_to_nhwc(x)
        y, h0, w0 = self.pad_to_window(y)

        feat = Conv(self.embed_dim, 3, dtype=self.dtype,
                    name='conv_first')(y)
        body = feat
        if self.patch_norm:
            # patch-embed LayerNorm (network_swinir.py:595); the long
            # residual below uses the PRE-norm conv_first output.
            body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                name='patch_norm')(body)
        uniform = (len(set(self.depths)) == 1
                   and len(set(self.num_heads)) == 1)
        if self.scan_stages and uniform and len(self.depths) > 1:
            ScanStages = nn.scan(
                _ScanRSTB,
                variable_axes={'params': 0},
                split_rngs={'params': True},
                length=len(self.depths),
                unroll=min(self.scan_unroll, len(self.depths)),
                metadata_params={nn.PARTITION_NAME: None})
            body, _ = ScanStages(
                self.embed_dim, self.depths[0], self.num_heads[0],
                self.window_size, self.mlp_ratio,
                self.resi_connection, dtype=self.dtype,
                use_pallas=self.use_pallas_attn,
                fused=self.fused_blocks, fused_mode=self.fused_mode,
                fused_tiled=not train,
                name='stages')(body, None)
        else:
            for i, (d, nh) in enumerate(zip(self.depths,
                                            self.num_heads)):
                body = RSTB(self.embed_dim, d, nh, self.window_size,
                            self.mlp_ratio, self.resi_connection,
                            dtype=self.dtype,
                            use_pallas=self.use_pallas_attn,
                            fused=self.fused_blocks,
                            fused_mode=self.fused_mode,
                            fused_tiled=not train,
                            name=f'rstb{i}')(body)
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(body)
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
        elif self.upsampler == constants.US_NEAREST_CONV:
            u = Conv(64, 3, dtype=self.dtype)(feat)
            u = nn.leaky_relu(u, 0.01)
            for _ in range(int(math.log2(self.upscale))):
                b, hh, ww, cc = u.shape
                u = jax.image.resize(u, (b, hh * 2, ww * 2, cc),
                                     method='nearest')
                u = nn.leaky_relu(Conv(64, 3, dtype=self.dtype)(u), 0.2)
            u = nn.leaky_relu(Conv(64, 3, dtype=self.dtype)(u), 0.2)
            out = Conv(self.in_chans, 3, dtype=self.dtype)(u)
        else:
            raise NotImplementedError(self.upsampler)

        out = nhwc_to_nchw(out)
        out = out[..., :h0 * self.upscale, :w0 * self.upscale]
        out = out / self.img_range + mean
        return {'out': out}
