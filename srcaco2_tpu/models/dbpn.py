"""DBPN: deep back-projection network (dense, residual, multi-stage).

Capability parity with the reference (network_dbpn.py:445 — the
DBPN-RES-MR64-3 variant: feat0/feat1 feature extraction, a 7-up/6-down
dense back-projection chain re-run num_stages times with the LR state
carried over, concat of per-stage HR outputs, kernel/stride/pad chosen by
scale: x2 (6,2,2), x4 (8,4,2), x8 (12,8,2)).
"""
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (ConvT, StridedConv, nchw_to_nhwc,
                                       nhwc_to_nchw)

Dtype = Any

_KSP = {2: (6, 2, 2), 4: (8, 4, 2), 8: (12, 8, 2)}


class _CB(nn.Module):
    """conv + PReLU."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = StridedConv(self.features, self.kernel, self.stride,
                        self.padding, dtype=self.dtype)(x)
        return nn.PReLU()(y)


class _DB(nn.Module):
    """deconv + PReLU."""
    features: int
    kernel: int
    stride: int
    padding: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvT(self.features, self.kernel, self.stride, self.padding,
                  dtype=self.dtype)(x)
        return nn.PReLU()(y)


class UpBlock(nn.Module):
    nf: int
    k: int
    s: int
    p: int
    compress: int = 0        # >0: 1x1 compress from compress*nf channels
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.compress:
            x = _CB(self.nf, 1, 1, 0, dtype=self.dtype)(x)
        h0 = _DB(self.nf, self.k, self.s, self.p, dtype=self.dtype)(x)
        l0 = _CB(self.nf, self.k, self.s, self.p, dtype=self.dtype)(h0)
        h1 = _DB(self.nf, self.k, self.s, self.p, dtype=self.dtype)(l0 - x)
        return h1 + h0


class DownBlock(nn.Module):
    nf: int
    k: int
    s: int
    p: int
    compress: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.compress:
            x = _CB(self.nf, 1, 1, 0, dtype=self.dtype)(x)
        l0 = _CB(self.nf, self.k, self.s, self.p, dtype=self.dtype)(x)
        h0 = _DB(self.nf, self.k, self.s, self.p, dtype=self.dtype)(l0)
        l1 = _CB(self.nf, self.k, self.s, self.p, dtype=self.dtype)(h0 - x)
        return l1 + l0


class DBPN(nn.Module):
    in_chans: int = 1
    upscale: int = 2
    base_filter: int = 64
    feat: int = 256
    num_stages: int = 3
    # numerics-identical; off reproduces the un-lifted param-dict
    # creation order (the order-based torch port relies on it)
    remat_blocks: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p = _KSP[self.upscale]
        nf = self.base_filter
        y = nchw_to_nhwc(x)
        y = _CB(self.feat, 3, 1, 1, dtype=self.dtype)(y)
        l = _CB(nf, 1, 1, 0, dtype=self.dtype)(y)

        # remat per projection block: the dense connectivity keeps
        # every stage's HR tensor alive by design (~32GB of live
        # activations at batch 64 / x8 / 128^2 — docs/BENCH_ANALYSIS);
        # recomputing block bodies bounds the per-conv backward
        # residuals to block boundaries at ~15% extra flops, giving
        # headroom at the chip-supported batch sizes (<= 32 on 16GB).
        if self.remat_blocks:
            Up = nn.remat(UpBlock, prevent_cse=False)
            Down = nn.remat(DownBlock, prevent_cse=False)
        else:
            Up, Down = UpBlock, DownBlock
        up1 = Up(nf, k, s, p, dtype=self.dtype, name='up1')
        down1 = Down(nf, k, s, p, dtype=self.dtype, name='down1')
        up2 = Up(nf, k, s, p, dtype=self.dtype, name='up2')
        down2 = Down(nf, k, s, p, 2, dtype=self.dtype, name='down2')
        up3 = Up(nf, k, s, p, 2, dtype=self.dtype, name='up3')
        down3 = Down(nf, k, s, p, 3, dtype=self.dtype, name='down3')
        up4 = Up(nf, k, s, p, 3, dtype=self.dtype, name='up4')
        down4 = Down(nf, k, s, p, 4, dtype=self.dtype, name='down4')
        up5 = Up(nf, k, s, p, 4, dtype=self.dtype, name='up5')
        down5 = Down(nf, k, s, p, 5, dtype=self.dtype, name='down5')
        up6 = Up(nf, k, s, p, 5, dtype=self.dtype, name='up6')
        down6 = Down(nf, k, s, p, 6, dtype=self.dtype, name='down6')
        up7 = Up(nf, k, s, p, 6, dtype=self.dtype, name='up7')

        results = []
        for _ in range(self.num_stages):
            h1 = up1(l)
            l1 = down1(h1)
            h2 = up2(l1)
            concat_h = jnp.concatenate([h2, h1], -1)
            l = down2(concat_h)
            concat_l = jnp.concatenate([l, l1], -1)
            h = up3(concat_l)
            concat_h = jnp.concatenate([h, concat_h], -1)
            l = down3(concat_h)
            concat_l = jnp.concatenate([l, concat_l], -1)
            h = up4(concat_l)
            concat_h = jnp.concatenate([h, concat_h], -1)
            l = down4(concat_h)
            concat_l = jnp.concatenate([l, concat_l], -1)
            h = up5(concat_l)
            concat_h = jnp.concatenate([h, concat_h], -1)
            l = down5(concat_h)
            concat_l = jnp.concatenate([l, concat_l], -1)
            h = up6(concat_l)
            concat_h = jnp.concatenate([h, concat_h], -1)
            l = down6(concat_h)
            concat_l = jnp.concatenate([l, concat_l], -1)
            h = up7(concat_l)
            results.append(h)

        out = jnp.concatenate(results, -1)
        out = StridedConv(self.in_chans, 3, 1, 1, dtype=self.dtype)(out)
        return {'out': nhwc_to_nchw(out)}
