"""SRFBN: super-resolution feedback network.

Capability parity with the reference (network_srfbn.py:586): LR feature
extraction (3x3 -> 4F, 1x1 -> F, PReLU), a FeedbackBlock (num_groups
up/down projection pairs with dense 1x1 transitions, hidden state fed
back across steps) unrolled num_steps times; every step emits
bilinear(x) + reconstruction and all step outputs feed the curriculum
loss (model_plain.loss_srfbn:202). Deconv kernel/stride/pad by scale:
x2 (6,2,2), x4 (8,4,2), x8 (12,8,2).
"""
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (ConvT, StridedConv, nchw_to_nhwc,
                                       nhwc_to_nchw)
from srcaco2_tpu.ops.resize import resize2d, BILINEAR

Dtype = Any

_KSP = {2: (6, 2, 2), 4: (8, 4, 2), 8: (12, 8, 2)}


class _CB(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = None     # None -> same
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.padding if self.padding is not None \
            else (self.kernel - 1) // 2
        y = StridedConv(self.features, self.kernel, self.stride, p,
                        dtype=self.dtype)(x)
        return nn.PReLU()(y) if self.act else y


class _DB(nn.Module):
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


class FeedbackBlock(nn.Module):
    num_features: int
    num_groups: int
    upscale: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hidden):
        k, s, p = _KSP[self.upscale]
        f = self.num_features
        y = jnp.concatenate([x, hidden], -1)
        y = _CB(f, 1, dtype=self.dtype, name='compress_in')(y)

        lr_feats = [y]
        hr_feats = []
        for idx in range(self.num_groups):
            ld_l = jnp.concatenate(lr_feats, -1)
            if idx > 0:
                ld_l = _CB(f, 1, dtype=self.dtype,
                           name=f'uptran{idx}')(ld_l)
            ld_h = _DB(f, k, s, p, dtype=self.dtype,
                       name=f'up{idx}')(ld_l)
            hr_feats.append(ld_h)
            ld_h2 = jnp.concatenate(hr_feats, -1)
            if idx > 0:
                ld_h2 = _CB(f, 1, dtype=self.dtype,
                            name=f'downtran{idx}')(ld_h2)
            ld_l2 = _CB(f, k, s, p, dtype=self.dtype,
                        name=f'down{idx}')(ld_h2)
            lr_feats.append(ld_l2)

        out = jnp.concatenate(lr_feats[1:], -1)
        out = _CB(f, 1, dtype=self.dtype, name='compress_out')(out)
        return out


class SRFBN(nn.Module):
    in_chans: int = 1
    upscale: int = 2
    num_features: int = 64
    num_steps: int = 4
    num_groups: int = 6
    # remat each feedback-step application: the dense in-block
    # connectivity (6 groups of big strided deconv/conv pairs, all
    # hr_feats kept alive) OOMs the 16 GB chip above batch 16 at x8;
    # per-step remat lifts the supported batch to 32 — but measured
    # throughput is 180 p/s at 32 vs 194 p/s at 16 without remat
    # (recompute cancels the batching gain; the net is relayout-bound,
    # docs/THROUGHPUT.md), so the default stays off. Same port caveat
    # as DBPN (models/dbpn.py): creation-order weight porting needs
    # remat_steps=False.
    remat_steps: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p = _KSP[self.upscale]
        f = self.num_features
        h_in, w_in = x.shape[-2], x.shape[-1]
        inter_res = resize2d(x, (h_in * self.upscale, w_in * self.upscale),
                             method=BILINEAR)
        y = nchw_to_nhwc(x)
        y = _CB(4 * f, 3, dtype=self.dtype, name='conv_in')(y)
        y = _CB(f, 1, dtype=self.dtype, name='feat_in')(y)

        fb_cls = nn.remat(FeedbackBlock, prevent_cse=False) \
            if self.remat_steps else FeedbackBlock
        block = fb_cls(f, self.num_groups, self.upscale,
                       dtype=self.dtype, name='feedback')
        out_deconv = _DB(f, k, s, p, dtype=self.dtype, name='out')
        conv_out = _CB(self.in_chans, 3, act=False, dtype=self.dtype,
                       name='conv_out')

        hidden = y  # reset: hidden initialized from the input features
        outs = []
        for _ in range(self.num_steps):
            hidden = block(y, hidden)
            rec = conv_out(out_deconv(hidden))
            outs.append(inter_res + nhwc_to_nchw(rec))

        return {'out': outs[-1], 'intermediate_outs': outs}
