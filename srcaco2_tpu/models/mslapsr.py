"""MS-LapSRN: multi-scale deep Laplacian pyramid SR.

Capability parity with the reference (network_mslapsr.py:67): log2(scale)
pyramid stages; each stage = 10 conv+lrelu layers + deconv x2 on the
feature path, a 1-channel deconv x2 on the image path (bilinear-filter
init, get_upsample_filter:38), and a conv producing the stage residual;
intermediate per-stage predictions are exposed for the progressive loss
(model_plain.loss_mslaprs:277).
"""
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (ConvT, StridedConv,
                                       bilinear_upsample_init,
                                       nchw_to_nhwc, nhwc_to_nchw)

Dtype = Any


class _FeatStage(nn.Module):
    """10 conv+lrelu + deconv-x2 + lrelu feature branch."""
    features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(10):
            x = nn.leaky_relu(
                StridedConv(self.features, 3, 1, 1,
                            dtype=self.dtype)(x), 0.2)
        x = ConvT(self.features, 4, 2, 1, dtype=self.dtype,
                  kernel_init=bilinear_upsample_init(4))(x)
        return nn.leaky_relu(x, 0.2)


class MSLapSRN(nn.Module):
    in_chans: int = 1
    upscale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.upscale in (2, 4, 8), self.upscale
        y = nchw_to_nhwc(x)
        feat = nn.leaky_relu(
            StridedConv(64, 3, 1, 1, dtype=self.dtype)(y), 0.2)

        img_up = ConvT(self.in_chans, 4, 2, 1, dtype=self.dtype,
                       kernel_init=bilinear_upsample_init(4),
                       name='img_up1')
        feat1 = _FeatStage(dtype=self.dtype, name='feat_stage1')(feat)
        out1 = img_up(y) + StridedConv(self.in_chans, 3, 1, 1,
                                       dtype=self.dtype,
                                       name='res1')(feat1)
        outs = [out1]
        if self.upscale >= 4:
            feat2 = _FeatStage(dtype=self.dtype,
                               name='feat_stage2')(feat1)
            out2 = ConvT(self.in_chans, 4, 2, 1, dtype=self.dtype,
                         kernel_init=bilinear_upsample_init(4),
                         name='img_up2')(out1) \
                + StridedConv(self.in_chans, 3, 1, 1, dtype=self.dtype,
                              name='res2')(feat2)
            outs.append(out2)
        if self.upscale == 8:
            feat3 = _FeatStage(dtype=self.dtype,
                               name='feat_stage3')(feat2)
            out3 = ConvT(self.in_chans, 4, 2, 1, dtype=self.dtype,
                         kernel_init=bilinear_upsample_init(4),
                         name='img_up3')(out2) \
                + StridedConv(self.in_chans, 3, 1, 1, dtype=self.dtype,
                              name='res3')(feat3)
            outs.append(out3)

        final = nhwc_to_nchw(outs[-1])
        inter = [nhwc_to_nchw(o) for o in outs[:-1]]
        return {'out': final, 'intermediate_outs': inter}
