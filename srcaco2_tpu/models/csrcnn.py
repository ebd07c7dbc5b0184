"""CSR-CNN: constrained super-resolution CNN (the reference author's
research model) — three variants behind one dispatcher:

  * 'unet' (default): encoder/decoder UNet on the bicubic pre-upscaled
    input, optional segmentation head producing per-color logits +
    expected-value prediction (network_unet2.py:80);
  * 'pyramid': X2 deconv net taking the raw LR (network_deconv.py:78,
    Pyramid:223 wraps X2);
  * 'snet_type*': small grouped-conv CNN with internal bicubic upscale
    (network_csr_cnn.py:132, ConstrainedSupResCnn).

Exposes x_interp / global_residual (+ raw_segmentation for the
segmentation net_task, consumed by the CE loss).
"""
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu import constants
from srcaco2_tpu.models.blocks import (ConvT, StridedConv, bicubic_up,
                                       nchw_to_nhwc, nhwc_to_nchw)
from srcaco2_tpu.ops.resize import resize2d, BILINEAR

Dtype = Any


def _conv(f, k, s=1, dtype=jnp.float32):
    p = (k - 1) // 2
    return StridedConv(f, k, s, p, dtype=dtype)


class _Res5(nn.Module):
    """Conv-relu-conv residual with kernel k."""
    f: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_conv(self.f, self.k, dtype=self.dtype)(x))
        y = _conv(self.f, self.k, dtype=self.dtype)(y)
        return x + y


class UNetSR(nn.Module):
    upscale: int
    in_channel: int
    out_channel: int
    outksz: int = 3
    inner_channel: int = 32
    res_blocks: int = 3
    use_global_residual: bool = True
    task: str = constants.REGRESSION
    color_max: int = 255
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: NCHW at HR size (the wrapper feeds l_to_h_img).
        ic = self.inner_channel
        y = nchw_to_nhwc(x)

        def stack(z, f, n, k=5, stride=1):
            z = nn.relu(_conv(f, k, stride, dtype=self.dtype)(z))
            for _ in range(n):
                z = _Res5(f, k, dtype=self.dtype)(z)
            return z

        feat = stack(y, ic, 3)
        inb = stack(feat, ic, 3)
        enc1 = stack(inb, ic * 2, 3, stride=2)
        enc2 = stack(enc1, ic * 4, 3, stride=2)
        dec2 = enc2
        for _ in range(self.res_blocks):
            dec2 = _Res5(ic * 4, dtype=self.dtype)(dec2)
        # reference Deconv: k3 s2 p1 output_padding1 (network_unet2.py)
        dec2 = nn.relu(ConvT(ic * 2, 3, 2, 1, output_padding=1,
                             dtype=self.dtype)(dec2))
        dec1 = dec2 + enc1
        for _ in range(self.res_blocks):
            dec1 = _Res5(ic * 2, dtype=self.dtype)(dec1)
        dec1 = nn.relu(ConvT(ic, 3, 2, 1, output_padding=1,
                             dtype=self.dtype)(dec1))
        outb = dec1 + inb
        for _ in range(self.res_blocks):
            outb = _Res5(ic, dtype=self.dtype)(outb)
        n_out = self.out_channel if self.task == constants.REGRESSION \
            else self.color_max + 1
        out = _conv(n_out, self.outksz, dtype=self.dtype)(outb)
        out = nhwc_to_nchw(out)

        res = {'x_interp': x}
        if self.task == constants.REGRESSION:
            if self.use_global_residual:
                res['global_residual'] = out
                out = out + x
            res['out'] = out
        else:
            res['raw_segmentation'] = out
            colors = jnp.arange(self.color_max + 1,
                                dtype=jnp.float32).reshape(1, -1, 1, 1)
            expected = (jax.nn.softmax(out, axis=1) * colors
                        ).sum(axis=1, keepdims=True)
            expected = expected / float(self.color_max)
            if train:
                res['out'] = expected
            else:
                res['out'] = jnp.argmax(out, axis=1, keepdims=True) \
                    / float(self.color_max)
            res['expected_pred'] = expected
        return res


class PyramidSR(nn.Module):
    """X2 deconv net on the raw LR (only x2 supported upstream)."""
    in_channel: int
    out_channel: int
    outksz: int = 3
    inner_channel: int = 32
    res_blocks: int = 3
    use_global_residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ic = self.inner_channel
        z = self.res_blocks
        h, w = x.shape[-2], x.shape[-1]
        x_interp = resize2d(x, (h * 2, w * 2), method=BILINEAR)
        y = nchw_to_nhwc(x)

        def group(y, f, k):
            y = nn.relu(_conv(f, k, dtype=self.dtype)(y))
            for _ in range(z):
                y = _Res5(f, 1, dtype=self.dtype)(y)
            return y

        y = group(y, ic, 3)
        y = group(y, ic, 1)
        y = group(y, ic * 2, 1)
        y = group(y, ic * 4, 1)
        # reference Deconv: k3 s2 p1 output_padding1 (network_deconv.py)
        y = nn.relu(ConvT(ic * 2, 3, 2, 1, output_padding=1,
                          dtype=self.dtype)(y))
        y = group(y, ic * 2, 3)
        y = group(y, ic * 2, 1)
        y = group(y, ic * 2, 1)
        y = group(y, ic * 4, 1)
        out = _conv(self.out_channel, self.outksz, dtype=self.dtype)(y)
        out = nhwc_to_nchw(out)
        res = {'x_interp': x_interp}
        if self.use_global_residual:
            res['global_residual'] = out
            out = out + x_interp
        res['out'] = out
        return res


class SmallCSRCNN(nn.Module):
    """Grouped 1x1 CNN with internal bicubic upscale
    (ConstrainedSupResCnn)."""
    upscale: int
    in_planes: int
    h_layers: tuple
    in_ksz: int = 3
    ngroups: int = 16
    use_local_residual: bool = False
    use_global_residual: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_up = bicubic_up(x, self.upscale)
        y = nchw_to_nhwc(x_up)

        def layer(z, out_c, k, groups, act):
            p = (k - 1) // 2
            g = groups if z.shape[-1] % groups == 0 and \
                out_c % groups == 0 else 1
            zin = z
            if p:
                # reference _full_conv uses padding_mode='reflect'
                # (network_csr_cnn.py:_full_conv)
                zin = jnp.pad(z, ((0, 0), (p, p), (p, p), (0, 0)),
                              mode='reflect')
            out = nn.Conv(out_c, (k, k), padding='VALID',
                          feature_group_count=g, dtype=self.dtype)(zin)
            if self.use_local_residual:
                out = nn.relu(out)
                if z.shape[-1] != out_c:
                    z = nn.Conv(out_c, (1, 1), feature_group_count=g,
                                dtype=self.dtype)(z)
                out = out + z
            return act(out)

        h = layer(y, self.h_layers[0], self.in_ksz, 1, nn.relu)
        for out_c in self.h_layers[1:]:
            h = layer(h, out_c, 1, self.ngroups, nn.relu)
        out = layer(h, self.in_planes, 1, 1, lambda v: v)
        out = nhwc_to_nchw(out)
        res = {'x_interp': x_up}
        if self.use_global_residual:
            res['global_residual'] = out
            out = out + x_up
        res['out'] = out
        return res


class CSRCNN(nn.Module):
    """Dispatcher matching select_network.py:225."""
    in_planes: int = 1
    upscale: int = 2
    net_type: str = constants.NET_TYPE_UNET
    in_ksz: int = 3
    ngroups: int = 16
    inner_channel: int = 32
    norm_groups: int = 16
    channel_mults: str = '1_2_4_8_16_32_32_32'
    res_blocks: int = 3
    dropout: float = 0.0
    use_global_residual: bool = True
    use_local_residual: bool = False
    net_task: str = constants.REGRESSION
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.net_type == constants.NET_TYPE_UNET:
            return UNetSR(self.upscale, self.in_planes, self.in_planes,
                          3, self.inner_channel, self.res_blocks,
                          self.use_global_residual, self.net_task,
                          dtype=self.dtype, name='unet')(x, train)
        if self.net_type == constants.NET_TYPE_PYRAMID:
            return PyramidSR(self.in_planes, self.in_planes, 3,
                             self.inner_channel, self.res_blocks,
                             self.use_global_residual,
                             dtype=self.dtype, name='pyramid')(x, train)
        h_layers = tuple(constants.NETS_CNN[self.net_type]) \
            if self.net_type in constants.NETS_CNN else (32,)
        # fed the bicubic pre-upscale like the unet variant
        # (model_plain.py:186), so no internal upscale (upscale=1).
        return SmallCSRCNN(1, self.in_planes, h_layers,
                           self.in_ksz, self.ngroups,
                           self.use_local_residual,
                           self.use_global_residual,
                           dtype=self.dtype, name='smallcnn')(x, train)
