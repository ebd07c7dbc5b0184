"""Shared model building blocks (flax.linen, NHWC internals).

The reference duplicates MeanShift/ResBlock/Upsampler/default_conv across
network files (e.g. network_nlsn.py:38-130); here they are unified. All
models take NCHW batches at the API boundary (reference dict layout) and
compute in NHWC, the TPU-native conv layout.
"""
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def nchw_to_nhwc(x):
    return x.transpose(0, 2, 3, 1)


def nhwc_to_nchw(x):
    return x.transpose(0, 3, 1, 2)


class Conv(nn.Module):
    """3x3-style conv with 'SAME' torch-like padding."""
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(
        1.0, 'fan_in', 'uniform')  # torch Conv2d default (kaiming-uniform)

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[(pad, pad), (pad, pad)],
                       use_bias=self.use_bias, dtype=self.dtype,
                       kernel_init=self.kernel_init)(x)


class MeanShift(nn.Module):
    """Subtract/add a fixed channel mean scaled by img_range (EDSR-family
    preprocessing)."""
    rgb_mean: Sequence[float]
    sign: float = -1.0
    img_range: float = 1.0

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, x.dtype) * self.img_range
        return x + self.sign * mean


class ResBlock(nn.Module):
    """conv-act-conv with residual scaling (EDSR-style)."""
    features: int
    kernel: int = 3
    res_scale: float = 1.0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv(self.features, self.kernel, use_bias=self.use_bias,
                 dtype=self.dtype)(x)
        h = nn.relu(h)
        h = Conv(self.features, self.kernel, use_bias=self.use_bias,
                 dtype=self.dtype)(h)
        return x + h * self.res_scale


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """Depth-to-space on NHWC: (B,H,W,C*r^2) -> (B,H*r,W*r,C).

    Channel order matches torch.nn.PixelShuffle: input channel index
    c*r^2 + dy*r + dx maps to output channel c at spatial offset (dy,dx).
    """
    b, h, w, c = x.shape
    r = factor
    oc = c // (r * r)
    x = x.reshape(b, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)       # b, h, r, w, r, oc
    return x.reshape(b, h * r, w * r, oc)


class Upsampler(nn.Module):
    """Pixel-shuffle upsampler: xN in factor-of-2 steps (or one x3 step)."""
    scale: int
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.scale
        if s == 1:
            return x
        if (s & (s - 1)) == 0:  # power of two
            steps = s.bit_length() - 1
            for _ in range(steps):
                x = Conv(4 * self.features, 3, dtype=self.dtype)(x)
                x = pixel_shuffle(x, 2)
            return x
        if s == 3:
            x = Conv(9 * self.features, 3, dtype=self.dtype)(x)
            return pixel_shuffle(x, 3)
        raise NotImplementedError(s)


class UpsamplerDirect(nn.Module):
    """One-step conv -> pixel-shuffle straight to out_chans (SwinIR's
    'pixelshuffledirect', lightweight)."""
    scale: int
    out_chans: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.out_chans * self.scale ** 2, 3, dtype=self.dtype)(x)
        return pixel_shuffle(x, self.scale)


def bicubic_up(x_nchw: jax.Array, scale: int, clip: bool = True):
    """Internal bicubic pre-upsampling used by VDSR/DRRN/MemNet
    (torch F.interpolate parity)."""
    from srcaco2_tpu.ops.resize import resize2d
    h, w = x_nchw.shape[-2], x_nchw.shape[-1]
    y = resize2d(x_nchw, (h * scale, w * scale))
    return jnp.clip(y, 0.0, 1.0) if clip else y


class StridedConv(nn.Module):
    """torch-style strided conv: explicit symmetric padding."""
    features: int
    kernel: int
    stride: int
    padding: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.padding
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[(p, p), (p, p)], use_bias=self.use_bias,
                       dtype=self.dtype)(x)


class ConvT(nn.Module):
    """torch ConvTranspose2d equivalent: full ('VALID') transpose conv,
    then crop `padding` from each side — out = in*stride when
    kernel - 2*padding == stride. `output_padding` follows torch: it
    extends the OUTPUT at the bottom/right, i.e. the crop there shrinks
    to padding - output_padding (e.g. the reference UNet/X2 deconvs,
    network_unet2.py:44 / network_deconv.py: k3 s2 p1 op1)."""
    features: int
    kernel: int
    stride: int
    padding: int
    output_padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(
        1.0, 'fan_in', 'uniform')

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(self.features, (self.kernel, self.kernel),
                             strides=(self.stride, self.stride),
                             padding='VALID', use_bias=self.use_bias,
                             dtype=self.dtype,
                             kernel_init=self.kernel_init)(x)
        p, q = self.padding, self.padding - self.output_padding
        assert q >= 0, (self.padding, self.output_padding)
        if p or q:
            y = y[:, p:y.shape[1] - q, p:y.shape[2] - q, :]
        return y


def bilinear_upsample_init(size: int):
    """Bilinear-filter initializer for transposed convs (MSLapSRN's
    get_upsample_filter analog): kernel (H,W,O,I) filled with the same
    2D bilinear filter."""
    factor = (size + 1) // 2
    center = factor - 1 if size % 2 == 1 else factor - 0.5
    og = jnp.arange(size, dtype=jnp.float32)
    f1 = 1.0 - jnp.abs(og - center) / factor
    filt = f1[:, None] * f1[None, :]

    def init(key, shape, dtype=jnp.float32):
        h, w = shape[0], shape[1]
        assert h == size and w == size, (shape, size)
        return jnp.broadcast_to(filt[:, :, None, None],
                                shape).astype(dtype)
    return init


class ConvReLU(nn.Module):
    features: int
    kernel: int = 3
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.relu(Conv(self.features, self.kernel,
                            use_bias=self.use_bias, dtype=self.dtype)(x))
