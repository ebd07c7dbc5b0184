"""DFCAN: deep Fourier channel attention network (microscopy SR).

Capability parity with the reference (network_dfcan.py:89): 4 ResGroups x
4 RCABs of 64 channels; each RCAB computes channel attention from the
fft-magnitude (|FFT|^0.8, fftshifted) of its features; pixel-shuffle
upsampling; sigmoid output. jnp.fft runs natively on TPU.
"""
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (Conv, nchw_to_nhwc, nhwc_to_nchw,
                                       pixel_shuffle)

Dtype = Any


def fftshift2d(x: jnp.ndarray) -> jnp.ndarray:
    """Quadrant swap on (B, H, W, C) (reference: fftshift2d:27)."""
    h, w = x.shape[1], x.shape[2]
    fs11 = x[:, h // 2:, w // 2:]
    fs12 = x[:, h // 2:, :w // 2]
    fs21 = x[:, :h // 2, w // 2:]
    fs22 = x[:, :h // 2, :w // 2]
    top = jnp.concatenate([fs11, fs21], axis=1)
    bot = jnp.concatenate([fs12, fs22], axis=1)
    return jnp.concatenate([top, bot], axis=2)


class RCAB(nn.Module):
    features: int = 64
    gamma: float = 0.8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x0 = x
        y = nn.gelu(Conv(self.features, 3, dtype=self.dtype)(x))
        y = nn.gelu(Conv(self.features, 3, dtype=self.dtype)(y))
        x1 = y
        # Fourier magnitude attention (f32 for the FFT, then back).
        f = jnp.fft.fftn(y.astype(jnp.complex64), axes=(1, 2))
        f = jnp.power(jnp.abs(f) + 1e-8, self.gamma).astype(y.dtype)
        f = fftshift2d(f)
        f = nn.relu(Conv(self.features, 3, dtype=self.dtype)(f))
        f = f.mean(axis=(1, 2), keepdims=True)          # global avg pool
        f = nn.relu(Conv(4, 1, dtype=self.dtype)(f))
        f = nn.sigmoid(Conv(self.features, 1, dtype=self.dtype)(f))
        return x0 + x1 * f


class ResGroup(nn.Module):
    n_rcab: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x0 = x
        for _ in range(self.n_rcab):
            x = RCAB(dtype=self.dtype)(x)
        return x0 + x


class DFCAN(nn.Module):
    in_chans: int = 1
    upscale: int = 2
    n_resgroups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nchw_to_nhwc(x)
        y = nn.gelu(Conv(64, 3, dtype=self.dtype)(y))
        for _ in range(self.n_resgroups):
            y = ResGroup(n_rcab=self.n_resgroups, dtype=self.dtype)(y)
        y = nn.gelu(Conv(64 * self.upscale ** 2, 3, dtype=self.dtype)(y))
        y = pixel_shuffle(y, self.upscale)
        y = nn.sigmoid(Conv(self.in_chans, 3, dtype=self.dtype)(y))
        return {'out': nhwc_to_nchw(y)}
