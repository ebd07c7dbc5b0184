"""ENLCN: efficient non-local contrastive network.

Capability parity with the reference (network_enlcn.py:369 — EDSR body of
32 ResBlocks with ENLCA efficient non-local attention before the body and
after every 8th block). ENLCA (network_enlcn.py:319) is kernelized
(Performer-style) linear attention: q/k l2-normalized * sqrt(6), softmax
kernel features with a gaussian-orthogonal random projection (128
features), then O(N) linear attention. The reference drops the
contrastive auxiliary loss (network_enlcn.py:431 "does not add much
improvement") — so do we.
"""
import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (Conv, ResBlock, Upsampler,
                                       nchw_to_nhwc, nhwc_to_nchw)

Dtype = Any


def gaussian_orthogonal_random_matrix(key, nb_rows: int, nb_cols: int
                                      ) -> jnp.ndarray:
    """Stacked orthogonalized gaussian blocks with chi-distributed row
    norms (Performer FAVOR+)."""
    nb_full = nb_rows // nb_cols
    blocks = []
    keys = jax.random.split(key, nb_full + 2)
    for i in range(nb_full):
        g = jax.random.normal(keys[i], (nb_cols, nb_cols))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T)
    rem = nb_rows - nb_full * nb_cols
    if rem > 0:
        g = jax.random.normal(keys[nb_full], (nb_cols, nb_cols))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T[:rem])
    mat = jnp.concatenate(blocks, axis=0)
    norms = jnp.linalg.norm(
        jax.random.normal(keys[-1], (nb_rows, nb_cols)), axis=1)
    return mat * norms[:, None]


def softmax_kernel(x, projection, eps: float = 1e-4):
    """phi(x) = ratio * (exp(x P^T - |x|^2/2) + eps); x: (..., n, d)."""
    ratio = projection.shape[0] ** -0.5
    dash = jnp.einsum('...id,jd->...ij', x, projection)
    diag = (x ** 2).sum(-1, keepdims=True) / 2.0
    return ratio * (jnp.exp(dash - diag) + eps)


def linear_attention(q, k, v):
    k_sum = k.sum(axis=-2)
    d_inv = 1.0 / jnp.einsum('...nd,...d->...n', q, k_sum)
    context = jnp.einsum('...nd,...ne->...de', k, v)
    return jnp.einsum('...de,...nd,...n->...ne', context, q, d_inv)


class ENLCA(nn.Module):
    channels: int
    reduction: int = 4
    res_scale: float = 0.1
    nb_features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        L = h * w
        rc = self.channels // self.reduction
        q = Conv(rc, 1, dtype=self.dtype, name='conv_match1')(x)
        k = Conv(rc, 1, dtype=self.dtype, name='conv_match2')(x)
        v = Conv(self.channels, 1, dtype=self.dtype,
                 name='conv_assembly')(x)
        kk = math.sqrt(6.0)
        q = q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True)
                         + 2.5e-9) * kk
        k = k / jnp.sqrt(jnp.sum(k * k, axis=-1, keepdims=True)
                         + 2.5e-9) * kk
        # fixed gaussian-orthogonal projection (the reference keeps a
        # buffer drawn at init; we derive it from a constant key so it is
        # identical across steps and hosts).
        proj = gaussian_orthogonal_random_matrix(
            jax.random.key(42), self.nb_features, rc).astype(q.dtype)
        qf = softmax_kernel(q.reshape(b, L, rc), proj)
        kf = softmax_kernel(k.reshape(b, L, rc), proj)
        out = linear_attention(qf, kf, v.reshape(b, L, self.channels))
        return out.reshape(b, h, w, self.channels) * self.res_scale + x


class ENLCN(nn.Module):
    in_chans: int = 1
    upscale: int = 2
    n_resblocks: int = 32
    n_feats: int = 256
    res_scale: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nchw_to_nhwc(x)
        y = Conv(self.n_feats, 3, dtype=self.dtype, name='head')(y)
        res = ENLCA(self.n_feats, 4, self.res_scale,
                    dtype=self.dtype)(y)
        for i in range(self.n_resblocks):
            res = ResBlock(self.n_feats, 3, res_scale=self.res_scale,
                           dtype=self.dtype)(res)
            if (i + 1) % 8 == 0:
                res = ENLCA(self.n_feats, 4, self.res_scale,
                            dtype=self.dtype)(res)
        res = Conv(self.n_feats, 3, dtype=self.dtype)(res)
        y = y + res
        y = Upsampler(self.upscale, self.n_feats, dtype=self.dtype)(y)
        y = Conv(self.in_chans, 3, dtype=self.dtype, name='tail')(y)
        return {'out': nhwc_to_nchw(y)}
