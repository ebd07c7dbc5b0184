"""EDSR + LIIF: implicit neural representation SR.

The reference imports dlib.models.network_edsr_liif which is ABSENT from
the repo (select_network.py:40 — SURVEY §2.4); rebuilt here from the LIIF
paper (Chen et al., CVPR 2021, "Learning Continuous Image Representation
with Local Implicit Image Function") with the dispatch signature's flags
(local_ensemble / feat_unfold / cell_decode all True) and an EDSR
backbone (16 resblocks, 64 feats, res_scale 1, no upsampling head).

TPU notes: the HR query grid is static per shape, so the latent gather is
a batched take-along-axis and the 4-way local ensemble unrolls into four
gathers + one fused MLP over (B, H*W*4) query tokens — all MXU matmuls.
"""
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (Conv, ResBlock, nchw_to_nhwc,
                                       nhwc_to_nchw)

Dtype = Any


class EDSREncoder(nn.Module):
    n_feats: int = 64
    n_resblocks: int = 16
    res_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv(self.n_feats, 3, dtype=self.dtype)(x)
        res = y
        for _ in range(self.n_resblocks):
            res = ResBlock(self.n_feats, 3, res_scale=self.res_scale,
                           dtype=self.dtype)(res)
        res = Conv(self.n_feats, 3, dtype=self.dtype)(res)
        return y + res


class LIIFDecoder(nn.Module):
    """5-layer 256-wide MLP on [latent(+unfold), rel coords, cell]."""
    hidden: int = 256
    out_dim: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        y = feats
        for _ in range(4):
            y = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(y))
        return nn.Dense(self.out_dim, dtype=self.dtype)(y)


class EDSRLIIF(nn.Module):
    in_chans: int = 1
    upscale: int = 2
    n_feats: int = 64
    n_resblocks: int = 16
    res_scale: float = 1.0
    local_ensemble: bool = True
    feat_unfold: bool = True
    cell_decode: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nchw_to_nhwc(x)
        b, hl, wl, _ = y.shape
        feat = EDSREncoder(self.n_feats, self.n_resblocks,
                           self.res_scale, dtype=self.dtype)(y)
        c = self.n_feats
        if self.feat_unfold:
            # 3x3 neighborhood concat -> C*9
            fp = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         mode='edge')
            neigh = [fp[:, 1 + dy:1 + dy + hl, 1 + dx:1 + dx + wl]
                     for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
            feat = jnp.concatenate(neigh, axis=-1)
            c = c * 9

        s = self.upscale
        hh, wh = hl * s, wl * s
        # HR query coords in [-1,1] (cell centers), LR latent coords too.
        yq = (np.arange(hh) + 0.5) / hh * 2 - 1
        xq = (np.arange(wh) + 0.5) / wh * 2 - 1
        yl = (np.arange(hl) + 0.5) / hl * 2 - 1
        xl = (np.arange(wl) + 0.5) / wl * 2 - 1
        ry = 1.0 / hl   # half latent cell in [-1,1] units = 1/hl
        rx = 1.0 / wl

        # nearest latent index for each query along each axis
        iy0 = np.clip(((yq + 1) / 2 * hl - 0.5), 0, hl - 1)
        ix0 = np.clip(((xq + 1) / 2 * wl - 0.5), 0, wl - 1)

        offsets = [(-1, -1), (-1, 1), (1, -1), (1, 1)] \
            if self.local_ensemble else [(0, 0)]
        decoder = LIIFDecoder(256, self.in_chans, dtype=self.dtype,
                              name='decoder')   # shared across ensemble
        preds = []
        areas = []
        cell = np.array([2.0 / hh, 2.0 / wh], np.float32)
        for vy, vx in offsets:
            iy = np.clip(np.round(iy0 + vy * 0.5), 0,
                         hl - 1).astype(np.int32)
            ix = np.clip(np.round(ix0 + vx * 0.5), 0,
                         wl - 1).astype(np.int32)
            lat = feat[:, iy][:, :, ix]                # B, hh, wh, C
            lat_y = jnp.asarray(yl[iy], jnp.float32)
            lat_x = jnp.asarray(xl[ix], jnp.float32)
            rel_y = (jnp.asarray(yq, jnp.float32) - lat_y) * hl
            rel_x = (jnp.asarray(xq, jnp.float32) - lat_x) * wl
            rel = jnp.stack(jnp.meshgrid(rel_y, rel_x, indexing='ij'),
                            axis=-1)                   # hh, wh, 2
            rel_b = jnp.broadcast_to(rel[None], (b, hh, wh, 2)
                                     ).astype(feat.dtype)
            inp = [lat, rel_b]
            if self.cell_decode:
                cvec = jnp.asarray([cell[0] * hl, cell[1] * wl],
                                   jnp.float32)
                inp.append(jnp.broadcast_to(
                    cvec[None, None, None], (b, hh, wh, 2)
                ).astype(feat.dtype))
            q = jnp.concatenate(inp, axis=-1)
            pred = decoder(q)
            preds.append(pred)
            area = jnp.abs(rel[..., 0] / hl * rel[..., 1] / wl) + 1e-9
            areas.append(area)

        if self.local_ensemble:
            # swap diagonal areas (LIIF trick) and normalize
            areas = [areas[3], areas[2], areas[1], areas[0]]
            tot = sum(areas)
            out = sum(p * (a / tot)[None, ..., None]
                      for p, a in zip(preds, areas))
        else:
            out = preds[0]
        return {'out': nhwc_to_nchw(out)}
