"""EDSR + LIIF: implicit neural representation SR.

The reference imports dlib.models.network_edsr_liif which is ABSENT from
the repo (select_network.py:40 — SURVEY §2.4); rebuilt here from the LIIF
paper (Chen et al., CVPR 2021, "Learning Continuous Image Representation
with Local Implicit Image Function") with the dispatch signature's flags
(local_ensemble / feat_unfold / cell_decode all True) and an EDSR
backbone (16 resblocks, 64 feats, res_scale 1, no upsampling head).

TPU-first decoder layout (exact LIIF math, reorganized for the MXU):

  * The decoder's FIRST layer is linear in [unfold(feat), rel, cell],
    and the per-query latent gather is per-position, so
    W_f @ gather(unfold(feat)) == gather(conv3x3(feat; W_f)): the 9xC
    feat_unfold concat + first matmul run ONCE in LR space as a 3x3
    convolution (edge-padded like the unfold), dividing the
    first-layer FLOPs by upscale^2 and shrinking the 4 ensemble
    gathers from 9C to `hidden` channels.
  * rel/cell are query-grid constants shared across the batch; their
    first-layer contribution is a tiny (4 -> hidden) matmul computed
    once per ensemble branch at (hh, wh, hidden) and broadcast.
  * The remaining MLP tail runs as ONE call over the 4 stacked
    ensemble branches ((4B, hh, wh, hidden) query tokens) instead of
    4 sequential calls.

tests/test_models_zoo2.py::test_edsr_liif_factored_decoder_exact
verifies the factorization against the naive unfold+concat decoder.
"""
import os
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (Conv, ResBlock, nchw_to_nhwc,
                                       nhwc_to_nchw)

Dtype = Any


def _ensemble_gather(z, iy, ix):
    """lat[b, p, q, c] = z[b, iy[p], ix[q], c] for STATIC index
    vectors. Default: constant one-hot MXU matmuls (exact — 0/1
    weights; the VJP becomes a transposed matmul), the NLSN
    permute_rows trick applied to the LIIF upsample pattern —
    measured +36% train throughput over the take path on v5e
    (scripts/perf_liif_ab.py: 514 -> 700 patches/s at the zoo bench
    config). SRCACO2_LIIF_ONEHOT=0 restores the row/col takes (XLA
    static gathers whose VJP is a scatter-add)."""
    if os.environ.get('SRCACO2_LIIF_ONEHOT', '1') == '1':
        hl, wl = z.shape[1], z.shape[2]
        oy = jnp.asarray(np.eye(hl, dtype=np.float32)[iy], z.dtype)
        ox = jnp.asarray(np.eye(wl, dtype=np.float32)[ix], z.dtype)
        # HIGHEST keeps the 0/1-factor products exact when z is f32:
        # the TPU backend's DEFAULT precision routes f32 dots through
        # one bf16 pass, which would round every gathered latent
        # (bf16 operands are a single pass either way, so AMP keeps
        # the measured throughput win).
        hi = jax.lax.Precision.HIGHEST
        zp = jnp.einsum('ph,bhwc->bpwc', oy, z, precision=hi)
        return jnp.einsum('qw,bpwc->bpqc', ox, zp, precision=hi)
    return z[:, iy][:, :, ix]


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


class LIIFDecoderTail(nn.Module):
    """Decoder layers 2..5 (the first layer is factored into LR-space
    conv + rel/cell matmul, see module docstring). Input is already
    pre-activation of layer 1."""
    hidden: int = 256
    out_dim: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pre1):
        y = nn.relu(pre1)
        for _ in range(3):
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
    hidden: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nchw_to_nhwc(x)
        b, hl, wl, _ = y.shape
        feat = EDSREncoder(self.n_feats, self.n_resblocks,
                           self.res_scale, dtype=self.dtype)(y)

        # first decoder layer, latent part: conv == W_f @ unfold(feat)
        # (edge pad matches the unfold's edge-replicated borders).
        if self.feat_unfold:
            fp = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         mode='edge')
            z = nn.Conv(self.hidden, (3, 3), padding='VALID',
                        dtype=self.dtype, name='dec_feat')(fp)
        else:
            z = nn.Conv(self.hidden, (1, 1), padding='VALID',
                        dtype=self.dtype, name='dec_feat')(feat)

        s = self.upscale
        hh, wh = hl * s, wl * s
        yq = (np.arange(hh) + 0.5) / hh * 2 - 1
        xq = (np.arange(wh) + 0.5) / wh * 2 - 1
        yl = (np.arange(hl) + 0.5) / hl * 2 - 1
        xl = (np.arange(wl) + 0.5) / wl * 2 - 1

        iy0 = np.clip(((yq + 1) / 2 * hl - 0.5), 0, hl - 1)
        ix0 = np.clip(((xq + 1) / 2 * wl - 0.5), 0, wl - 1)

        offsets = [(-1, -1), (-1, 1), (1, -1), (1, 1)] \
            if self.local_ensemble else [(0, 0)]
        # first-layer rel(+cell) part: (2 or 4) -> hidden, bias-free
        # (dec_feat's bias already covers the layer bias)
        rc_dim = 4 if self.cell_decode else 2
        dense_rc = nn.Dense(self.hidden, use_bias=False,
                            dtype=self.dtype, name='dec_relcell')
        tail = LIIFDecoderTail(self.hidden, self.in_chans,
                               dtype=self.dtype, name='decoder')
        cell = np.array([2.0 / hh * hl, 2.0 / wh * wl], np.float32)

        pre1s, areas = [], []
        for vy, vx in offsets:
            iy = np.clip(np.round(iy0 + vy * 0.5), 0,
                         hl - 1).astype(np.int32)
            ix = np.clip(np.round(ix0 + vx * 0.5), 0,
                         wl - 1).astype(np.int32)
            lat = _ensemble_gather(z, iy, ix)         # B, hh, wh, hid
            rel_y = (yq - yl[iy]) * hl
            rel_x = (xq - xl[ix]) * wl
            rel = np.stack(np.meshgrid(rel_y, rel_x, indexing='ij'),
                           axis=-1).astype(np.float32)  # hh, wh, 2
            rc = rel
            if self.cell_decode:
                rc = np.concatenate(
                    [rel, np.broadcast_to(cell, rel.shape)], -1)
            rc_c = dense_rc(jnp.asarray(rc, self.dtype))  # hh, wh, hid
            pre1s.append(lat + rc_c[None])
            areas.append(np.abs(rel[..., 0] / hl * rel[..., 1] / wl)
                         + 1e-9)

        # ONE decoder-tail call over the stacked ensemble branches
        stacked = jnp.concatenate(pre1s, axis=0)      # 4B, hh, wh, hid
        out_all = tail(stacked)                       # 4B, hh, wh, out
        preds = jnp.split(out_all, len(offsets), axis=0)

        if self.local_ensemble:
            # swap diagonal areas (LIIF trick) and normalize
            areas = [areas[3], areas[2], areas[1], areas[0]]
            tot = sum(areas)
            out = sum(p * jnp.asarray((a / tot)[None, ..., None],
                                      p.dtype)
                      for p, a in zip(preds, areas))
        else:
            out = preds[0]
        return {'out': nhwc_to_nchw(out)}
