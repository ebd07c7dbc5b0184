"""NLSN: non-local sparse attention SR network.

Capability parity with the reference (network_nlsn.py:301 — EDSR body of
32 ResBlocks, res_scale 0.1, NonLocalSparseAttention:131 inserted before
the body and after every 8th block; LSH with n_hashes rounds, chunked
attention over sorted buckets with adjacent-bucket attention, multi-round
logsumexp-weighted aggregation).

TPU notes: the sort/gather pipeline uses static L = H*W per traced shape,
so argsort/take_along_axis compile to efficient TPU sorts; padding to the
chunk size is a static amount. LSH rotations are drawn from the 'lsh' rng
collection when provided (the reference redraws them every forward),
falling back to a fixed key for deterministic eval.
"""
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (Conv, ResBlock, Upsampler,
                                       nchw_to_nhwc, nhwc_to_nchw)

Dtype = Any


def _onehot_budget_bytes() -> int:
    """Cap on the materialized one-hot gather matrix (MB, env-tunable):
    above it `_take` chunks the contraction over output rows so memory
    is linear in the chunk instead of quadratic in the token count.
    Default 1024 MB keeps every benchmarked config (x8 flagship:
    B=64, S=1024 -> 256 MB) on the single-shot MXU path."""
    return int(os.environ.get('SRCACO2_NLSN_ONEHOT_MB', '1024')) << 20


def _take_oneshot(t, idx):
    oh = (idx[..., None]
          == jnp.arange(t.shape[1])[None, None, :]).astype(t.dtype)
    return jax.lax.dot_general(
        oh, t, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(t.dtype)


def _take(t, idx):
    """Row gather as an EXACT one-hot matmul: out[b,i] = t[b,idx[b,i]].
    Per-element take_along_axis lowers to a serial TPU gather (measured
    ~1 s per call at (64, 1024, 256)); the one-hot contraction is two
    fast ops (a VPU compare + an MXU matmul) and is bit-exact (one
    nonzero per row).

    Shape regime: the one-hot materializes (B, S_out, S_src) with
    S = n_hashes*L — quadratic in the token count. Beyond the
    SRCACO2_NLSN_ONEHOT_MB budget (e.g. x2 with h_size 128: S=16384,
    1 GiB per image) the contraction is chunked over output rows with
    a lax.scan — each iteration builds only a (B, R, S_src) slice, so
    memory is linear and every chunk still rides the MXU. Bit-exact
    either way (one nonzero per row; same dot_general)."""
    b, s_src = t.shape[0], t.shape[1]
    s_out = idx.shape[1]
    itemsize = jnp.dtype(t.dtype).itemsize
    if b * s_out * s_src * itemsize <= _onehot_budget_bytes():
        return _take_oneshot(t, idx)
    # rows per chunk under the budget (>=8 keeps the MXU busy)
    rows = max(8, _onehot_budget_bytes() // max(1, b * s_src * itemsize))
    rows = min(rows, s_out)
    pad = (-s_out) % rows
    idx_p = jnp.pad(idx, ((0, 0), (0, pad)))
    nck = idx_p.shape[1] // rows
    idx_c = idx_p.reshape(b, nck, rows).transpose(1, 0, 2)

    def body(_, ix):
        return None, _take_oneshot(t, ix)

    _, outs = jax.lax.scan(body, None, idx_c)      # (nck, B, rows, C)
    out = outs.transpose(1, 0, 2, 3).reshape(b, nck * rows, -1)
    return out[:, :s_out]


@jax.custom_vjp
def permute_rows(t, idx, inv_idx):
    """t[idx] along axis 1, for idx with per-round PERMUTATION
    structure (see NonLocalSparseAttention: round r of `indices` is a
    permutation of [r*L, (r+1)*L), `inv_idx` its inverse). The custom
    VJP expresses the transpose as the inverse-permutation gather —
    rebuilding the small one-hot from inv_idx instead of saving the
    (B, S, S) forward one-hot as a residual — and sums the nh-fold
    round duplicates when the source has L rows."""
    return _take(t, idx)


def _pr_fwd(t, idx, inv_idx):
    return _take(t, idx), (inv_idx, t.shape[1])


def _pr_bwd(res, g):
    inv_idx, src_rows = res
    gt = _take(g, inv_idx)               # (B, nh*L, C) source order
    if src_rows != gt.shape[1]:          # nh rounds -> sum rounds
        gt = gt.reshape(gt.shape[0], -1, src_rows,
                        gt.shape[-1]).sum(axis=1)
    return gt, None, None


permute_rows.defvjp(_pr_fwd, _pr_bwd)


class NonLocalSparseAttention(nn.Module):
    channels: int
    n_hashes: int = 4
    chunk_size: int = 144
    reduction: int = 4
    res_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        L = h * w
        ck = self.chunk_size
        red_c = self.channels // self.reduction

        x_embed = Conv(red_c, 3, dtype=self.dtype,
                       name='conv_match')(x).reshape(b, L, red_c)
        y_embed = Conv(self.channels, 1, dtype=self.dtype,
                       name='conv_assembly')(x).reshape(b, L,
                                                        self.channels)

        hash_buckets = min(L // ck + (L // ck) % 2, 128)
        hash_buckets = max(hash_buckets, 2)

        if self.has_rng('lsh'):
            key = self.make_rng('lsh')
        else:
            key = jax.random.key(0)
        rot = jax.random.normal(
            key, (1, red_c, self.n_hashes, hash_buckets // 2),
            jnp.float32).astype(x_embed.dtype)
        rotated = jnp.einsum('btf,bfhi->bhti', x_embed,
                             jnp.broadcast_to(rot, (b,) + rot.shape[1:]))
        rotated = jnp.concatenate([rotated, -rotated], axis=-1)
        hash_codes = jnp.argmax(rotated, axis=-1)      # (B, nh, L)
        offsets = (jnp.arange(self.n_hashes) *
                   hash_buckets).reshape(1, -1, 1)
        hash_codes = (hash_codes + offsets).reshape(b, -1)
        hash_codes = jax.lax.stop_gradient(hash_codes)

        indices = jnp.argsort(hash_codes, axis=-1)       # (B, nh*L)
        undo_sort = jnp.argsort(indices, axis=-1)
        mod_idx = indices % L

        # Row gathers with PERMUTATION structure: the per-round offsets
        # keep hash codes of round r in [r*buckets, (r+1)*buckets), so
        # `indices` restricted to round r is a permutation of
        # [r*L, (r+1)*L) and `undo_sort` is its inverse — see
        # permute_rows above.
        x_sorted = permute_rows(x_embed, mod_idx, undo_sort)
        y_sorted = permute_rows(y_embed, mod_idx, undo_sort)

        pad = (ck - L % ck) % ck
        xb = x_sorted.reshape(b, self.n_hashes, L, red_c)
        yb = y_sorted.reshape(b, self.n_hashes, L, self.channels)
        if pad:
            xb = jnp.concatenate([xb, xb[:, :, -pad:]], axis=2)
            yb = jnp.concatenate([yb, yb[:, :, -pad:]], axis=2)
        nchunks = xb.shape[2] // ck
        xb = xb.reshape(b, self.n_hashes, nchunks, ck, red_c)
        yb = yb.reshape(b, self.n_hashes, nchunks, ck, self.channels)

        x_match = xb / jnp.sqrt(
            jnp.sum(xb * xb, axis=-1, keepdims=True) + 2.5e-9)

        def add_adjacent(t):
            back = jnp.concatenate([t[:, :, -1:], t[:, :, :-1]], axis=2)
            fwd = jnp.concatenate([t[:, :, 1:], t[:, :, :1]], axis=2)
            return jnp.concatenate([t, back, fwd], axis=3)

        x_match = add_adjacent(x_match)                  # ck*3 keys
        y_keys = add_adjacent(yb)

        raw = jnp.einsum('bhkie,bhkje->bhkij', xb, x_match)
        bucket_score = jax.nn.logsumexp(raw, axis=-1, keepdims=True)
        score = jnp.exp(raw - bucket_score)
        ret = jnp.einsum('bhkij,bhkje->bhkie', score, y_keys)

        ret = ret.reshape(b, self.n_hashes, -1, self.channels)
        bsc = bucket_score.reshape(b, self.n_hashes, -1)
        if pad:
            ret = ret[:, :, :-pad]
            bsc = bsc[:, :, :-pad]
        ret = ret.reshape(b, -1, self.channels)
        bsc = bsc.reshape(b, -1)
        ret = permute_rows(ret, undo_sort, indices)
        bsc = permute_rows(bsc[..., None], undo_sort, indices)[..., 0]

        ret = ret.reshape(b, self.n_hashes, L, self.channels)
        probs = jax.nn.softmax(bsc.reshape(b, self.n_hashes, L, 1),
                               axis=1)
        out = (ret * probs).sum(axis=1).reshape(b, h, w, self.channels)
        # the attention OUTPUT is scaled, not the residual input
        # (network_nlsn.py:267: ret * self.res_scale + input)
        return self.res_scale * out + x


class NLSN(nn.Module):
    in_chans: int = 1
    upscale: int = 2
    n_resblocks: int = 32
    n_feats: int = 256
    n_hashes: int = 4
    chunk_size: int = 144
    res_scale: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nchw_to_nhwc(x)
        y = Conv(self.n_feats, 3, dtype=self.dtype, name='head')(y)
        res = y
        res = NonLocalSparseAttention(
            self.n_feats, self.n_hashes, self.chunk_size, 4,
            self.res_scale, dtype=self.dtype)(res)
        for i in range(self.n_resblocks):
            res = ResBlock(self.n_feats, 3, res_scale=self.res_scale,
                           dtype=self.dtype)(res)
            if (i + 1) % 8 == 0:
                res = NonLocalSparseAttention(
                    self.n_feats, self.n_hashes, self.chunk_size, 4,
                    self.res_scale, dtype=self.dtype)(res)
        res = Conv(self.n_feats, 3, dtype=self.dtype)(res)
        y = y + res
        y = Upsampler(self.upscale, self.n_feats, dtype=self.dtype)(y)
        y = Conv(self.in_chans, 3, dtype=self.dtype, name='tail')(y)
        return {'out': nhwc_to_nchw(y)}
