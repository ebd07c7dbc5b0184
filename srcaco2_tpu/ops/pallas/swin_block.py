"""Pallas TPU kernel: fully-fused Swin transformer block with custom VJP.

The SwinIR training step (the framework flagship; reference
network_swinir.py:199 SwinTransformerBlock) is HBM-bandwidth bound on
TPU: each block's LN/qkv/attention/proj/MLP round-trips ~200MB of
activations through HBM per step at the benchmark config. This kernel
runs the ENTIRE block — LN1 -> qkv -> masked multi-head attention ->
proj -> residual -> LN2 -> MLP -> residual — in VMEM, reading the
(B, T, C) activation once and writing it once (~12MB), with a custom
VJP whose backward kernel recomputes the intermediates in VMEM
(flash-attention style) instead of streaming them from HBM.

TPU-first reformulation ("full-attention"): for training patches the
token count T = H*W is tiny (16x16 = 256 for the x8 flagship), so both
W-MSA and shifted W-MSA are expressed as ONE masked T x T attention in
raster token order. The cyclic shift, window partition and shift mask
(network_swinir.py:239 torch.roll / :57 window_partition /
:276 calculate_mask) all collapse into a single precomputed additive
(heads, T, T) bias tensor: tokens i, j attend iff they land in the same
window after the shift, with the learned relative-position bias at
their in-window offset, and -1e9 otherwise. No rolls, no 6-D
reshape/transpose layout ops — just MXU matmuls and a VPU softmax.
This spends 4x the attention FLOPs of 64-token windowing but attention
is ~8% of block FLOPs, and the (T, hd) matmuls pipeline far better on
the 128x128 MXU than (64, 30) slivers.

Eligible for T <= MAX_T tokens (training-patch shapes); larger inputs
(full-image eval) use the windowed jnp path in models/swin_fused.py.

Tuning/measurement env knobs (see docs/BENCH_ANALYSIS.md for the
measured history): SRCACO2_SWIN_HEADS_BATCHED (default on: all heads
in one single-batch-dim dot_general + one softmax chain — per-op
overhead dominates at these shapes), SRCACO2_SWIN_BWD_RS (flash-style
backward variant, measured slower), SRCACO2_SWIN_IB_ROWS /
SRCACO2_SWIN_VMEM_MB (images-per-program tuning),
SRCACO2_SWIN_BWD_ABLATE (component timing ablations for perf_ab.py),
SRCACO2_SWIN_F32_SOFTMAX (restore torch-autocast-style f32 softmax
under bf16 AMP, so quality regressions can be bisected against the
bf16-softmax numerics independently of everything else).

All knobs are snapshot into a hashable `_Cfg` at `fused_swin_block`
call time and baked into the op's identity (`_make_block_op` lru
key), so toggling an env var within one process yields a NEW compiled
executable instead of silently reusing a stale jit cache entry.
"""
import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class _Cfg(NamedTuple):
    """Trace-time kernel variant knobs (part of the op cache key)."""
    heads_batched: bool = True
    bwd_rs: bool = False
    ablate: frozenset = frozenset()
    f32_softmax: bool = False
    ib_rows: int = 512
    vmem_mb: Optional[float] = None
    pair: bool = False
    hd_pad: int = 0
    mlp_pad: int = 0


_HD_PAD_AUTO = -1    # cfg.hd_pad sentinel: resolve per call via heads/c


def _parse_hd_pad(v: str) -> int:
    return _HD_PAD_AUTO if v.strip().lower() == 'auto' else int(v)


def _resolve_pads(cfg: _Cfg, heads: int, c: int, ch: int) -> _Cfg:
    """Replace the 'auto' sentinels with concrete pad widths BEFORE the
    cfg is used as an op cache key. Auto rules (both capped at <= 25%
    extra lanes): hd_pad — pad each head's lane block up to the next
    multiple of 8 iff hd is misaligned (measured win at the flagship
    hd=30: 1.23x train step); mlp_pad — pad the MLP hidden width up to
    the next multiple of 128 (the VPU/MXU lane tile) iff ch is
    misaligned (flagship ch=360 -> 384). Tiny widths where padding
    would inflate the matmuls stay unpadded."""
    if cfg.hd_pad == _HD_PAD_AUTO:
        hd = c // heads
        hdp = -(-hd // 8) * 8
        cfg = cfg._replace(
            hd_pad=hdp if hdp != hd and (hdp - hd) * 4 <= hd else 0)
    if cfg.mlp_pad == _HD_PAD_AUTO:
        chp = -(-ch // 128) * 128
        cfg = cfg._replace(
            mlp_pad=chp if chp != ch and (chp - ch) * 4 <= ch else 0)
    return cfg


def _env_cfg() -> _Cfg:
    vm = os.environ.get('SRCACO2_SWIN_VMEM_MB')
    return _Cfg(
        heads_batched=os.environ.get('SRCACO2_SWIN_HEADS_BATCHED',
                                     '1') != '0',
        bwd_rs=bool(os.environ.get('SRCACO2_SWIN_BWD_RS')),
        ablate=frozenset(
            x for x in os.environ.get('SRCACO2_SWIN_BWD_ABLATE',
                                      '').split(',') if x),
        # Default ON (round-4 flip): the fused-vs-windowed long-run A/B
        # (docs/QUALITY.md) measured the bf16 softmax chain at -0.45 dB
        # final PSNR for a 0.6% throughput cost, so the production /
        # main.py path defaults to the quality-correct f32 numerics.
        # bench.py pins =0 to keep the throughput benchmark's bf16
        # chain comparable across rounds.
        f32_softmax=os.environ.get('SRCACO2_SWIN_F32_SOFTMAX',
                                   '1') != '0',
        ib_rows=int(os.environ.get('SRCACO2_SWIN_IB_ROWS', '512')),
        vmem_mb=float(vm) if vm else None,
        pair=os.environ.get('SRCACO2_SWIN_PAIR', '0') != '0',
        # Zero-pad each head's q/k/v lane block to this width so head
        # slices land on MXU-friendly lane offsets while the model
        # function stays EXACTLY C=180/hd=30 (see _pad_head_lanes;
        # shape-control motivation: docs/BENCH_ANALYSIS.md round 4).
        # Default 'auto' (round-4 flip): resolve per call to the next
        # multiple of 8 above hd when the lane overhead is <= 25% —
        # the in-process A/B measured hd 30 -> 32 (6.7% extra lanes)
        # at 39.96 -> 32.48 ms/step train and +18% eval img/s.
        # Explicit ints override; '0' disables.
        hd_pad=_parse_hd_pad(os.environ.get('SRCACO2_SWIN_HD_PAD',
                                            'auto')),
        # Zero-pad the MLP hidden width ch -> this (gelu(0)=0 makes the
        # pad exact in fwd AND bwd: zero w1 cols -> zero hidden lanes
        # -> erased by the matching zero w2 rows). 'auto' pads to the
        # next 128-lane tile (flagship ch=360 -> 384), but unlike
        # hd_pad the default stays OFF: the TPU in-process A/B
        # (scripts/perf_ab.py 'mlp-pad-384' arm, 2026-08-19) measured
        # it flat-to-negative — 32.20 ms (hd_pad only) vs 32.33 ms
        # (hd_pad+mlp_pad); Mosaic already tiles the 360-wide hidden
        # dim well, so the pad only adds its +6.7% FLOPs. The knob
        # stays for other widths (docs/BENCH_ANALYSIS.md).
        mlp_pad=_parse_hd_pad(os.environ.get('SRCACO2_SWIN_MLP_PAD',
                                             '0')))

MAX_T = 256          # full-attention token cap (VMEM budget)
NEG_INF = -1e9

# -----------------------------------------------------------------
# trace-time constants: combined window-membership mask + relative
# position index, in raster token order, shift folded in.
# -----------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def full_attn_mask_and_index(h: int, w: int, ws: int, shift: int):
    """Returns (mask (T,T) float32 additive {0, NEG_INF},
    rel_index (T,T) int32 into the (2ws-1)^2 bias table).

    Attend semantics match torch SwinIR exactly: after roll by -shift,
    tokens attend iff same ws x ws window AND same shift region (the
    calculate_mask -100 regions, network_swinir.py:276), i.e. no
    attention across the cyclic wrap.
    """
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    ys, xs = ys.reshape(-1), xs.reshape(-1)            # raster order
    # rolled coordinates (position in the shifted image)
    yr = (ys - shift) % h
    xr = (xs - shift) % w
    win = (yr // ws) * (w // ws) + (xr // ws)

    def region(v, n):
        # 0: body, 1: [n-ws, n-shift), 2: [n-shift, n)  (on ROLLED pos)
        r = np.zeros_like(v)
        if shift > 0:
            r = np.where(v >= n - ws, 1, r)
            r = np.where(v >= n - shift, 2, r)
        return r

    reg = region(yr, h) * 3 + region(xr, w)
    same = (win[:, None] == win[None, :]) & \
           (reg[:, None] == reg[None, :])
    mask = np.where(same, 0.0, NEG_INF).astype(np.float32)

    # in-window relative offsets (rolled coords mod ws), torch layout:
    # idx = (dy + ws - 1) * (2ws - 1) + (dx + ws - 1)
    wy, wx = yr % ws, xr % ws
    dy = wy[:, None] - wy[None, :] + ws - 1
    dx = wx[:, None] - wx[None, :] + ws - 1
    rel = (dy * (2 * ws - 1) + dx).astype(np.int32)
    return mask, rel


@functools.lru_cache(maxsize=None)
def _bias_factors(h: int, w: int, ws: int, shift: int):
    """Constants for the exact matmul factorization of the relative-
    position-bias build. bias[h,i,j] = table[rel[i,j], h] with
    rel[i,j] = (wy_i-wy_j+ws-1)*(2ws-1) + (wx_i-wx_j+ws-1), where
    (wy, wx) are in-window coords after the cyclic shift. rel depends
    on a token only through its ws^2 possible (wy, wx) values, so the
    65k-row gather (and the 59MB onehot scatter-substitute its VJP
    needed per block) collapses into two small constant matmuls:
        M4   = OH @ table                 # (ws^4, nh)
        bias = P @ M4(ac,bd) @ P^T        # exact: one nonzero per row
    P (T, ws^2) onehot of each token's (wy, wx); OH (ws^4, (2ws-1)^2).
    0/1 f32 constants -> forward bitwise-equal to the gather, and
    plain autodiff gives the transposed (equally tiny) matmuls."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    ys, xs = ys.reshape(-1), xs.reshape(-1)
    wy = ((ys - shift) % h) % ws
    wx = ((xs - shift) % w) % ws
    n2 = ws * ws
    p = np.zeros((h * w, n2), np.float32)
    p[np.arange(h * w), wy * ws + wx] = 1.0
    a, c, b, d = np.meshgrid(*([np.arange(ws)] * 4), indexing='ij')
    rel = ((a - b + ws - 1) * (2 * ws - 1)
           + (c - d + ws - 1)).reshape(-1)     # order m = ac*n2 + bd
    oh = np.zeros((n2 * n2, (2 * ws - 1) ** 2), np.float32)
    oh[np.arange(n2 * n2), rel] = 1.0
    return p, oh


def build_attn_bias(tables: jax.Array, h: int, w: int, ws: int,
                    dtype=jnp.float32, shifts=None) -> jax.Array:
    """tables: (d, (2ws-1)^2, nh) learned bias tables for d blocks.
    Returns (d, nh, T, T) combined additive bias (learned rel-pos bias
    + window/shift mask), block i shifted iff i odd (SwinIR order);
    `shifts` overrides the per-block shift sequence (the tiled eval
    path passes all-zero shifts and adds its edge masks separately).
    Built via the _bias_factors matmul factorization — no gathers, no
    scatter-add in the backward, and the (T,T,nh)->(nh,T,T) transpose
    falls out of the einsum order for free."""
    d, _, nh = tables.shape
    n2 = ws * ws
    outs = []
    for i in range(d):
        shift = (0 if i % 2 == 0 else ws // 2) if shifts is None \
            else shifts[i]
        mask, _ = full_attn_mask_and_index(h, w, ws, shift)
        p, oh = _bias_factors(h, w, ws, shift)
        pj, ohj = jnp.asarray(p), jnp.asarray(oh)
        # HIGHEST precision keeps the 0/1-factor products exact (the
        # backend default routes f32 dots through bf16, which would
        # silently round the learned table by ~0.4% relative)
        hi = jax.lax.Precision.HIGHEST
        m4 = jnp.einsum('mr,rh->mh', ohj, tables[i],
                        precision=hi).reshape(n2, n2, nh)  # (ac,bd,nh)
        arow = jnp.einsum('ia,abh->ibh', pj, m4,
                          precision=hi)                    # (T,bd,nh)
        bias = jnp.einsum('ibh,jb->hij', arow, pj,
                          precision=hi)                    # (nh,T,T)
        outs.append(bias + jnp.asarray(mask)[None])
    return jnp.stack(outs).astype(dtype)


# -----------------------------------------------------------------
# shared math
# -----------------------------------------------------------------

LN_EPS = 1e-5  # torch nn.LayerNorm default (reference parity)


def _ln(x, g, b):
    """LayerNorm over the last axis, f32. g, b: (1, C)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = xc * rstd
    return xhat * g + b, xhat, rstd


_GC = 0.7978845608028654        # sqrt(2/pi)
_GA = 0.044715


def _gelu(u):
    """tanh-approximate GELU (flax nn.gelu default; the rest of the
    framework's transformer blocks use the same). Deviation from torch's
    exact erf GELU is <= ~3e-4 absolute — far below bf16 training noise
    (documented in PARITY.md)."""
    g = _GC * (u + _GA * u * u * u)
    return 0.5 * u * (1.0 + jnp.tanh(g))


def _gelu_grad(u, th=None):
    """d gelu/du; pass th = tanh(sqrt(2/pi)(u + a u^3)) when already
    computed by the forward to save the (m, ch) tanh pass."""
    if th is None:
        g = _GC * (u + _GA * u * u * u)
        th = jnp.tanh(g)
    sech2 = 1.0 - th * th
    return 0.5 * (1.0 + th) + 0.5 * u * sech2 * _GC * \
        (1.0 + 3.0 * _GA * u * u)


def _dot(a, b, cdt, out=jnp.float32):
    return jnp.dot(a.astype(cdt), b.astype(cdt),
                   preferred_element_type=out)


def _dotg(a, b, dims, cdt, out=jnp.float32):
    return jax.lax.dot_general(a.astype(cdt), b.astype(cdt),
                               dimension_numbers=dims,
                               preferred_element_type=out)


# batched (over images) dims for per-head attention matmuls
_QK = (((2,), (2,)), ((0,), (0,)))    # (b,i,d)x(b,j,d) -> (b,i,j)
_PV = (((2,), (1,)), ((0,), (0,)))    # (b,i,j)x(b,j,d) -> (b,i,d)
_PT = (((1,), (1,)), ((0,), (0,)))    # (b,i,j)x(b,i,d) -> (b,j,d)


def _split_heads(z, ib, t, ca, heads, start):
    """(ib*t, nc) -> (heads*ib, t, hd): per-head lane slices at column
    offset `start`, stacked into ONE batch dim (Mosaic's tpu.matmul
    supports a single batch dimension). `ca` is the ATTENTION channel
    width (heads*hd) — equal to the model C unless cfg.hd_pad widened
    the head lanes."""
    hd = ca // heads
    z4 = jnp.stack([
        z[:, start + h * hd:start + (h + 1) * hd].reshape(ib, t, hd)
        for h in range(heads)])
    return z4.reshape(heads * ib, t, hd)


def _merge_heads(z3, ib, t, ca, heads):
    """(heads*ib, t, hd) -> (ib*t, ca) concatenating heads into lanes."""
    hd = ca // heads
    z4 = z3.reshape(heads, ib, t, hd)
    return jnp.concatenate([z4[h].reshape(ib * t, hd)
                            for h in range(heads)], axis=-1)


def _attn_fwd(qkv, bias_ref, ib, t, c, heads, cdt, cfg,
              with_probs=False):
    """qkv: (ib*t, 3c) cdt, q columns PRE-SCALED by hd**-0.5 (folded
    into the qkv weights outside the kernel). Softmax division is
    deferred to the (t, hd) output — one (t, t) VPU pass saved.

    The whole (t, t) score/softmax chain runs in sdt — cdt (bf16 under
    AMP training — the (ib, t, t) VPU passes are the kernel's single
    largest cost class) by default, f32 when cfg.f32_softmax restores
    torch-autocast numerics — with the row-sum reduced in f32;
    bias_ref is pre-cast to sdt. bf16's exponent range covers the
    -1e9 mask. Returns O (ib*t, ca) cdt and per-head residuals for the
    backward, where ca = qkv_width/3 (== c unless cfg.hd_pad widened
    the head lanes; the proj weights carry matching zero rows so the
    model function is unchanged)."""
    del c
    ca = qkv.shape[1] // 3
    hd = ca // heads
    sdt = jnp.float32 if cfg.f32_softmax else cdt
    if cfg.heads_batched:
        # ONE batched dot_general / softmax chain for all heads:
        # per-op fixed overhead (Mosaic runs the kernel body op by op)
        # dominates at these shapes, so 6x fewer (t, t) ops wins even
        # though the math is identical to the per-head loop.
        q = _split_heads(qkv, ib, t, ca, heads, 0)    # (h*ib, t, hd)
        k = _split_heads(qkv, ib, t, ca, heads, ca)
        v = _split_heads(qkv, ib, t, ca, heads, 2 * ca)
        # elementwise chain in 4D so the (h, 1, t, t) bias broadcasts
        # over images without materializing a (h*ib, t, t) copy; the
        # dots see the merged single batch dim.
        s = _dotg(q, k, _QK, cdt).reshape(heads, ib, t, t)
        s = s.astype(sdt) + bias_ref[:][:, None]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).reshape(heads * ib, t, t)  # (h*ib, t, t)
        r = jnp.sum(e, axis=-1, keepdims=True,
                    dtype=jnp.float32)
        rinv = 1.0 / r
        o4 = _dotg(e, v, _PV, cdt) * rinv             # f32
        o = _merge_heads(o4.astype(cdt), ib, t, ca, heads)
        return o, ((q, k, v, e, rinv) if with_probs else None)
    o_parts, saved = [], []
    for h in range(heads):
        q = qkv[:, h * hd:(h + 1) * hd].reshape(ib, t, hd)
        k = qkv[:, ca + h * hd:ca + (h + 1) * hd].reshape(ib, t, hd)
        v = qkv[:, 2 * ca + h * hd:2 * ca + (h + 1) * hd].reshape(
            ib, t, hd)
        s = _dotg(q, k, _QK, cdt).astype(sdt) + bias_ref[h][None]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)                                 # (ib,t,t) sdt
        r = jnp.sum(e, axis=-1, keepdims=True,
                    dtype=jnp.float32)                     # (ib,t,1)
        rinv = 1.0 / r
        o = _dotg(e, v, _PV, cdt) * rinv                   # f32
        o_parts.append(o.astype(cdt).reshape(ib * t, hd))
        if with_probs:
            saved.append((q, k, v, e, rinv))
    return jnp.concatenate(o_parts, axis=-1), saved


def _block_fwd_math(x, refs, bias_ref, ib, t, c, heads, cdt,
                    cfg=_Cfg(), need_out=True):
    """Forward math shared by the fwd kernel and the bwd recompute.
    x: (ib*t, c) f32 residual stream; large intermediates are stored in
    cdt (bf16 in training) to halve VMEM traffic — Mosaic executes each
    op as a separate VMEM pass, so byte traffic, not FLOPs, dominates
    the elementwise cost. need_out=False (the bwd recompute) skips the
    final mlp2 matmul + residual add, whose output the backward never
    reads."""
    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bm1, w2, bm2) = refs
    y, xhat1, rstd1 = _ln(x, g1[:], b1[:])
    yc = y.astype(cdt)
    qkv = _dot(yc, wqkv[:], cdt).astype(cdt) + bqkv[:]
    o, saved = _attn_fwd(qkv, bias_ref, ib, t, c, heads, cdt, cfg,
                         with_probs=True)
    a = _dot(o, wproj[:], cdt) + bproj[:]
    x2 = x + a
    y2, xhat2, rstd2 = _ln(x2, g2[:], b2[:])
    y2c = y2.astype(cdt)
    u = _dot(y2c, w1[:], cdt).astype(cdt) + bm1[:]
    g = _GC * (u + _GA * u * u * u)
    th = jnp.tanh(g)
    hact = 0.5 * u * (1.0 + th)
    out = None
    if need_out:
        o2 = _dot(hact, w2[:], cdt) + bm2[:]
        out = x2 + o2
    inter = dict(y=yc, xhat1=xhat1, rstd1=rstd1, qkv=qkv, o=o, x2=x2,
                 y2=y2c, xhat2=xhat2, rstd2=rstd2, u=u, th=th,
                 hact=hact, saved=saved)
    return out, inter


def _fwd_kernel(x_ref, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1,
                bm1, w2, bm2, bias_ref, out_ref, *, heads, cdt, cfg):
    ib, t, c = x_ref.shape
    x = x_ref[:].reshape(ib * t, c).astype(jnp.float32)
    refs = (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bm1, w2, bm2)
    out, _ = _block_fwd_math(x, refs, bias_ref, ib, t, c, heads,
                             cdt, cfg)
    out_ref[:] = out.reshape(ib, t, c).astype(out_ref.dtype)


def _ln_bwd(dy, g, xhat, rstd):
    """d(LN(x))/dx given upstream dy; also returns (dgamma, dbeta)."""
    dxhat = dy * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * rstd
    return dx, jnp.sum(dy * xhat, axis=0, keepdims=True), \
        jnp.sum(dy, axis=0, keepdims=True)


def _bwd_kernel(x_ref, g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1,
                bm1, w2, bm2, bias_ref, dout_ref,
                dx_ref, dg1, db1, dwqkv, dbqkv, dwproj, dbproj, dg2,
                db2, dw1, dbm1, dw2, dbm2, dbias, *, heads, cdt, cfg):
    # measurement-only ablations (perf_ab.py); never set in production
    _abl = cfg.ablate
    ib, t, c = x_ref.shape
    ca = wqkv.shape[1] // 3      # attention width (>= c under hd_pad)
    hd = ca // heads
    accs = (dg1, db1, dwqkv, dbqkv, dwproj, dbproj, dg2, db2, dw1,
            dbm1, dw2, dbm2, dbias)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in accs:
            r[...] = jnp.zeros_like(r)

    x = x_ref[:].reshape(ib * t, c).astype(jnp.float32)
    refs = (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bm1, w2, bm2)
    _, it = _block_fwd_math(x, refs, bias_ref, ib, t, c, heads,
                            cdt, cfg, need_out=False)

    g = dout_ref[:].reshape(ib * t, c).astype(jnp.float32)
    acc_w = 'dw' not in _abl
    # out = x2 + h @ W2 + bm2
    if 'mlpbwd' in _abl:
        dx2 = g
    else:
        if acc_w:
            dw2[...] += _dotg(it['hact'], g, (((0,), (0,)), ((), ())),
                              cdt)
            dbm2[...] += jnp.sum(g, axis=0, keepdims=True)
        dh = _dotg(g, w2[:], (((1,), (1,)), ((), ())), cdt)    # (m, ch)
        du = dh * _gelu_grad(it['u'], it['th'])
        du_c = du.astype(cdt)    # cast ONCE for both consumers
        if acc_w:
            dw1[...] += _dotg(it['y2'], du_c,
                              (((0,), (0,)), ((), ())), cdt)
            dbm1[...] += jnp.sum(du, axis=0, keepdims=True)
        dy2 = _dotg(du_c, w1[:], (((1,), (1,)), ((), ())),
                    cdt)                                       # (m, c)
        dx2_ln, dg2v, db2v = _ln_bwd(dy2, g2[:], it['xhat2'],
                                     it['rstd2'])
        if acc_w:
            dg2[...] += dg2v
            db2[...] += db2v
        dx2 = g + dx2_ln
    # x2 = x + O @ Wp + bp
    dx2_c = dx2.astype(cdt)      # cast ONCE for the three consumers
    if acc_w:
        dwproj[...] += _dotg(it['o'], dx2_c,
                             (((0,), (0,)), ((), ())), cdt)
        dbproj[...] += jnp.sum(dx2, axis=0, keepdims=True)
    do = _dotg(dx2_c, wproj[:], (((1,), (1,)), ((), ())), cdt)  # (m, c)
    if cfg.heads_batched and 'attnbwd' not in _abl:
        # all-heads batched attention backward (see _attn_fwd note)
        q, k, v, e, rinv = it['saved']
        do4 = _split_heads(do.astype(cdt), ib, t, ca, heads, 0)
        p = e * rinv.astype(cdt)                      # (h*ib, t, t)
        dp = _dotg(do4, v, _QK, cdt).astype(cdt)      # (h*ib, t, t)
        dv = _dotg(p, do4, _PT, cdt)                  # (h*ib, t, hd)
        rs = jnp.sum(dp * p, axis=-1, keepdims=True,
                     dtype=jnp.float32)
        ds = p * (dp - rs.astype(cdt))
        if acc_w:
            dbias[...] += jnp.sum(
                ds.reshape(heads, ib, t, t), axis=1,
                dtype=jnp.float32)
        dq4 = _dotg(ds, k, _PV, cdt)                  # (h*ib, t, hd)
        dk4 = _dotg(ds, q, _PT, cdt)
        dqkv = jnp.concatenate(
            [_merge_heads(z.astype(cdt), ib, t, ca, heads)
             for z in (dq4, dk4, dv)], axis=-1)       # (m, 3ca)
        dy = _dotg(dqkv, wqkv[:], (((1,), (1,)), ((), ())), cdt)
        if acc_w:
            dwqkv[...] += _dotg(it['y'], dqkv,
                                (((0,), (0,)), ((), ())), cdt)
            dbqkv[...] += jnp.sum(dqkv, axis=0, keepdims=True)
        dx_ln, dg1v, db1v = _ln_bwd(dy, g1[:], it['xhat1'],
                                    it['rstd1'])
        if acc_w:
            dg1[...] += dg1v
            db1[...] += db1v
        dx = dx2 + dx_ln
        dx_ref[:] = dx.reshape(ib, t, c).astype(dx_ref.dtype)
        return
    # attention backward, per head
    rs_identity_bwd = cfg.bwd_rs
    dqs, dks, dvs = [], [], []
    heads_iter = () if 'attnbwd' in _abl else range(heads)
    for h in heads_iter:
        q, k, v, e, rinv = it['saved'][h]
        doh = do[:, h * hd:(h + 1) * hd].reshape(ib, t, hd)
        if rs_identity_bwd:
            # Flash-style variant: fold 1/r into the (t, hd) upstream
            # grad and use rowsum(dP.P) = rowsum(dO.O) — fewer (t, t)
            # passes on paper, but MEASURED 12% SLOWER than the plain
            # chain below on v5e (in-process A/B, 47.5 vs 42.3 ms for
            # the 36-block fwd+bwd): Mosaic schedules the plain
            # multiply-reduce chain better. Kept for future re-tuning.
            oh = it['o'][:, h * hd:(h + 1) * hd].reshape(ib, t, hd)
            dohs = doh * rinv                             # (ib, t, hd)
            rs = jnp.sum(dohs * oh.astype(jnp.float32), axis=-1,
                         keepdims=True)                   # (ib, t, 1)
            dohs = dohs.astype(cdt)
            dp = _dotg(dohs, v, _QK, cdt).astype(cdt)     # (ib, t, t)
            ds = e * (dp - rs.astype(cdt))                # (ib, t, t)
            dv = _dotg(e, dohs, _PT, cdt)                 # (ib, t, hd)
        else:
            p = e * rinv.astype(cdt)                      # (ib, t, t)
            dp = _dotg(doh, v, _QK, cdt).astype(cdt)      # (ib, t, t)
            dv = _dotg(p, doh, _PT, cdt)                  # (ib, t, hd)
            rs = jnp.sum(dp * p, axis=-1, keepdims=True,
                         dtype=jnp.float32)
            ds = p * (dp - rs.astype(cdt))
        if acc_w:
            dbias[h] += jnp.sum(ds, axis=0, dtype=jnp.float32)
        # q columns were pre-scaled outside; no extra scale here
        dq = _dotg(ds, k, _PV, cdt)                       # (ib, t, hd)
        dk = _dotg(ds, q, _PT, cdt)                       # (ib, t, hd)
        dqs.append(dq.reshape(ib * t, hd))
        dks.append(dk.reshape(ib * t, hd))
        dvs.append(dv.reshape(ib * t, hd))
    if 'attnbwd' in _abl:
        dqkv = jnp.zeros((ib * t, 3 * ca), cdt)
    else:
        dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (m, 3c)
    if acc_w:
        dwqkv[...] += _dotg(it['y'], dqkv, (((0,), (0,)), ((), ())),
                            cdt)
        dbqkv[...] += jnp.sum(dqkv, axis=0, keepdims=True)
    dy = _dotg(dqkv, wqkv[:], (((1,), (1,)), ((), ())), cdt)   # (m, c)
    dx_ln, dg1v, db1v = _ln_bwd(dy, g1[:], it['xhat1'], it['rstd1'])
    if acc_w:
        dg1[...] += dg1v
        db1[...] += db1v
    dx = dx2 + dx_ln
    dx_ref[:] = dx.reshape(ib, t, c).astype(dx_ref.dtype)


def _block_bwd_math(g, it, refs, ib, t, c, heads, cdt):
    """Backward math of one block (heads-batched production path),
    returning (dx, 13 weight grads) instead of accumulating into refs
    — shared by the pair-fused backward kernel. Mirrors _bwd_kernel's
    main branch exactly."""
    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bm1, w2,
     bm2) = refs
    # out = x2 + h @ W2 + bm2
    dw2 = _dotg(it['hact'], g, (((0,), (0,)), ((), ())), cdt)
    dbm2 = jnp.sum(g, axis=0, keepdims=True)
    dh = _dotg(g, w2[:], (((1,), (1,)), ((), ())), cdt)
    du = dh * _gelu_grad(it['u'], it['th'])
    du_c = du.astype(cdt)
    dw1 = _dotg(it['y2'], du_c, (((0,), (0,)), ((), ())), cdt)
    dbm1 = jnp.sum(du, axis=0, keepdims=True)
    dy2 = _dotg(du_c, w1[:], (((1,), (1,)), ((), ())), cdt)
    dx2_ln, dg2v, db2v = _ln_bwd(dy2, g2[:], it['xhat2'],
                                 it['rstd2'])
    dx2 = g + dx2_ln
    # x2 = x + O @ Wp + bp
    dx2_c = dx2.astype(cdt)
    dwproj = _dotg(it['o'], dx2_c, (((0,), (0,)), ((), ())), cdt)
    dbproj = jnp.sum(dx2, axis=0, keepdims=True)
    do = _dotg(dx2_c, wproj[:], (((1,), (1,)), ((), ())), cdt)
    ca = wproj.shape[0]          # attention width (>= c under hd_pad)
    q, k, v, e, rinv = it['saved']
    do4 = _split_heads(do.astype(cdt), ib, t, ca, heads, 0)
    p = e * rinv.astype(e.dtype)
    dp = _dotg(do4, v, _QK, cdt).astype(p.dtype)
    dv = _dotg(p, do4, _PT, cdt)
    rs = jnp.sum(dp * p, axis=-1, keepdims=True, dtype=jnp.float32)
    ds = p * (dp - rs.astype(p.dtype))
    dbias = jnp.sum(ds.reshape(heads, ib, t, t), axis=1,
                    dtype=jnp.float32)
    dq4 = _dotg(ds, k, _PV, cdt)
    dk4 = _dotg(ds, q, _PT, cdt)
    dqkv = jnp.concatenate(
        [_merge_heads(z.astype(cdt), ib, t, ca, heads)
         for z in (dq4, dk4, dv)], axis=-1)
    dy = _dotg(dqkv, wqkv[:], (((1,), (1,)), ((), ())), cdt)
    dwqkv = _dotg(it['y'], dqkv, (((0,), (0,)), ((), ())), cdt)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dx_ln, dg1v, db1v = _ln_bwd(dy, g1[:], it['xhat1'], it['rstd1'])
    dx = dx2 + dx_ln
    return dx, (dg1v, db1v, dwqkv, dbqkv, dwproj, dbproj, dg2v,
                db2v, dw1, dbm1, dw2, dbm2, dbias)


def _fwd_kernel_pair(x_ref, *args, heads, cdt, cfg):
    """Two chained blocks (no-shift, shift) in ONE kernel: x is read
    from HBM once and the intermediate stream never leaves VMEM.
    args = 13 A-refs + 13 B-refs + out_ref."""
    refs_a, bias_a = args[:12], args[12]
    refs_b, bias_b = args[13:25], args[25]
    out_ref = args[26]
    ib, t, c = x_ref.shape
    x = x_ref[:].reshape(ib * t, c).astype(jnp.float32)
    out_a, _ = _block_fwd_math(x, refs_a, bias_a, ib, t, c, heads,
                               cdt, cfg)
    out_b, _ = _block_fwd_math(out_a, refs_b, bias_b, ib, t, c,
                               heads, cdt, cfg)
    out_ref[:] = out_b.reshape(ib, t, c).astype(out_ref.dtype)


def _bwd_kernel_pair(x_ref, *args, heads, cdt, cfg):
    """Pair backward: recompute A (with its output, B's input), then
    B's intermediates, then chain the two backward passes in VMEM.
    args = 13 A-refs + 13 B-refs + dout_ref, then outputs: dx_ref +
    13 A-grad refs + 13 B-grad refs."""
    refs_a, bias_a = args[:12], args[12]
    refs_b, bias_b = args[13:25], args[25]
    dout_ref = args[26]
    dx_ref = args[27]
    gacc_a = args[28:41]
    gacc_b = args[41:54]
    ib, t, c = x_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in gacc_a + gacc_b:
            r[...] = jnp.zeros_like(r)

    x = x_ref[:].reshape(ib * t, c).astype(jnp.float32)
    out_a, it_a = _block_fwd_math(x, refs_a, bias_a, ib, t, c, heads,
                                  cdt, cfg)
    _, it_b = _block_fwd_math(out_a, refs_b, bias_b, ib, t, c, heads,
                              cdt, cfg, need_out=False)
    g = dout_ref[:].reshape(ib * t, c).astype(jnp.float32)
    dxb, grads_b = _block_bwd_math(g, it_b, refs_b, ib, t, c,
                                   heads, cdt)
    dxa, grads_a = _block_bwd_math(dxb, it_a, refs_a, ib, t, c,
                                   heads, cdt)
    for r, gv in zip(gacc_a, grads_a):
        r[...] += gv
    for r, gv in zip(gacc_b, grads_b):
        r[...] += gv
    dx_ref[:] = dxa.reshape(ib, t, c).astype(dx_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_block_pair_op(heads: int, interpret: bool, cdt, cfg: _Cfg):
    """fused_pair(x, *wbA(13), *wbB(13)) -> out, with custom VJP.
    Halves the pallas_call count (and the inter-block HBM round trip
    of the activation stream) relative to per-block fusion. Production
    (heads-batched) path only."""
    assert cfg.heads_batched, 'pair kernel requires heads_batched'

    def specs(b, t, c, ch, ca):
        w_shapes = _w_shapes(c, ch, heads, t, ca)
        ib = _pick_img_blk(b, t, cfg.ib_rows)
        grid = (b // ib,)
        act = pl.BlockSpec((ib, t, c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        return w_shapes, ib, grid, act

    def call_fwd(x, *wb):
        b, t, c = x.shape
        ch = wb[8].shape[1]
        w_shapes, ib, grid, act = specs(b, t, c, ch,
                                        wb[2].shape[1] // 3)
        return pl.pallas_call(
            functools.partial(_fwd_kernel_pair, heads=heads, cdt=cdt,
                              cfg=cfg),
            out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
            grid=grid,
            in_specs=[act] + _weight_specs(w_shapes) * 2,
            out_specs=act,
            compiler_params=_compiler_params(cfg),
            interpret=interpret,
        )(x, *_cast_wb(wb[:13], cdt, cfg), *_cast_wb(wb[13:], cdt,
                                                     cfg))

    @jax.custom_vjp
    def fused_pair(x, *wb):
        return call_fwd(x, *wb)

    def fwd(x, *wb):
        return call_fwd(x, *wb), (x,) + wb

    def bwd(res, dout):
        x, *wb = res
        b, t, c = x.shape
        ch = wb[8].shape[1]
        w_shapes, ib, grid, act = specs(b, t, c, ch,
                                        wb[2].shape[1] // 3)
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel_pair, heads=heads, cdt=cdt,
                              cfg=cfg),
            out_shape=[jax.ShapeDtypeStruct((b, t, c), x.dtype)]
            + [jax.ShapeDtypeStruct(s, jnp.float32)
               for s in w_shapes] * 2,
            grid=grid,
            in_specs=[act] + _weight_specs(w_shapes) * 2 + [act],
            out_specs=[act] + _weight_specs(w_shapes) * 2,
            compiler_params=_compiler_params(cfg),
            interpret=interpret,
        )(x, *_cast_wb(wb[:13], cdt, cfg),
          *_cast_wb(wb[13:], cdt, cfg), dout)
        return tuple(outs)

    fused_pair.defvjp(fwd, bwd)
    return fused_pair


def fused_swin_block_pair(x, params_a, bias_a, params_b, bias_b, *,
                          heads: int, interpret: bool = False,
                          compute_dtype=jnp.bfloat16):
    """Two consecutive Swin blocks (the canonical no-shift/shift pair)
    in one fused kernel. Same params layout as fused_swin_block."""
    cfg = _resolve_pads(_env_cfg()._replace(pair=True), heads,
                        params_a['proj_kernel'].shape[1],
                        params_a['mlp1_kernel'].shape[1])
    op = _make_block_pair_op(heads, interpret,
                             jnp.dtype(compute_dtype), cfg)
    f32 = jnp.float32

    def pack(params, bias):
        def v(name):
            return params[name].astype(f32).reshape(1, -1)
        wq, bq = _prescale_qkv(params['qkv_kernel'].astype(f32),
                               v('qkv_bias'), heads)
        wp = params['proj_kernel'].astype(f32)
        if cfg.hd_pad:
            wq, bq, wp = _pad_head_lanes(wq, bq, wp, heads,
                                         cfg.hd_pad)
        w1, bm1, w2 = (params['mlp1_kernel'].astype(f32),
                       v('mlp1_bias'),
                       params['mlp2_kernel'].astype(f32))
        if cfg.mlp_pad:
            w1, bm1, w2 = _pad_mlp_lanes(w1, bm1, w2, cfg.mlp_pad)
        return (v('ln1_scale'), v('ln1_bias'), wq, bq,
                wp, v('proj_bias'),
                v('ln2_scale'), v('ln2_bias'),
                w1, bm1, w2, v('mlp2_bias'),
                bias.astype(f32))

    return op(x, *pack(params_a, bias_a), *pack(params_b, bias_b))


# -----------------------------------------------------------------
# pallas_call plumbing + custom VJP
# -----------------------------------------------------------------


def _pick_img_blk(b: int, t: int, rows: int = 512) -> int:
    """Images per grid step: keep the per-program working set well
    under VMEM (~16MB) while giving matmuls >= `rows` rows
    (cfg.ib_rows overrides the row target for tuning)."""
    target = max(1, rows // t)
    ib = min(b, target)
    while b % ib:
        ib -= 1
    return ib


def _compiler_params(cfg):
    """Optional scoped-VMEM ceiling override (bytes, cfg.vmem_mb) for
    tuning larger images-per-program blocks; Mosaic's default scope is
    16MB."""
    if not cfg.vmem_mb:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(cfg.vmem_mb * 2 ** 20))


def _weight_specs(shapes):
    return [pl.BlockSpec(s, lambda i, n=len(s): (0,) * n,
                         memory_space=pltpu.VMEM) for s in shapes]


def _w_shapes(c, ch, nh, t, ca=None):
    """Weight/bias shapes; `ca` = attention channel width (heads*hd
    after cfg.hd_pad padding), defaulting to the model width c."""
    ca = c if ca is None else ca
    return [(1, c), (1, c), (c, 3 * ca), (1, 3 * ca), (ca, c), (1, c),
            (1, c), (1, c), (c, ch), (1, ch), (ch, c), (1, c),
            (nh, t, t)]


_CDT_IDX = (2, 3, 4, 8, 9, 10)       # wqkv bqkv wproj w1 bm1 w2
_BIAS_IDX = 12


def _cast_wb(wb, cdt, cfg):
    """Cast the weights consumed in cdt math ONCE at the XLA level, so
    the kernel body doesn't re-convert VMEM-resident f32 weights in
    every grid program (32 programs x 36 blocks of redundant casts).
    LN params and the f32-residual biases (bproj, bm2) stay f32; the
    attention bias follows the softmax dtype (cdt, or f32 under
    cfg.f32_softmax)."""
    return tuple(
        w.astype(cdt) if i in _CDT_IDX
        else (w if cfg.f32_softmax else w.astype(cdt))
        if i == _BIAS_IDX else w
        for i, w in enumerate(wb))


@functools.lru_cache(maxsize=None)
def _make_block_op(heads: int, interpret: bool, cdt, cfg: _Cfg):
    """Returns fused_block(x, *ws, bias) with custom VJP.
    x: (B, T, C) activation dtype; weights f32 as (1,n)/(m,n) 2-D;
    bias: (nh, T, T) f32. Gradients: dx in x.dtype, weights f32.
    cfg is part of the lru key: every knob combination is a distinct
    op (and therefore a distinct jit cache entry)."""

    def call_fwd(x, *wb):
        b, t, c = x.shape
        ib = _pick_img_blk(b, t, cfg.ib_rows)
        ch = wb[8].shape[1]
        grid = (b // ib,)
        return pl.pallas_call(
            functools.partial(_fwd_kernel, heads=heads, cdt=cdt,
                              cfg=cfg),
            out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
            grid=grid,
            in_specs=[pl.BlockSpec((ib, t, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + _weight_specs(_w_shapes(c, ch, heads, t,
                                      wb[2].shape[1] // 3)),
            out_specs=pl.BlockSpec((ib, t, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=_compiler_params(cfg),
            interpret=interpret,
        )(x, *_cast_wb(wb, cdt, cfg))

    @jax.custom_vjp
    def fused_block(x, *wb):
        return call_fwd(x, *wb)

    def fwd(x, *wb):
        return call_fwd(x, *wb), (x,) + wb

    def bwd(res, dout):
        x, *wb = res
        b, t, c = x.shape
        ib = _pick_img_blk(b, t, cfg.ib_rows)
        ch = wb[8].shape[1]
        grid = (b // ib,)
        w_shapes = _w_shapes(c, ch, heads, t, wb[2].shape[1] // 3)
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, heads=heads, cdt=cdt,
                              cfg=cfg),
            out_shape=[jax.ShapeDtypeStruct((b, t, c), x.dtype)]
            + [jax.ShapeDtypeStruct(s, jnp.float32)
               for s in w_shapes],
            grid=grid,
            in_specs=[pl.BlockSpec((ib, t, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + _weight_specs(w_shapes)
            + [pl.BlockSpec((ib, t, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((ib, t, c), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)]
            + _weight_specs(w_shapes),
            compiler_params=_compiler_params(cfg),
            interpret=interpret,
        )(x, *_cast_wb(wb, cdt, cfg), dout)
        return tuple(outs)

    fused_block.defvjp(fwd, bwd)
    return fused_block


def _prescale_qkv(wqkv, bqkv, heads):
    """Fold the attention scale hd**-0.5 into the q third of the qkv
    weights/bias (differentiable; XLA chains the grad automatically),
    saving a (T, hd) VPU pass per head inside the kernel."""
    c = wqkv.shape[0]
    scale = (c // heads) ** -0.5
    colmul = jnp.concatenate([jnp.full((1, c), scale, wqkv.dtype),
                              jnp.ones((1, 2 * c), wqkv.dtype)], -1)
    return wqkv * colmul, bqkv * colmul


def _pad_head_lanes(wq, bq, wproj, heads, hdp):
    """Zero-pad each head's q/k/v lane block hd -> hdp and wproj's
    input rows to match, so head slices inside the kernel land on
    hdp-aligned lane offsets (hd=30 at the flagship C=180 puts every
    slice at a 30-lane offset, which Mosaic handles with unaligned
    relayouts — the round-4 shape control, docs/BENCH_ANALYSIS.md,
    measured 1.36-2.7x per-MAC recovery at aligned widths). EXACT:
    zero q/k columns add exact zeros to QK^T, zero v columns produce
    zero O lanes, and the matching zero wproj rows erase them from the
    block output; the transforms are plain differentiable XLA pad ops,
    so the custom-VJP grads w.r.t. the padded weights flow back to the
    model params through the transposed (slice) ops automatically."""
    c = wproj.shape[1]
    hd = c // heads
    if hdp <= hd:
        return wq, bq, wproj
    pad4 = [(0, 0)] * 3 + [(0, hdp - hd)]
    cin = wq.shape[0]
    wq = jnp.pad(wq.reshape(cin, 3, heads, hd), pad4).reshape(
        cin, 3 * heads * hdp)
    bq = jnp.pad(bq.reshape(1, 3, heads, hd), pad4).reshape(
        1, 3 * heads * hdp)
    wproj = jnp.pad(wproj.reshape(heads, hd, c),
                    [(0, 0), (0, hdp - hd), (0, 0)]).reshape(
        heads * hdp, c)
    return wq, bq, wproj


def _pad_mlp_lanes(w1, bm1, w2, chp):
    """Zero-pad the MLP hidden width ch -> chp so the (m, ch) hidden
    activations tile the 128-wide lanes exactly (flagship ch=360 puts
    the last tile at 104/128). EXACT like _pad_head_lanes: padded w1
    columns and bm1 entries produce u=0 hidden lanes, gelu(0)=0, and
    the matching zero w2 rows erase them from the output; in the
    backward, dh on the padded lanes is g @ (zero w2 rows) = 0, so
    dw1/dbm1 pad-grads vanish and the XLA pad-op VJP slices grads back
    to the model shapes."""
    ch = w1.shape[1]
    if chp <= ch:
        return w1, bm1, w2
    pad = (0, chp - ch)
    return (jnp.pad(w1, [(0, 0), pad]), jnp.pad(bm1, [(0, 0), pad]),
            jnp.pad(w2, [pad, (0, 0)]))


def fused_swin_block(x, params, bias, *, heads: int,
                     interpret: bool = False,
                     compute_dtype=jnp.bfloat16):
    """One fused Swin block. x: (B, T, C); params: dict with keys
    ln1_scale, ln1_bias (C,), qkv_kernel (C,3C), qkv_bias (3C,),
    proj_kernel (C,C), proj_bias (C,), ln2_scale, ln2_bias (C,),
    mlp1_kernel (C,Ch), mlp1_bias (Ch,), mlp2_kernel (Ch,C),
    mlp2_bias (C,); bias: (nh, T, T) combined additive attn bias.
    Env knobs are snapshot here (see module docstring) and baked into
    the op identity."""
    cfg = _resolve_pads(_env_cfg(), heads,
                        params['proj_kernel'].shape[1],
                        params['mlp1_kernel'].shape[1])
    op = _make_block_op(heads, interpret,
                        jnp.dtype(compute_dtype), cfg)
    f32 = jnp.float32

    def v(name):
        return params[name].astype(f32).reshape(1, -1)

    wq, bq = _prescale_qkv(params['qkv_kernel'].astype(f32),
                           v('qkv_bias'), heads)
    wp = params['proj_kernel'].astype(f32)
    if cfg.hd_pad:
        wq, bq, wp = _pad_head_lanes(wq, bq, wp, heads, cfg.hd_pad)
    w1, bm1, w2 = (params['mlp1_kernel'].astype(f32), v('mlp1_bias'),
                   params['mlp2_kernel'].astype(f32))
    if cfg.mlp_pad:
        w1, bm1, w2 = _pad_mlp_lanes(w1, bm1, w2, cfg.mlp_pad)
    wb = (v('ln1_scale'), v('ln1_bias'), wq, bq,
          wp, v('proj_bias'),
          v('ln2_scale'), v('ln2_bias'),
          w1, bm1, w2, v('mlp2_bias'),
          bias.astype(f32))
    return op(x, *wb)


def swin_block_ref(x, params, bias, *, heads: int,
                   compute_dtype=jnp.bfloat16):
    """Pure-jnp oracle with IDENTICAL math (full-attention formulation,
    f32 accumulation, bf16 matmul inputs) for kernel tests."""
    b, t, c = x.shape
    f32 = jnp.float32

    def v(name):
        return params[name].astype(f32).reshape(1, -1)

    wq, bq = _prescale_qkv(params['qkv_kernel'].astype(f32),
                           v('qkv_bias'), heads)
    refs = (v('ln1_scale'), v('ln1_bias'), wq, bq,
            params['proj_kernel'].astype(f32), v('proj_bias'),
            v('ln2_scale'), v('ln2_bias'),
            params['mlp1_kernel'].astype(f32), v('mlp1_bias'),
            params['mlp2_kernel'].astype(f32), v('mlp2_bias'))

    class _R:  # mimic refs ([:] access) for _block_fwd_math
        def __init__(self, a):
            self.a = a

        def __getitem__(self, k):
            return self.a[k]

    rr = tuple(_R(a) for a in refs)
    xf = x.reshape(b * t, c).astype(f32)
    cfg = _env_cfg()
    bias_c = bias.astype(f32 if cfg.f32_softmax
                         else jnp.dtype(compute_dtype))
    out, _ = _block_fwd_math(xf, rr, _R(bias_c), b, t, c,
                             heads, jnp.dtype(compute_dtype), cfg)
    return out.reshape(b, t, c).astype(x.dtype)


# -----------------------------------------------------------------
# grouped-bias forward op (tiled full-image eval)
# -----------------------------------------------------------------


def _fwd_kernel_grouped(gid_ref, x_ref, g1, b1, wqkv, bqkv, wproj,
                        bproj, g2, b2, w1, bm1, w2, bm2, bias_ref,
                        out_ref, *, heads, cdt, cfg):
    """Same math as _fwd_kernel, but bias_ref is a (1, nh, t, t) block
    selected PER PROGRAM out of a (G, nh, t, t) group table by the
    scalar-prefetched gid array (the BlockSpec index_map does the
    selection; gid_ref itself is unused in the body)."""
    del gid_ref
    ib, t, c = x_ref.shape
    x = x_ref[:].reshape(ib * t, c).astype(jnp.float32)
    refs = (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bm1, w2, bm2)
    out, _ = _block_fwd_math(x, refs, bias_ref[0], ib, t, c, heads,
                             cdt, cfg)
    out_ref[:] = out.reshape(ib, t, c).astype(out_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_block_op_grouped(heads: int, interpret: bool, cdt,
                           cfg: _Cfg, ib: int):
    """Forward-only fused block whose attention bias varies per grid
    program: bias is (G, nh, T, T) in HBM and each program DMAs only
    block gid[i] (consecutive equal gids reuse the resident block).
    Used by the tiled full-image eval path (models/swin_fused.py),
    where G is the number of distinct shift-mask tile types; inference
    only, so no VJP."""

    def call(x, gid, *wb):
        b, t, c = x.shape
        ch = wb[8].shape[1]
        grid = (b // ib,)
        # index_maps receive (grid idx, scalar-prefetch ref) here
        w_specs = [pl.BlockSpec(s, lambda i, g, n=len(s): (0,) * n,
                                memory_space=pltpu.VMEM)
                   for s in _w_shapes(c, ch, heads, t,
                                      wb[2].shape[1] // 3)[:-1]]
        act = pl.BlockSpec((ib, t, c), lambda i, g: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        bias_spec = pl.BlockSpec(
            (1, heads, t, t), lambda i, g: (g[i], 0, 0, 0),
            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[act] + w_specs + [bias_spec],
            out_specs=act)
        return pl.pallas_call(
            functools.partial(_fwd_kernel_grouped, heads=heads,
                              cdt=cdt, cfg=cfg),
            out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
            grid_spec=grid_spec,
            compiler_params=_compiler_params(cfg),
            interpret=interpret,
        )(gid, x, *_cast_wb(wb, cdt, cfg))

    return call


def fused_swin_block_grouped(x, params, bias_groups, gid, *,
                             heads: int, ib: int,
                             interpret: bool = False,
                             compute_dtype=jnp.bfloat16):
    """Forward-only fused Swin block over tile batches with per-program
    bias-group selection. x: (B, T, C) tiles ordered so that every
    consecutive run of `ib` tiles shares a bias group; bias_groups:
    (G, nh, T, T); gid: (B//ib,) int32 group per program."""
    cfg = _resolve_pads(_env_cfg(), heads,
                        params['proj_kernel'].shape[1],
                        params['mlp1_kernel'].shape[1])
    op = _make_block_op_grouped(heads, interpret,
                                jnp.dtype(compute_dtype),
                                cfg, ib)
    f32 = jnp.float32

    def v(name):
        return params[name].astype(f32).reshape(1, -1)

    wq, bq = _prescale_qkv(params['qkv_kernel'].astype(f32),
                           v('qkv_bias'), heads)
    wp = params['proj_kernel'].astype(f32)
    if cfg.hd_pad:
        wq, bq, wp = _pad_head_lanes(wq, bq, wp, heads, cfg.hd_pad)
    w1, bm1, w2 = (params['mlp1_kernel'].astype(f32), v('mlp1_bias'),
                   params['mlp2_kernel'].astype(f32))
    if cfg.mlp_pad:
        w1, bm1, w2 = _pad_mlp_lanes(w1, bm1, w2, cfg.mlp_pad)
    wb = (v('ln1_scale'), v('ln1_bias'), wq, bq,
          wp, v('proj_bias'),
          v('ln2_scale'), v('ln2_bias'),
          w1, bm1, w2, v('mlp2_bias'),
          bias_groups.astype(f32))
    return op(x, gid, *wb)
