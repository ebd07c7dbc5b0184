"""Patch (un)folding utilities (torch F.unfold/F.fold analogs).

ACT tokenizes with unfold(k=3, s=3) (non-overlapping -> pure reshape) and
builds cross-scale tokens with unfold(k=6, s=3) / fold(k=6, s=3)
(overlapping, fold = overlap-ADD). The k = 2s case is implemented as four
quadrant shifts — reshapes and padded adds only, no scatter — which XLA
fuses cleanly on TPU.

Token layout matches torch: channel-major (c, kh, kw) flattened per token,
tokens in row-major tile order.

Sizes that are NOT a multiple of the stride are handled with torch's
exact F.unfold/F.fold semantics (reference `network_act.py:476-526` runs
unfold/fold on whatever (h, w) the head produced, e.g. 16x16 at the
x8/128 benchmark patch size): unfold extracts the largest fitting token
grid (silently dropping the bottom/right remainder rows), and fold
writes tokens back into a zero-initialized (h, w) canvas (the remainder
border stays zero).
"""
import jax.numpy as jnp


def unfold_nonoverlap(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, T, C*k*k), stride k == kernel k.

    T = (H//k) * (W//k); remainder rows/cols are dropped (torch
    F.unfold semantics)."""
    b, h, w, c = x.shape
    th, tw = h // k, w // k
    x = x[:, :th * k, :tw * k]
    y = x.reshape(b, th, k, tw, k, c)
    y = y.transpose(0, 1, 3, 5, 2, 4)          # b, th, tw, c, kh, kw
    return y.reshape(b, th * tw, c * k * k)


def fold_nonoverlap(t: jnp.ndarray, k: int, hw) -> jnp.ndarray:
    """Inverse of unfold_nonoverlap: (B, T, C*k*k) -> (B, H, W, C).

    If (h, w) is not a token-grid multiple the uncovered bottom/right
    border is zero (torch F.fold semantics)."""
    h, w = hw
    b = t.shape[0]
    th, tw = h // k, w // k
    c = t.shape[-1] // (k * k)
    y = t.reshape(b, th, tw, c, k, k)
    y = y.transpose(0, 1, 4, 2, 5, 3)          # b, th, kh, tw, kw, c
    y = y.reshape(b, th * k, tw * k, c)
    if th * k != h or tw * k != w:
        y = jnp.pad(y, ((0, 0), (0, h - th * k), (0, w - tw * k),
                        (0, 0)))
    return y


def unfold_k2s(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """unfold with kernel 2s, stride s: (B,H,W,C) -> (B, T, C*2s*2s)
    where T = (H//s - 1) * (W//s - 1); remainder dropped."""
    b, h, w, c = x.shape
    gh, gw = h // s, w // s                    # covered tile grid
    th, tw = gh - 1, gw - 1
    x = x[:, :gh * s, :gw * s]
    q = x.reshape(b, gh, s, gw, s, c)
    q = q.transpose(0, 1, 3, 5, 2, 4)          # b, Th, Tw, c, s, s (tiles)
    # token (i,j) = tiles (i..i+1, j..j+1)
    tl = q[:, :-1, :-1]
    tr = q[:, :-1, 1:]
    bl = q[:, 1:, :-1]
    br = q[:, 1:, 1:]
    top = jnp.concatenate([tl, tr], axis=5)    # width 2s
    bot = jnp.concatenate([bl, br], axis=5)
    tok = jnp.concatenate([top, bot], axis=4)  # b,th,tw,c,2s,2s
    return tok.reshape(b, th * tw, c * 4 * s * s)


def fold_k2s(t: jnp.ndarray, s: int, hw) -> jnp.ndarray:
    """fold with kernel 2s, stride s (overlap-ADD):
    (B, T, C*2s*2s) -> (B, H, W, C); uncovered border zero."""
    h, w = hw
    b = t.shape[0]
    gh, gw = h // s, w // s
    th, tw = gh - 1, gw - 1
    c = t.shape[-1] // (4 * s * s)
    tok = t.reshape(b, th, tw, c, 2 * s, 2 * s)
    # split back into the four s x s quadrants
    tl = tok[:, :, :, :, :s, :s]
    tr = tok[:, :, :, :, :s, s:]
    bl = tok[:, :, :, :, s:, :s]
    br = tok[:, :, :, :, s:, s:]
    # accumulate on the (Th+1, Tw+1) tile grid
    grid = jnp.zeros((b, th + 1, tw + 1, c, s, s), t.dtype)
    grid = grid.at[:, :-1, :-1].add(tl)
    grid = grid.at[:, :-1, 1:].add(tr)
    grid = grid.at[:, 1:, :-1].add(bl)
    grid = grid.at[:, 1:, 1:].add(br)
    y = grid.transpose(0, 1, 4, 2, 5, 3)       # b, Th, s, Tw, s, c
    y = y.reshape(b, gh * s, gw * s, c)
    if gh * s != h or gw * s != w:
        y = jnp.pad(y, ((0, 0), (0, h - gh * s), (0, w - gw * s),
                        (0, 0)))
    return y
