"""Tiled/ensembled inference modes.

Capability parity with dlib/utils/utils_model.py:51 (test_mode):
  0 normal, 1 pad-to-modulo, 2 recursive spatial split, 3 x8
  geometric self-ensemble (TTA), 4 split + x8.
Hooked like ModelPlain.testx8:404 via the `test_mode` flag.

TPU notes: the quadrant split recursion happens at trace time (static
shapes), so each distinct tile size compiles once and the 4 tile
forwards batch; the x8 ensemble evaluates all 8 dihedral variants in one
batched forward instead of 8 sequential calls.
"""
import math
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from srcaco2_tpu.data.pipeline import dihedral


def test_pad(fwd: Callable, l_im: jax.Array, modulo: int = 16,
             sf: int = 1) -> jax.Array:
    h, w = l_im.shape[-2:]
    pb = int(math.ceil(h / modulo) * modulo - h)
    pr = int(math.ceil(w / modulo) * modulo - w)
    if pb or pr:
        l_im = jnp.pad(l_im, ((0, 0), (0, 0), (0, pb), (0, pr)),
                       mode='edge')
    e = fwd(l_im)
    return e[..., :h * sf, :w * sf]


def test_split(fwd: Callable, l_im: jax.Array, refield: int = 32,
               min_size: int = 256, sf: int = 1,
               modulo: int = 1) -> jax.Array:
    """Recursive quadrant split (overlapping tiles, seam-free paste)."""
    h, w = l_im.shape[-2:]
    if h * w <= min_size ** 2:
        return test_pad(fwd, l_im, modulo, sf)
    top = (h // 2 // refield + 1) * refield
    left = (w // 2 // refield + 1) * refield
    # overlapping quadrants (reference slicing)
    ls = [l_im[..., :top, :left],
          l_im[..., :top, w - left:],
          l_im[..., h - top:, :left],
          l_im[..., h - top:, w - left:]]
    if h * w <= 4 * min_size ** 2:
        es = [fwd(t) for t in ls]
    else:
        es = [test_split(fwd, t, refield, min_size, sf, modulo)
              for t in ls]
    b, c = es[0].shape[:2]
    h2, w2 = h // 2, w // 2
    out = jnp.zeros((b, c, sf * h, sf * w), es[0].dtype)
    out = out.at[..., :h2 * sf, :w2 * sf].set(
        es[0][..., :h2 * sf, :w2 * sf])
    out = out.at[..., :h2 * sf, w2 * sf:].set(
        es[1][..., :h2 * sf, (w2 - w) * sf:])
    out = out.at[..., h2 * sf:, :w2 * sf].set(
        es[2][..., (h2 - h) * sf:, :w2 * sf])
    out = out.at[..., h2 * sf:, w2 * sf:].set(
        es[3][..., (h2 - h) * sf:, (w2 - w) * sf:])
    return out


def test_x8(fwd: Callable, l_im: jax.Array, modulo: int = 1,
            sf: int = 1) -> jax.Array:
    """Geometric self-ensemble: average the 8 dihedral variants. All 8
    run in ONE batched forward."""
    b = l_im.shape[0]
    hwc = l_im.transpose(0, 2, 3, 1)
    variants = jnp.stack([jax.vmap(lambda im, m=m: dihedral(im,
                                                            jnp.int32(m))
                                   )(hwc) for m in range(8)])  # 8,B,H,W,C
    if l_im.shape[-2] == l_im.shape[-1]:
        # square input: one batched forward over all 8 variants.
        batch = variants.reshape(-1, *variants.shape[2:]).transpose(
            0, 3, 1, 2)
        e = test_pad(fwd, batch, modulo, sf)          # (8B, C, H', W')
        es = [e.reshape(8, b, *e.shape[1:])[m].transpose(0, 2, 3, 1)
              for m in range(8)]
    else:
        # non-square: rotated variants change shape; run per variant.
        es = [test_pad(fwd, variants[m].transpose(0, 3, 1, 2),
                       modulo, sf).transpose(0, 2, 3, 1)
              for m in range(8)]
    # inverse transforms: rot(k)^-1 = rot(4-k); flip-variants are
    # involutions (verified in tests).
    inverse = [0, 3, 2, 1, 4, 5, 6, 7]
    outs = []
    for m in range(8):
        inv = jax.vmap(lambda im, mm=inverse[m]: dihedral(
            im, jnp.int32(mm)))(es[m])
        outs.append(inv.transpose(0, 3, 1, 2))
    return sum(outs) / 8.0


def test_mode(fwd: Callable, l_im: jax.Array, mode: int = 0,
              refield: int = 32, min_size: int = 256, sf: int = 1,
              modulo: int = 1) -> jax.Array:
    if mode == 0:
        return fwd(l_im)
    if mode == 1:
        return test_pad(fwd, l_im, modulo, sf)
    if mode == 2:
        return test_split(fwd, l_im, refield, min_size, sf, modulo)
    if mode == 3:
        return test_x8(fwd, l_im, modulo, sf)
    if mode == 4:
        def x8fwd(t):
            return test_x8(fwd, t, modulo, sf)
        return test_split(x8fwd, l_im, refield, min_size, sf, modulo)
    raise NotImplementedError(mode)
