"""GRL merged-attention path (SRCACO2_GRL_MERGED): numerical parity
with the windowed reference formulation.

The merged path rewrites per-window / per-stripe attention as full
attention over 2ws x 2ws token tiles with block-diagonally expanded
CPB bias and -100 off-block masking (models/grl.py:_merged). Off-block
softmax mass is e^-100 ~ 4e-44, so the two formulations agree to f32
rounding; these tests pin that equivalence on both the train-patch
geometry (single tile, shifted + unshifted blocks) and a multi-tile
eval geometry (exercising the per-tile shift-mask groups).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srcaco2_tpu.models.grl import GRL


def _forward(model, v, x, merged: bool):
    old = os.environ.get('SRCACO2_GRL_MERGED')
    os.environ['SRCACO2_GRL_MERGED'] = '1' if merged else '0'
    try:
        return model.apply(v, x)['out']
    finally:
        if old is None:
            os.environ.pop('SRCACO2_GRL_MERGED', None)
        else:
            os.environ['SRCACO2_GRL_MERGED'] = old


@pytest.mark.parametrize('hw', [16, 32])
def test_merged_equals_windowed(hw):
    # benchmark geometry: window 8, stripes (8,8), df 2; two blocks =
    # one shifted/H-stripe + one unshifted/W-stripe (the alternation).
    model = GRL(upscale=2, embed_dim=36, depths=(2,),
                num_heads_window=(3,), num_heads_stripe=(3,),
                window_size=8, stripe_size=(8, 8),
                anchor_window_down_factor=2, scan_blocks=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 1, hw, hw)), jnp.float32)
    v = model.init(jax.random.key(0), x)
    # perturb params away from init symmetry (logit scales, biases)
    v = jax.tree.map(
        lambda a: a + 0.03 * jnp.asarray(
            np.random.default_rng(1).standard_normal(a.shape),
            a.dtype) if a.dtype == jnp.float32 else a, v)
    ref = _forward(model, v, x, merged=False)
    mrg = _forward(model, v, x, merged=True)
    np.testing.assert_allclose(np.asarray(mrg), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_non_tileable_falls_back():
    # 24x24 is window-divisible but not 2ws-divisible: the merged flag
    # must route to the windowed path and still be exact.
    model = GRL(upscale=2, embed_dim=36, depths=(2,),
                num_heads_window=(3,), num_heads_stripe=(3,),
                window_size=8, stripe_size=(8, 8),
                anchor_window_down_factor=2, scan_blocks=False)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 1, 24, 24)), jnp.float32)
    v = model.init(jax.random.key(0), x)
    ref = _forward(model, v, x, merged=False)
    mrg = _forward(model, v, x, merged=True)
    np.testing.assert_allclose(np.asarray(mrg), np.asarray(ref),
                               rtol=0, atol=0)
