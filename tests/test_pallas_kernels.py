"""Pallas kernels: interpret-mode correctness vs the jnp reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize('with_mask', [False, True])
def test_window_attention_pallas_matches_reference(with_mask):
    from srcaco2_tpu.ops.pallas.window_attention import (
        window_attention_pallas, window_attention_reference)
    rng = np.random.default_rng(0)
    w, n, heads, hd = 12, 64, 4, 16
    c = heads * hd
    qkv = jnp.asarray(rng.normal(0, 1, (w, n, 3 * c)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 1, (heads, n, n)), jnp.float32)
    mask = None
    if with_mask:
        m = rng.choice([0.0, -100.0], size=(w, n, n), p=[0.8, 0.2])
        mask = jnp.asarray(m, jnp.float32)
    got = window_attention_pallas(qkv, bias, mask, heads=heads,
                                  block_windows=8, interpret=True)
    want = window_attention_reference(qkv, bias, mask, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_swinir_pallas_path_matches_xla():
    """Same params, pallas vs XLA attention produce the same output
    (interpret mode on CPU)."""
    from srcaco2_tpu import constants
    from srcaco2_tpu.models.swinir import SwinIR
    import srcaco2_tpu.ops.pallas.window_attention as wa
    import functools
    # force interpret mode inside the model path
    orig = wa.window_attention_pallas
    wa_interp = functools.partial(orig, interpret=True)
    wa.window_attention_pallas = wa_interp
    try:
        kw = dict(in_chans=1, upscale=2, window_size=4, embed_dim=8,
                  depths=(2,), num_heads=(2,),
                  upsampler=constants.US_PIXEL_SHUFFLE_DIRECT)
        m_x = SwinIR(**kw, use_pallas_attn=False)
        m_p = SwinIR(**kw, use_pallas_attn=True)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 1, 8, 8)).astype(np.float32))
        params = m_x.init(jax.random.key(0), x, train=False)['params']
        ox = m_x.apply({'params': params}, x, train=False)['out']
        op = m_p.apply({'params': params}, x, train=False)['out']
        np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                                   atol=1e-5)
    finally:
        wa.window_attention_pallas = orig
