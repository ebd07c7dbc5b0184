"""Permutohedral attention module (PAM analog)."""
import numpy as np
import jax.numpy as jnp


def test_pam_attention_matches_bruteforce():
    from srcaco2_tpu.ops.pam import permutohedral_attention
    rng = np.random.default_rng(0)
    n, d, v = 64, 3, 2
    f = rng.uniform(0, 3, (1, n, d)).astype(np.float32)
    vals = rng.uniform(0, 1, (1, n, v)).astype(np.float32)
    got = np.asarray(permutohedral_attention(jnp.asarray(f),
                                             jnp.asarray(vals)))[0]
    d2 = ((f[0][:, None] - f[0][None]) ** 2).sum(-1)
    w = np.exp(-0.5 * d2)
    want = (w @ vals[0]) / (w @ np.ones((n, 1)))
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.98, corr
