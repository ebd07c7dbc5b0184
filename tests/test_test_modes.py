"""Tiled/ensembled inference modes: identity checks with a linear model
(for which TTA and splitting must be exact no-ops)."""
import numpy as np
import jax
import jax.numpy as jnp

from srcaco2_tpu.data.pipeline import dihedral
from srcaco2_tpu.train import test_modes as TM
from srcaco2_tpu.ops.resize import resize2d


def _bicubic_x2(l_im):
    h, w = l_im.shape[-2:]
    return resize2d(l_im, (2 * h, 2 * w))


def test_dihedral_inverses():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (8, 8, 1)).astype(np.float32))
    inverse = [0, 3, 2, 1, 4, 5, 6, 7]
    for m in range(8):
        y = dihedral(x, jnp.int32(m))
        back = dihedral(y, jnp.int32(inverse[m]))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   atol=1e-6, err_msg=f'mode {m}')


def test_x8_is_noop_for_equivariant_model():
    """Bicubic x2 commutes with dihedral transforms on square inputs,
    so the 8-way ensemble must reproduce the plain forward."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 1, 16, 16)).astype(np.float32))
    plain = _bicubic_x2(x)
    ens = TM.test_x8(_bicubic_x2, x, modulo=1, sf=2)
    np.testing.assert_allclose(np.asarray(ens), np.asarray(plain),
                               atol=1e-5)


def test_split_matches_full_for_local_model():
    """A pointwise model (x -> 2x upscaled nearest) splits exactly."""
    def fwd(l):
        return jnp.repeat(jnp.repeat(l, 2, axis=-2), 2, axis=-1)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 1, 64, 48)).astype(np.float32))
    full = fwd(x)
    split = TM.test_split(fwd, x, refield=8, min_size=16, sf=2)
    np.testing.assert_allclose(np.asarray(split), np.asarray(full),
                               atol=1e-6)


def test_pad_mode():
    def fwd(l):
        assert l.shape[-1] % 8 == 0 and l.shape[-2] % 8 == 0
        return jnp.repeat(jnp.repeat(l, 2, axis=-2), 2, axis=-1)

    x = jnp.ones((1, 1, 13, 11))
    out = TM.test_pad(fwd, x, modulo=8, sf=2)
    assert out.shape == (1, 1, 26, 22)


def test_mode_dispatch():
    def fwd(l):
        return jnp.repeat(jnp.repeat(l, 2, axis=-2), 2, axis=-1)
    x = jnp.ones((1, 1, 16, 16))
    for mode in range(5):
        out = TM.test_mode(fwd, x, mode=mode, refield=8, min_size=8,
                           sf=2, modulo=1)
        assert out.shape == (1, 1, 32, 32), mode


def test_eval_forward_with_tta_mode():
    """make_eval_forward(test_mode=3) runs the x8 ensemble."""
    import jax
    from srcaco2_tpu import constants
    from srcaco2_tpu.models.cnn_pre import SRCNN
    from srcaco2_tpu.train.steps import make_eval_forward
    m = SRCNN(in_chans=1)
    x = jnp.zeros((1, 1, 16, 16))
    params = m.init(jax.random.key(0), x, train=False)['params']
    fwd = make_eval_forward(m, constants.SRCNN, 2, test_mode=3)
    batch = {'l_im': jnp.zeros((2, 1, 8, 8)),
             'l_to_h_img': jnp.asarray(
                 np.random.default_rng(0).uniform(
                     0, 1, (2, 1, 16, 16)).astype(np.float32))}
    out = fwd(params, batch)
    assert out.shape == (2, 1, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))
