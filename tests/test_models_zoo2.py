"""Shape + finiteness tests for the remaining zoo (tiny configs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcaco2_tpu import constants


def _run(model, shape=(1, 1, 8, 8)):
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, shape).astype(np.float32))
    params = model.init(jax.random.key(0), x, train=False)['params']
    out = model.apply({'params': params}, x, train=False)
    assert np.all(np.isfinite(np.asarray(out['out'])))
    return out, params


def test_omnisr():
    from srcaco2_tpu.models.omnisr import OmniSR
    m = OmniSR(in_chans=1, upscale=2, num_feat=16, res_num=1,
               block_num=1, window_size=4, pe=True)
    out, _ = _run(m, (1, 1, 16, 16))
    assert out['out'].shape == (1, 1, 32, 32)
    # non-multiple input exercises the zero pad
    x = jnp.zeros((1, 1, 14, 15))
    p = m.init(jax.random.key(0), x, train=False)['params']
    o = m.apply({'params': p}, x, train=False)['out']
    assert o.shape == (1, 1, 28, 30)


def test_act():
    from srcaco2_tpu.models.act import ACT
    m = ACT(in_chans=1, upscale=2, n_feats=8, n_resgroups=2,
            n_resblocks=2, reduction=4, n_heads=4, n_layers=4,
            n_fusionblocks=2, token_size=3, expansion_ratio=2)
    out, _ = _run(m, (1, 1, 9, 9))
    assert out['out'].shape == (1, 1, 18, 18)


def test_act_indivisible_size():
    """The x8/128 benchmark patch gives ACT a 16x16 input — not a
    token-size multiple. Reference F.unfold/F.fold silently crop the
    token grid and zero-fill the border (network_act.py:476-526);
    the fold/unfold ops reproduce that instead of failing."""
    from srcaco2_tpu.models.act import ACT
    m = ACT(in_chans=1, upscale=8, n_feats=8, n_resgroups=2,
            n_resblocks=2, reduction=4, n_heads=4, n_layers=4,
            n_fusionblocks=2, token_size=3, expansion_ratio=2)
    out, _ = _run(m, (1, 1, 16, 16))
    assert out['out'].shape == (1, 1, 128, 128)


@pytest.mark.parametrize('scale,n_inter', [(2, 0), (8, 2)])
def test_prosr(scale, n_inter):
    from srcaco2_tpu.models.prosr import ProSR
    m = ProSR(in_chans=1, upscale=scale, num_init_features=16,
              growth_rate=8, bn_size=2,
              level_config={2: [[2]], 4: [[2], [2]],
                            8: [[2, 2], [2], [2]]})
    out, _ = _run(m, (1, 1, 4, 4))
    assert out['out'].shape == (1, 1, 4 * scale, 4 * scale)
    assert len(out['intermediate_outs']) == n_inter


def test_grl():
    from srcaco2_tpu.models.grl import GRL
    m = GRL(in_chans=1, upscale=2, window_size=4, embed_dim=16,
            depths=(2,), num_heads_window=(2,), num_heads_stripe=(2,),
            mlp_ratio=2.0, stripe_size=(4, 4),
            anchor_window_down_factor=2, local_connection=True,
            upsampler=constants.US_PIXEL_SHUFFLE_DIRECT)
    out, _ = _run(m, (1, 1, 8, 8))
    assert out['out'].shape == (1, 1, 16, 16)
    # reflect-pad path on non-multiple input
    x = jnp.zeros((1, 1, 7, 6))
    p = m.init(jax.random.key(0), x, train=False)['params']
    o = m.apply({'params': p}, x, train=False)['out']
    assert o.shape == (1, 1, 14, 12)


def test_edsr_liif():
    from srcaco2_tpu.models.edsr_liif import EDSRLIIF
    m = EDSRLIIF(in_chans=1, upscale=4, n_feats=16, n_resblocks=2)
    out, _ = _run(m, (1, 1, 8, 8))
    assert out['out'].shape == (1, 1, 32, 32)


def test_edsr_liif_factored_decoder_exact():
    """The TPU decoder layout factors the first LIIF layer:
    gather(unfold(feat)) @ W_f == gather(conv3x3(feat; W_f)) with
    edge padding (models/edsr_liif.py module docstring). Verify the
    identity numerically on random tensors."""
    import numpy as np
    rng = np.random.default_rng(0)
    b, hl, wl, c, hid = 2, 5, 6, 3, 7
    feat = jnp.asarray(rng.normal(0, 1, (b, hl, wl, c)),
                       jnp.float32)
    kernel = jnp.asarray(rng.normal(0, 1, (3, 3, c, hid)),
                         jnp.float32)
    # conv path (as the model computes it)
    fp = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge')
    z = jax.lax.conv_general_dilated(
        fp, kernel, (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    # naive path: unfold concat (dy, dx order) then matmul
    neigh = [fp[:, 1 + dy:1 + dy + hl, 1 + dx:1 + dx + wl]
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    unf = jnp.concatenate(neigh, axis=-1)            # b, hl, wl, 9c
    w1 = jnp.concatenate([kernel[dy + 1, dx + 1]
                          for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                         axis=0)                     # 9c, hid
    z_naive = unf @ w1
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_naive),
                               atol=1e-4)
    # per-query gather commutes with the per-position matmul
    iy = np.asarray([0, 0, 1, 2, 4, 4], np.int32)
    ix = np.asarray([1, 3, 5, 0, 2, 2], np.int32)
    g1 = z[:, iy][:, :, ix]
    g2 = (unf[:, iy][:, :, ix]) @ w1
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4)


def test_edsr_liif_onehot_gather_exact(monkeypatch):
    """The default one-hot-matmul ensemble gather must be exact vs
    the take path (SRCACO2_LIIF_ONEHOT=0): forward and grads agree
    (the matmul VJP replaces the scatter-add)."""
    import numpy as np
    from srcaco2_tpu.models.edsr_liif import EDSRLIIF
    m = EDSRLIIF(in_chans=1, upscale=2, n_feats=8, n_resblocks=2,
                 hidden=16)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0.5, 0.2, (2, 1, 6, 6)), jnp.float32)
    p = m.init(jax.random.key(0), x)['params']

    def loss(p):
        return jnp.sum(jnp.sin(m.apply({'params': p}, x)['out']))

    monkeypatch.setenv('SRCACO2_LIIF_ONEHOT', '0')
    y0, g0 = jax.value_and_grad(loss)(p)
    monkeypatch.setenv('SRCACO2_LIIF_ONEHOT', '1')
    y1, g1 = jax.value_and_grad(loss)(p)
    np.testing.assert_allclose(float(y1), float(y0), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_edsr_liif_constant_input_periodic():
    """For a constant input, every decoder input (latent, rel, cell,
    ensemble areas) is s-periodic over the interior query grid, so the
    output must repeat with period s — a structural check of the
    rel-coordinate / gather bookkeeping."""
    from srcaco2_tpu.models.edsr_liif import EDSRLIIF
    s = 2
    m = EDSRLIIF(in_chans=1, upscale=s, n_feats=8, n_resblocks=1)
    x = jnp.full((1, 1, 16, 16), 0.5, jnp.float32)
    p = m.init(jax.random.key(1), x, train=False)['params']
    o = m.apply({'params': p}, x, train=False)['out']
    assert o.shape == (1, 1, 32, 32)
    assert bool(jnp.all(jnp.isfinite(o)))
    # crop past the encoder+decoder receptive field (~6 LR px)
    inner = o[0, 0, 12:-12, 12:-12]
    import numpy as np
    np.testing.assert_allclose(np.asarray(inner[s:, s:]),
                               np.asarray(inner[:-s, :-s]), atol=1e-4)


def test_dsr_splines():
    from srcaco2_tpu.models.dsr_splines import DSRSplines
    m = DSRSplines(in_planes=1, upscale=2, n_splines_per_color=4,
                   splinenet_type='snet_type1',
                   use_global_residual=True)
    out, _ = _run(m, (1, 1, 8, 8))
    assert out['out'].shape == (1, 1, 16, 16)
    assert 'global_residual' in out and 'x_interp' in out


def test_dsr_splines_masks_partition():
    """Every pixel belongs to exactly one spline's knot interval."""
    from srcaco2_tpu.models.dsr_splines import make_knots
    knots = make_knots(0, 255, 16)
    assert knots[0][0] == 0 and knots[-1][1] == 255
    covered = sum(hi - lo + 1 for lo, hi in knots)
    assert covered == 256


def test_csrcnn_unet_regression():
    from srcaco2_tpu.models.csrcnn import CSRCNN
    m = CSRCNN(in_planes=1, upscale=2, net_type=constants.NET_TYPE_UNET,
               inner_channel=8, res_blocks=1)
    out, _ = _run(m, (1, 1, 16, 16))   # fed HR-sized l_to_h
    assert out['out'].shape == (1, 1, 16, 16)
    assert 'global_residual' in out


def test_csrcnn_unet_segmentation():
    from srcaco2_tpu.models.csrcnn import CSRCNN
    m = CSRCNN(in_planes=1, upscale=2, net_type=constants.NET_TYPE_UNET,
               inner_channel=8, res_blocks=1, use_global_residual=False,
               net_task=constants.SEGMENTATION)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 1, 16, 16)).astype(np.float32))
    params = m.init(jax.random.key(0), x, train=False)['params']
    out = m.apply({'params': params}, x, train=True)
    assert out['raw_segmentation'].shape == (1, 256, 16, 16)
    assert out['out'].shape == (1, 1, 16, 16)


def test_csrcnn_pyramid():
    from srcaco2_tpu.models.csrcnn import CSRCNN
    m = CSRCNN(in_planes=1, upscale=2,
               net_type=constants.NET_TYPE_PYRAMID,
               inner_channel=8, res_blocks=1,
               use_global_residual=True)
    out, _ = _run(m, (1, 1, 8, 8))
    assert out['out'].shape == (1, 1, 16, 16)


def test_patches_roundtrip():
    from srcaco2_tpu.ops.patches import (fold_k2s, fold_nonoverlap,
                                         unfold_k2s, unfold_nonoverlap)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 12, 9, 4)).astype(np.float32))
    t = unfold_nonoverlap(x, 3)
    assert t.shape == (2, 12, 36)
    np.testing.assert_allclose(np.asarray(fold_nonoverlap(t, 3, (12, 9))),
                               np.asarray(x), atol=1e-6)
    t2 = unfold_k2s(x, 3)
    assert t2.shape == (2, 3 * 2, 4 * 36)
    # fold(unfold(x)) = x weighted by per-pixel coverage counts
    back = np.asarray(fold_k2s(t2, 3, (12, 9)))
    cov = np.asarray(fold_k2s(jnp.ones_like(t2) *
                              unfold_k2s(jnp.ones_like(x), 3), 3,
                              (12, 9)))
    np.testing.assert_allclose(back, np.asarray(x) * cov, atol=1e-5)


def test_patches_match_torch_unfold_indivisible():
    """Crop/zero-fill semantics on non-multiple sizes must equal torch
    F.unfold/F.fold exactly (the reference tokenizes whatever (h, w)
    arrives — 16x16 at the x8 benchmark patch)."""
    import torch
    import torch.nn.functional as F
    from srcaco2_tpu.ops.patches import (fold_k2s, fold_nonoverlap,
                                         unfold_k2s, unfold_nonoverlap)
    rng = np.random.default_rng(1)
    for (h, w) in [(16, 16), (16, 13), (12, 12)]:
        x = rng.uniform(0, 1, (2, 5, h, w)).astype(np.float32)
        tx = torch.from_numpy(x)
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))        # NHWC
        # non-overlapping k=s=3
        tu = F.unfold(tx, 3, stride=3).transpose(1, 2).numpy()
        ju = np.asarray(unfold_nonoverlap(xj, 3))
        np.testing.assert_allclose(ju, tu, atol=1e-6)
        tf = F.fold(torch.from_numpy(tu).transpose(1, 2), (h, w), 3,
                    stride=3).numpy()
        jf = np.asarray(fold_nonoverlap(jnp.asarray(tu), 3,
                                        (h, w))).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(jf, tf, atol=1e-6)
        # overlapping k=6, s=3 (overlap-add fold)
        tu2 = F.unfold(tx, 6, stride=3).transpose(1, 2).numpy()
        ju2 = np.asarray(unfold_k2s(xj, 3))
        np.testing.assert_allclose(ju2, tu2, atol=1e-6)
        tf2 = F.fold(torch.from_numpy(tu2).transpose(1, 2), (h, w), 6,
                     stride=3).numpy()
        jf2 = np.asarray(fold_k2s(jnp.asarray(tu2), 3,
                                  (h, w))).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(jf2, tf2, atol=1e-5)


def test_all_models_via_registry():
    """define_g builds every registered net from its default config."""
    from srcaco2_tpu.config.defaults import get_config
    from srcaco2_tpu.models.registry import define_g
    for nt in constants.MODELS:
        cfg = get_config(nt)
        cfg['n_channels'] = 1
        cfg['scale'] = 2
        cfg['h_size'] = 32
        from srcaco2_tpu.config.net_defaults import init_net_g
        cfg['netG']['net_type'] = nt
        cfg['netG'] = init_net_g({'net_type': nt,
                                  'net_task': constants.REGRESSION}, cfg)
        model = define_g(cfg)
        assert model is not None, nt


def test_srfbn_remat_transparent():
    """Per-step remat (models/srfbn.py remat_steps) must be
    numerically and structurally transparent: same param tree, same
    forward, same grads."""
    import jax
    import jax.numpy as jnp
    from srcaco2_tpu.models.srfbn import SRFBN
    x = jnp.asarray(np.random.default_rng(0).random((1, 1, 8, 8)),
                    jnp.float32)
    kw = dict(upscale=2, num_features=8, num_steps=2, num_groups=2)
    m1 = SRFBN(remat_steps=False, **kw)
    m2 = SRFBN(remat_steps=True, **kw)
    v = m1.init(jax.random.key(0), x)
    assert (jax.tree.structure(v['params'])
            == jax.tree.structure(m2.init(jax.random.key(0), x)['params']))
    o1 = m1.apply(v, x)['out']
    o2 = m2.apply(v, x)['out']
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def loss(m):
        return lambda p: jnp.sum(m.apply({'params': p}, x)['out'] ** 2)
    g1 = jax.grad(loss(m1))(v['params'])
    g2 = jax.grad(loss(m2))(v['params'])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
