"""Data layer tests: synthetic dataset, staging, device pipeline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.data import pipeline as P
from srcaco2_tpu.data import sampling as S
from srcaco2_tpu.data.dataset import load_dataset
from srcaco2_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('synthds'))
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=6, n_val=2, n_test=2, size=128)
    return root, names


def _args(root, scale=2):
    return {'data_root': root, 'splits_root': root, 'scale': scale,
            'n_channels': 1, 'myseed': 0, 'use_interpolated_low': False,
            'inter_low_th': 7., 'inter_low_sigma': 6., 'num_workers': 2}


def test_load_real_lr(synth_root):
    root, names = synth_root
    ds = load_dataset(_args(root), names[0], 'train')
    assert ds.hr.shape == (6, 128, 128, 1) and ds.hr.dtype == np.uint8
    assert ds.lr.shape == (6, 64, 64, 1)
    assert ds.lr_is_real
    assert len(ds.ids) == 6


def test_load_interpolated_low(synth_root):
    root, names = synth_root
    a = _args(root)
    a['use_interpolated_low'] = True
    ds = load_dataset(a, names[0], 'train')
    assert not ds.lr_is_real
    ds_real = load_dataset(_args(root), names[0], 'train')
    # synthesized LR must differ from the real microscope LR
    assert np.abs(ds.lr.astype(int) - ds_real.lr.astype(int)).mean() > 0.5
    # determinism: same seed -> same synthesis
    ds2 = load_dataset(a, names[0], 'train')
    np.testing.assert_array_equal(ds.lr, ds2.lr)


def test_train_batch_shapes_and_determinism(synth_root):
    root, names = synth_root
    ds = load_dataset(_args(root), names[0], 'train').stage()
    cfg = P.PipeConfig(scale=2, h_size=32)
    key = jax.random.key(1)
    idxs = jnp.array([0, 1, 2, 3])
    b1 = P.make_train_batch(ds.hr_dev, ds.lr_dev, idxs, key, cfg)
    assert b1['l_im'].shape == (4, 1, 16, 16)
    assert b1['h_im'].shape == (4, 1, 32, 32)
    assert b1['l_to_h_img'].shape == (4, 1, 32, 32)
    for k in ('l_im', 'h_im', 'l_to_h_img'):
        v = np.asarray(b1[k])
        assert v.min() >= 0.0 and v.max() <= 1.0
    b2 = P.make_train_batch(ds.hr_dev, ds.lr_dev, idxs, key, cfg)
    np.testing.assert_array_equal(np.asarray(b1['h_im']),
                                  np.asarray(b2['h_im']))
    b3 = P.make_train_batch(ds.hr_dev, ds.lr_dev, idxs,
                            jax.random.key(2), cfg)
    assert np.abs(np.asarray(b1['h_im']) - np.asarray(b3['h_im'])).max() > 0


def test_train_batch_lr_hr_aligned(synth_root):
    """The LR patch upscaled must correlate strongly with the HR patch
    (paired crop + joint augmentation)."""
    from srcaco2_tpu.ops.resize import resize2d
    root, names = synth_root
    ds = load_dataset(_args(root), names[0], 'train').stage()
    cfg = P.PipeConfig(scale=2, h_size=64)
    b = P.make_train_batch(ds.hr_dev, ds.lr_dev,
                           jnp.arange(6), jax.random.key(3), cfg)
    up = np.asarray(resize2d(jnp.asarray(b['l_im']), (64, 64)))
    h = np.asarray(b['h_im'])
    checked = 0
    for i in range(6):
        u, v = up[i].ravel(), h[i].ravel()
        if v.std() < 0.03:   # background-noise-only patch: skip
            continue
        corr = np.corrcoef(u, v)[0, 1]
        assert corr > 0.85, corr
        checked += 1
    assert checked >= 1


def test_aligned_crops_exact_vs_reference_offset():
    """aligned_crops=True must produce EXACTLY aligned (l_im, h_im)
    pairs; the default (reference-exact dataset_dpsr.py:866-877
    floor-division crop) misaligns by (origin mod scale) HR px. HR is
    a linear ramp in x and LR its exact block-mean, so the offset of
    each pair is readable from the patch means: for a ramp of slope 1,
    mean(h) - mean(up(l)) == the misalignment in pixels."""
    sf, hs = 4, 32
    H = 256
    ramp = np.tile(np.arange(H, dtype=np.float32), (H, 1))
    hr = np.clip(ramp, 0, 255).astype(np.uint8)[None, :, :, None]
    lr = hr[0, :, :, 0].astype(np.float32).reshape(
        H // sf, sf, H // sf, sf).mean((1, 3))
    lr = np.round(lr).astype(np.uint8)[None, :, :, None]
    hr_d, lr_d = jnp.asarray(hr), jnp.asarray(lr)
    offs = {}
    for aligned in (False, True):
        cfg = P.PipeConfig(scale=sf, h_size=hs, aligned_crops=aligned)
        b = P.make_train_batch(hr_d, lr_d, jnp.zeros(64, jnp.int32),
                               jax.random.key(5), cfg)
        # undo the joint dihedral aug via means (mode-invariant)
        mh = np.asarray(b['h_im']).mean((1, 2, 3)) * 255.0
        ml = np.asarray(b['l_im']).mean((1, 2, 3)) * 255.0
        offs[aligned] = mh - ml
    # aligned: every pair's mean offset ~0 (quantization only)
    assert np.abs(offs[True]).max() < 1.0, offs[True]
    # reference crop: offsets spread over 0..sf-1 px
    assert np.abs(offs[False]).max() > 1.5, offs[False]
    assert np.abs(offs[False]).min() < 1.0


def test_roi_sampling_biases_to_cells(synth_root):
    root, names = synth_root
    ds = load_dataset(_args(root), names[0], 'train').stage()
    cfg = P.PipeConfig(scale=2, h_size=32,
                       sample_tr_patch=constants.SAMPLE_ROI)
    b = P.make_train_batch(ds.hr_dev, ds.lr_dev,
                           jnp.zeros(16, jnp.int32), jax.random.key(0),
                           cfg)
    cfg_u = P.PipeConfig(scale=2, h_size=32)
    bu = P.make_train_batch(ds.hr_dev, ds.lr_dev,
                            jnp.zeros(16, jnp.int32), jax.random.key(0),
                            cfg_u)
    # ROI-sampled patches should be brighter on average than uniform ones.
    assert np.asarray(b['h_im']).mean() >= np.asarray(bu['h_im']).mean()


def test_eval_batch(synth_root):
    root, names = synth_root
    ds = load_dataset(_args(root), names[2], 'eval').stage()
    b = P.make_eval_batch(ds.hr_dev, ds.lr_dev, jnp.array([0, 1]))
    assert b['h_im'].shape == (2, 1, 128, 128)
    assert b['l_im'].shape == (2, 1, 64, 64)
    assert b['l_to_h_img'].shape == (2, 1, 128, 128)
    # l_to_h is on the uint8 grid
    v = np.asarray(b['l_to_h_img']) * 255.0
    np.testing.assert_allclose(v, np.round(v), atol=1e-4)


def test_otsu_device_matches_host(synth_root):
    root, names = synth_root
    ds = load_dataset(_args(root), names[0], 'train')
    img = ds.hr[0, :, :, 0]
    th_host = S.otsu_threshold(img)
    th_dev = float(S.otsu_threshold_device(jnp.asarray(img)))
    assert abs(th_host - th_dev) <= 2.0, (th_host, th_dev)


def test_host_origin_sampling_strategies(synth_root):
    root, names = synth_root
    ds = load_dataset(_args(root), names[0], 'train')
    img = ds.hr[0, :, :, 0]
    rng = np.random.default_rng(0)
    for st in constants.SAMPLE_PATCHES:
        x0, y0 = S.sample_origin_host(rng, img, st, 32)
        assert 0 <= x0 <= 128 - 32
        assert 0 <= y0 <= 128 - 32


def test_per_color_weights():
    hr = np.random.default_rng(0).integers(0, 64, (4, 32, 32, 1)
                                           ).astype(np.uint8)
    w = P.per_color_weights(hr, 0.001)
    assert w.shape == (256,)
    nz = w > 0
    assert w[nz].min() >= 0.001 - 1e-6 and w.max() <= 1.0 + 1e-6


def test_epoch_indices_permutation():
    key = jax.random.key(0)
    p0 = np.asarray(P.epoch_indices(key, 10, jnp.int32(0)))
    p0b = np.asarray(P.epoch_indices(key, 10, jnp.int32(0)))
    p1 = np.asarray(P.epoch_indices(key, 10, jnp.int32(1)))
    np.testing.assert_array_equal(p0, p0b)
    assert sorted(p0.tolist()) == list(range(10))
    assert not np.array_equal(p0, p1)


def test_edt_device_matches_scipy():
    from scipy.ndimage import distance_transform_edt
    from srcaco2_tpu.data.sampling import edt_device
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:64, 0:64]
    roi = (((yy - 32) ** 2 + (xx - 30) ** 2) < 400).astype(np.float32)
    got = np.asarray(edt_device(jnp.asarray(roi)))
    want = distance_transform_edt(roi)
    # chamfer-style approximation: high rank correlation inside the ROI
    m = roi > 0
    corr = np.corrcoef(got[m], want[m])[0, 1]
    assert corr > 0.95, corr
    assert got[~m].max() == 0


def test_edt_sampling_modes_run(synth_root):
    root, names = synth_root
    from srcaco2_tpu.data.dataset import load_dataset
    ds = load_dataset(_args(root), names[0], 'train').stage()
    for st in (constants.SAMPLE_EDT, constants.SAMPLE_EDTXROI):
        cfg = P.PipeConfig(scale=2, h_size=32, sample_tr_patch=st)
        b = P.make_train_batch(ds.hr_dev, ds.lr_dev,
                               jnp.zeros(4, jnp.int32),
                               jax.random.key(0), cfg)
        assert np.all(np.isfinite(np.asarray(b['h_im'])))
