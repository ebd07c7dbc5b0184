"""Diagnosis tools + dataset build scripts."""
import os

import numpy as np
import pytest

from srcaco2_tpu import constants
from srcaco2_tpu.data.synthetic import make_synthetic_dataset, _cell_image


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('diag'))
    names = make_synthetic_dataset(root, scale=2, cell='CELL1',
                                   n_train=4, n_val=2, n_test=2, size=64)
    return root, names


def test_check_data_ok(synth):
    from srcaco2_tpu.diagnosis.tools import check_data
    root, names = synth
    rep = check_data(root, root, names[0], sample=2)
    assert rep['ok'], rep
    assert rep['n_pairs'] == 4


def test_check_data_detects_missing(synth):
    from srcaco2_tpu.diagnosis.tools import check_data
    root, names = synth
    # corrupt: remove one LR file
    import glob
    victim = sorted(glob.glob(os.path.join(root, 'caco2', 'hr_div_2',
                                           '*.tif')))[0]
    os.rename(victim, victim + '.bak')
    try:
        rep = check_data(root, root, names[0])
        assert not rep['ok'] and rep['missing_low'] >= 1
    finally:
        os.rename(victim + '.bak', victim)


def test_patch_stats_and_noise_study(synth):
    from srcaco2_tpu.data.dataset import load_dataset
    from srcaco2_tpu.diagnosis.tools import (color_distribution,
                                             noise_model_study,
                                             patch_stats)
    root, names = synth
    args = {'data_root': root, 'splits_root': root, 'scale': 2,
            'n_channels': 1, 'myseed': 0, 'use_interpolated_low': False,
            'inter_low_th': 7., 'inter_low_sigma': 6., 'num_workers': 2}
    ds = load_dataset(args, names[0], 'train')
    st = patch_stats(ds.hr)
    assert st['n'] == 4 and 0 < st['roi_frac_mean'] <= 1
    ns = noise_model_study(ds.hr, ds.lr, 2)
    assert ns['global_std'] > 0 and len(ns['intensity']) > 0
    cd = color_distribution({'train': ds.hr})
    assert abs(sum(cd['train']) - 1.0) < 1e-6


def test_plot_patch_demo(synth, tmp_path):
    from srcaco2_tpu.diagnosis.tools import plot_patch_demo
    rng = np.random.default_rng(0)
    img = _cell_image(rng, 128)
    out = plot_patch_demo(img, str(tmp_path / 'demo.png'), psize=32,
                          n_draws=8)
    assert os.path.isfile(out)


def test_build_caco2_pipeline(tmp_path):
    """End-to-end dataset build: raw tiles -> layout + folds, loadable
    by the standard loader."""
    from srcaco2_tpu.data import io as dio
    from srcaco2_tpu.data.build_scripts import build_caco2
    from srcaco2_tpu.data.dataset import load_dataset
    rng = np.random.default_rng(0)
    raw = tmp_path / 'raw'
    raw_pairs = {}
    for t in range(4):
        hr = _cell_image(rng, 256)
        entry = {}
        p = str(raw / f'hr_{t}.tif')
        dio.imsave(hr, p)
        entry[1] = p
        for sc in (2,):
            lo = hr.reshape(256 // sc, sc, 256 // sc, sc).mean((1, 3))
            lo = np.clip(lo + rng.normal(0, 2, lo.shape), 0,
                         255).astype(np.uint8)
            p = str(raw / f'lr{sc}_{t}.tif')
            dio.imsave(lo, p)
            entry[sc] = p
        raw_pairs[str(t)] = entry
    out_root = str(tmp_path / 'built')
    counts = build_caco2(raw_pairs, out_root, cell='CELL0',
                         scales=(2,), patch=128, min_cell_frac=0.05,
                         splits=(0.5, 0.25))
    assert sum(counts.values()) > 0
    # the built tree loads through the standard loader
    name = constants.caco2_name(constants.TRAINSET, 2, 'CELL0')
    args = {'data_root': out_root, 'splits_root': out_root, 'scale': 2,
            'n_channels': 1, 'myseed': 0, 'use_interpolated_low': False,
            'inter_low_th': 7., 'inter_low_sigma': 6., 'num_workers': 2}
    ds = load_dataset(args, name, 'train')
    assert len(ds) == counts[constants.TRAINSET]
    assert ds.hr.shape[1:] == (128, 128, 1)
    assert ds.lr.shape[1:] == (64, 64, 1)


def test_phase_correlation_registration():
    from srcaco2_tpu.data.build_scripts import phase_correlation_shift
    rng = np.random.default_rng(1)
    img = _cell_image(rng, 128).astype(np.float32)
    shifted = np.roll(np.roll(img, 3, axis=0), -5, axis=1)
    dy, dx = phase_correlation_shift(img, shifted)
    # returned (dy, dx) is the roll that aligns `shifted` back onto img
    assert round(dy) == -3 and round(dx) == 5
    back = np.roll(np.roll(shifted, int(dy), axis=0), int(dx), axis=1)
    np.testing.assert_array_equal(back, img)


def test_augmenter_perturbate():
    from srcaco2_tpu.data.augmenter import Augment
    rng = np.random.default_rng(0)
    hr = _cell_image(rng, 64).astype(np.float64)
    lr = hr[::4, ::4]
    aug = Augment(upscale=4, nbr_steps=2, use_roi=False, seed=1)
    out = aug.perturbate(lr, hr)
    assert out.shape == hr.shape
    assert 0 <= out.min() and out.max() <= 255
    # noise was injected: differs from plain bicubic upscale
    aug1 = Augment(upscale=4, nbr_steps=2, use_roi=False, seed=2)
    out2 = aug1.perturbate(lr, hr)
    assert np.abs(out - out2).mean() > 1e-3


def test_regularizers():
    import jax, jax.numpy as jnp
    from srcaco2_tpu.train.regularizers import (regularizer_clip,
                                                regularizer_orth)
    params = {'conv': {'kernel': jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (3, 3, 4, 8)),
        jnp.float32) * 3.0,
        'bias': jnp.asarray([2.0, -2.0, 0.5, 0.0])}}
    clipped = regularizer_clip(params)
    assert float(clipped['conv']['bias'][0]) < 2.0
    assert float(clipped['conv']['bias'][1]) > -2.0
    assert float(clipped['conv']['bias'][2]) == 0.5
    orth = regularizer_orth(params)
    w0 = np.asarray(params['conv']['kernel']).reshape(-1, 8)
    w1 = np.asarray(orth['conv']['kernel']).reshape(-1, 8)
    s0 = np.linalg.svd(w0, compute_uv=False)
    s1 = np.linalg.svd(w1, compute_uv=False)
    assert s1.max() <= s0.max() + 1e-3  # outliers shrank (f32 tol)
    # bias untouched by orth
    np.testing.assert_array_equal(np.asarray(orth['conv']['bias']),
                                  np.asarray(params['conv']['bias']))


def test_build_biosr_loads(tmp_path):
    """biosr layout builds and loads through the standard loader."""
    from srcaco2_tpu.data import io as dio
    from srcaco2_tpu.data.build_scripts import build_biosr
    from srcaco2_tpu.data.dataset import load_dataset
    rng = np.random.default_rng(1)
    raw = tmp_path / 'raw'
    raw_pairs = {}
    for t in range(3):
        hr = _cell_image(rng, 128)
        p = str(raw / f'hr_{t}.tif')
        dio.imsave(hr, p)
        lo = hr.reshape(64, 2, 64, 2).mean((1, 3)).astype(np.uint8)
        pl = str(raw / f'lr_{t}.tif')
        dio.imsave(lo, pl)
        raw_pairs[str(t)] = {1: p, 2: pl}
    out_root = str(tmp_path / 'built')
    counts = build_biosr(raw_pairs, out_root, structure='CCP',
                         scales=(2,), patch=64, min_cell_frac=0.01,
                         splits=(0.4, 0.3))
    assert sum(counts.values()) > 0
    name = 'caco2_train_X_2_in_256_out_512_cell_CCP'.replace(
        'caco2', 'biosr')
    # build_biosr renames the image dir to biosr/; fold names keep the
    # caco2_* pattern from the shared builder — point the loader at the
    # biosr-prefixed name for dir resolution.
    import os
    folds = os.path.join(out_root, 'folds', 'super-resolution')
    src = [d for d in os.listdir(folds) if 'train' in d][0]
    os.rename(os.path.join(folds, src),
              os.path.join(folds, src.replace('caco2', 'biosr')))
    args = {'data_root': out_root, 'splits_root': out_root, 'scale': 2,
            'n_channels': 1, 'myseed': 0, 'use_interpolated_low': False,
            'inter_low_th': 7., 'inter_low_sigma': 6., 'num_workers': 2}
    ds = load_dataset(args, src.replace('caco2', 'biosr'), 'train')
    assert len(ds) == counts['train']
