"""Patch-dictionary study tests (diagnosis/patch_dict.py; reference
dlib/diagnosis/patches.py exact_l_to_h / demo_patches.py
low_to_h_mixed / get_stats)."""
import os

import numpy as np

from srcaco2_tpu.diagnosis import knn_patches as K
from srcaco2_tpu.diagnosis import patch_dict as PD


def _consistent_pair(rng, h=20, w=16):
    l_img = rng.integers(0, 255, (h, w), np.uint8)
    return l_img, np.kron(l_img, np.ones((2, 2), np.uint8))


def test_exact_restore_self_consistent():
    """Deterministic LR->HR mapping: exact lookup on a training image
    reproduces it bit-exactly (reference exact_l_to_h invariant)."""
    rng = np.random.default_rng(0)
    l_img, h_img = _consistent_pair(rng)
    d = K.build_dict([K.extract_pairs(l_img, h_img, 3)], 3)
    rec, cov = PD.exact_match_restore(l_img, d, sample=False)
    assert cov == 1.0
    assert (rec == h_img).all()
    # sampling from a deterministic dictionary is also exact
    rec_s, _ = PD.exact_match_restore(l_img, d, sample=True, seed=1)
    assert (rec_s == h_img).all()


def test_dict_stats_ambiguity():
    """Two HR atoms behind one LR patch -> ambiguity stats reflect it."""
    l_img = np.zeros((8, 8), np.uint8)          # one distinct LR patch
    h_img = np.zeros((16, 16), np.uint8)
    h_img[0, 0] = 7                              # one atom differs
    d = K.build_dict([K.extract_pairs(l_img, h_img, 3)], 3)
    st = PD.dict_stats(d)
    assert st['dict_size'] == 1
    assert st['max_atoms_per_entry'] == 2
    assert st['frac_ambiguous'] == 1.0
    assert 0.0 < st['mean_entropy_bits'] <= 1.0


def test_mixed_fallback_on_unseen():
    """Unseen image: coverage < 1, knn fallback fills the misses and
    still reconstructs near the dictionary content (reference
    low_to_h_mixed)."""
    rng = np.random.default_rng(2)
    l_img, h_img = _consistent_pair(rng, 24, 24)
    d = K.build_dict([K.extract_pairs(l_img, h_img, 3)], 3)
    probe = np.clip(l_img.astype(np.int32)
                    + rng.integers(-2, 3, l_img.shape), 0, 255
                    ).astype(np.uint8)
    rec, cov = PD.exact_match_restore(probe, d, fallback='knn', seed=0)
    assert 0.0 <= cov < 1.0
    assert rec.shape == (48, 48) and rec.dtype == np.uint8
    # bicubic fallback path
    rec_b, cov_b = PD.exact_match_restore(probe, d, fallback='bicubic',
                                          seed=0)
    assert rec_b.shape == (48, 48) and cov_b == cov


def test_self_reconstruction_study():
    rng = np.random.default_rng(3)
    l_img, h_img = _consistent_pair(rng, 16, 16)
    st = PD.self_reconstruction(l_img, h_img, sz=3)
    assert st['psnr_mode'] > 60            # deterministic mapping
    assert st['dict_size'] > 0 and st['sz'] == 3


def test_run_patch_dict_study_end_to_end(tmp_path):
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    root = str(tmp_path / 'data')
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=2, n_val=1, n_test=1,
                                   size=64)
    out = str(tmp_path / 'pd_out')
    s = PD.run_patch_dict_study(root, root, names[0], names[2], out,
                                sz_l=3, n_test=1)
    assert s['stats']['dict_size'] > 0
    assert s['test'] and 'coverage' in s['test'][0]
    assert s['self_reconstruction']['psnr_sampled'] > 0
    assert os.path.isfile(os.path.join(out, 'patch_dict_0.png'))
    assert os.path.isfile(os.path.join(out, 'summary.yaml'))
