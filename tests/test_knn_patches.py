"""KNN patch-exemplar demo tests (diagnosis/knn_patches.py; reference
dlib/diagnosis/knn_demo_patches.py)."""
import os

import numpy as np
import pytest

from srcaco2_tpu.diagnosis import knn_patches as K


def test_ring_weights():
    r = K.ring_weights(3, c=300.0)
    assert r.shape == (3, 3)
    assert r[1, 1] == 2 * 300.0          # center ring: ceil(3/2)*c
    assert (np.delete(r.reshape(-1), 4) == 1.0).all()
    r5 = K.ring_weights(5, c=10.0)
    assert r5[2, 2] == 3 * 10.0 and r5[0, 0] == 1.0 and r5[1, 1] == 2.0
    assert K.ring_weights(1).shape == (1, 1)


def test_extract_pairs_shapes():
    rng = np.random.default_rng(0)
    l_img = rng.integers(0, 255, (12, 10), np.uint8)
    h_img = rng.integers(0, 255, (24, 20), np.uint8)
    lw, hp = K.extract_pairs(l_img, h_img, 3)
    assert lw.shape == (120, 9) and hp.shape == (120, 4)
    # window 0 centers pixel (0,0); its HR atom is the top-left 2x2
    assert lw[0, 4] == l_img[0, 0]
    assert (hp[0] == h_img[:2, :2].reshape(-1)).all()


def test_exact_recall_on_consistent_mapping():
    """HR = nearest-neighbour 2x upsample of LR: every LR patch maps
    to ONE consistent HR atom, so 1-NN reconstruction of a training
    image is exact."""
    rng = np.random.default_rng(1)
    l_img = rng.integers(0, 255, (20, 16), np.uint8)
    h_img = np.kron(l_img, np.ones((2, 2), np.uint8))
    d = K.build_dict([K.extract_pairs(l_img, h_img, 3)], 3)
    assert (d['n'] >= 1).all()
    rec = K.knn_restore(l_img, d, k=1, seed=0)
    assert (rec == h_img).all()


def test_knn_beats_bicubic_on_seen_content():
    """On a training image with sharp structure, exemplar recall wins
    over bicubic by a wide margin (the reference study's headline
    observation)."""
    import cv2
    rng = np.random.default_rng(2)
    h_img = np.zeros((40, 40), np.uint8)
    h_img[::4] = 200
    h_img[:, ::4] = 200
    h_img += rng.integers(0, 20, h_img.shape).astype(np.uint8)
    l_img = h_img.reshape(20, 2, 20, 2).mean((1, 3)).astype(np.uint8)
    d = K.build_dict([K.extract_pairs(l_img, h_img, 3)], 3)
    rec = K.knn_restore(l_img, d, k=1, seed=0)
    bic = cv2.resize(l_img, (40, 40), interpolation=cv2.INTER_CUBIC)

    def mse(a):
        return np.mean((a.astype(np.float64)
                        - h_img.astype(np.float64)) ** 2)
    assert mse(rec) < 0.5 * mse(bic)


def test_run_knn_demo_end_to_end(tmp_path):
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    root = str(tmp_path / 'data')
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=2, n_val=1, n_test=1,
                                   size=64)
    out = str(tmp_path / 'knn_out')
    summary = K.run_knn_demo(root, root, names[0], names[2], out,
                             sz_l=3, kn=1, n_test=1)
    assert summary['dict_size'] > 0
    assert summary['psnr_knn'] is not None
    assert os.path.isfile(os.path.join(out, 'knn_demo_0.png'))
    assert os.path.isfile(os.path.join(out, 'log.txt'))


def test_knn_k3_runs():
    rng = np.random.default_rng(3)
    l_img = rng.integers(0, 255, (16, 16), np.uint8)
    h_img = np.kron(l_img, np.ones((2, 2), np.uint8))
    d = K.build_dict([K.extract_pairs(l_img, h_img, 3)], 3)
    rec = K.knn_restore(l_img, d, k=3, seed=0)
    assert rec.shape == (32, 32) and rec.dtype == np.uint8
