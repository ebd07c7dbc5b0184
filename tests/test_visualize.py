"""Diagnosis/visualization artifact classes (VERDICT r1 #6): every
figure/GIF class the reference's dlib/diagnosis + dlib/visualization
emit must be producible here."""
import os

import numpy as np
import pytest

from srcaco2_tpu.diagnosis import visualize as V


@pytest.fixture()
def cell_img():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[:128, :128]
    img = np.zeros((128, 128), np.float32)
    for _ in range(14):
        cy, cx = rng.integers(10, 118, 2)
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= 64] = \
            rng.integers(80, 220)
    return img.astype(np.uint8)


def test_patch_sampling_demo(cell_img, tmp_path):
    out = V.patch_sampling_demo(cell_img, 32,
                                str(tmp_path / 'demo.png'))
    assert os.path.getsize(out) > 10_000


def test_noise_model_plot(cell_img, tmp_path):
    rng = np.random.default_rng(1)
    lr = cell_img[::2, ::2].astype(np.int16) + \
        rng.normal(0, 5, (64, 64)).astype(np.int16)
    lr = np.clip(lr, 0, 255).astype(np.uint8)
    study = {0.0: {'psnr': 30.0, 'ssim': 0.9},
             10.0: {'psnr': 26.0, 'ssim': 0.8}}
    out = V.noise_model_plot(cell_img, lr, 2,
                             str(tmp_path / 'noise.png'), study=study)
    assert os.path.getsize(out) > 10_000


def test_color_distribution(cell_img, tmp_path):
    out = V.color_distribution(
        {'CELL0': [cell_img], 'CELL1': [cell_img.T],
         'CELL2': [cell_img[::-1]]}, str(tmp_path / 'color.png'))
    assert os.path.getsize(out) > 10_000


def test_restore_grid_with_gif(cell_img, tmp_path):
    hr = cell_img.astype(np.float32)
    out = V.restore_grid([hr * 0.9, np.clip(hr * 1.02, 0, 255)],
                         ['Bicubic', 'SwinIR'], hr,
                         str(tmp_path / 'grid.png'),
                         gif_path=str(tmp_path / 'grid.gif'))
    assert os.path.getsize(out) > 10_000
    assert os.path.getsize(str(tmp_path / 'grid.gif')) > 1_000


def test_tracker_dashboard(tmp_path):
    from srcaco2_tpu.utils.tracker import plot_tracker_dashboard
    rec = {'steps': [1, 2, 3], 'vals': [30.0, 31.0, 30.5],
           'idx_best': 1, 'best_val': 31.0}
    tracker = {'valid': {'ds_a': {'psnr': dict(rec), 'ssim': dict(rec)},
                         'ds_b': {'psnr': dict(rec),
                                  'ssim': dict(rec)}}}
    roi = {'valid': {'ds_a': {'psnr': dict(rec), 'ssim': dict(rec)},
                     'ds_b': {'psnr': dict(rec), 'ssim': dict(rec)}}}
    out = plot_tracker_dashboard(tracker, roi, 'valid',
                                 str(tmp_path / 'dash.png'),
                                 roi_select=True)
    assert out and os.path.getsize(out) > 10_000
