"""Synthetic SR-CACO-2-like dataset generator.

The real dataset (1.8 GB of microscope tiles) is not shipped; tests, CI and
benchmarks use this generator: blobby fluorescence-like grayscale cells on
a dark background, written as HR tifs + real-LR tifs + fold files in the
exact layout the loaders expect (data_root/caco2/hr_div_{1,scale}/..., and
splits_root/folds/super-resolution/<ds_name>/{l_h.txt,h_l.txt}).
"""
import os
from typing import List

import numpy as np

from srcaco2_tpu import constants
from srcaco2_tpu.data import io as dio


def _cell_image(rng: np.random.Generator, size: int = 512,
                n_blobs=(6, 18)) -> np.ndarray:
    """One synthetic fluorescence tile: gaussian blobs + faint background
    noise, uint8 HxW. Blob count and size scale with the tile area so
    small test tiles do not saturate."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    img = np.zeros((size, size), np.float32)
    rel = size / 512.0
    lo = max(1, int(n_blobs[0] * rel * rel * 4))
    hi = max(lo + 1, int(n_blobs[1] * rel * rel * 4))
    for _ in range(int(rng.integers(lo, hi))):
        cy = rng.uniform(0.1 * size, 0.9 * size)
        cx = rng.uniform(0.1 * size, 0.9 * size)
        sy = rng.uniform(6, 60) * max(rel, 0.15)
        sx = sy * rng.uniform(0.6, 1.6)
        amp = rng.uniform(40, 230)
        ang = rng.uniform(0, np.pi)
        ca, sa = np.cos(ang), np.sin(ang)
        dy = (yy - cy) * ca + (xx - cx) * sa
        dx = -(yy - cy) * sa + (xx - cx) * ca
        img += amp * np.exp(-(dy ** 2 / (2 * sy ** 2)
                              + dx ** 2 / (2 * sx ** 2)))
    img += rng.normal(2.0, 1.5, img.shape)  # dark background noise
    return np.clip(img, 0, 255).astype(np.uint8)


def _downscale_with_noise(hr: np.ndarray, scale: int,
                          rng: np.random.Generator) -> np.ndarray:
    """Simulate the real microscope LR: block-mean downscale + photon-ish
    noise (distinct from the framework's own LR synthesis so real-LR and
    interpolated-LR paths are distinguishable in tests)."""
    h, w = hr.shape
    lo = hr.reshape(h // scale, scale, w // scale, scale).mean((1, 3))
    lo = lo + rng.normal(0, 3.0, lo.shape) * (lo > 6)
    return np.clip(lo, 0, 255).astype(np.uint8)


def make_synthetic_dataset(root: str, scale: int = 2, cell: str = 'CELL0',
                           n_train: int = 16, n_val: int = 4,
                           n_test: int = 4, size: int = 512,
                           seed: int = 0) -> List[str]:
    """Write a miniature caco2-layout dataset. Returns the three dataset
    names (train, val, test). `root` serves as both data_root and
    splits_root."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, 'caco2')
    hr_dir = os.path.join(img_dir, 'hr_div_1')
    lr_dir = os.path.join(img_dir, f'hr_div_{scale}')
    os.makedirs(hr_dir, exist_ok=True)
    os.makedirs(lr_dir, exist_ok=True)

    names = []
    counter = 0
    for split, n in ((constants.TRAINSET, n_train),
                     (constants.VALIDSET, n_val),
                     (constants.TESTSET, n_test)):
        ds_name = constants.caco2_name(split, scale, cell)
        names.append(ds_name)
        fold_dir = os.path.join(root, 'folds', 'super-resolution', ds_name)
        os.makedirs(fold_dir, exist_ok=True)
        lh_lines, hl_lines = [], []
        for _ in range(n):
            hi = f'tile_HighRes{size}-{counter}_{cell}.tif'
            lo = f'tile_LowRes{size // scale}-{counter}_{cell}.tif'
            hr = _cell_image(rng, size)
            lr = _downscale_with_noise(hr, scale, rng)
            dio.imsave(hr, os.path.join(hr_dir, hi))
            dio.imsave(lr, os.path.join(lr_dir, lo))
            h_rel = f'hr_div_1/{hi}'
            l_rel = f'hr_div_{scale}/{lo}'
            lh_lines.append(f'{l_rel},{h_rel}')
            hl_lines.append(f'{h_rel},{l_rel}')
            counter += 1
        with open(os.path.join(fold_dir, 'l_h.txt'), 'w') as f:
            f.write('\n'.join(lh_lines) + '\n')
        with open(os.path.join(fold_dir, 'h_l.txt'), 'w') as f:
            f.write('\n'.join(hl_lines) + '\n')
    return names
