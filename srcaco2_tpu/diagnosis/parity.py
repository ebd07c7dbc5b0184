"""Parity harness: compare this framework's metrics against the
published SR-CACO-2 numbers (BASELINE.md, NeurIPS-2024 Tables 4/5).

The bicubic rows are model-free, so they are a perfect cross-check of
the whole eval stack (LR handling, resize, uint8 rounding, border crop,
ROI marginalization) once the real dataset is present:

    from srcaco2_tpu.diagnosis.parity import check_bicubic_parity
    check_bicubic_parity(data_root, splits_root, scale=8)
"""
from typing import Dict

import numpy as np

from srcaco2_tpu import constants

# Published full-image bicubic PSNR (dB) per (scale, cell) — Table 5.
PUBLISHED_BICUBIC_FULL_PSNR = {
    (2, 'CELL0'): 41.29, (2, 'CELL1'): 38.23, (2, 'CELL2'): 36.34,
    (4, 'CELL0'): 41.76, (4, 'CELL1'): 38.22, (4, 'CELL2'): 37.07,
    (8, 'CELL0'): 37.82, (8, 'CELL1'): 32.78, (8, 'CELL2'): 31.01,
}
# ROI-marginalized bicubic PSNR — Table 4.
PUBLISHED_BICUBIC_ROI_PSNR = {
    (2, 'CELL0'): 35.02, (2, 'CELL1'): 32.15, (2, 'CELL2'): 30.38,
    (4, 'CELL0'): 35.46, (4, 'CELL1'): 32.03, (4, 'CELL2'): 31.10,
    (8, 'CELL0'): 31.88, (8, 'CELL1'): 27.50, (8, 'CELL2'): 26.10,
}
# Flagship parity anchors (BASELINE.md).
PUBLISHED_SWINIR_X8_CELL2 = {'full_psnr': 30.60, 'roi_psnr': 26.48}


def eval_bicubic(data_root: str, splits_root: str, scale: int,
                 cell: str, n: int = -1) -> Dict:
    """Run the bicubic Interpolate baseline on the real test split."""
    from srcaco2_tpu.data.dataset import load_dataset
    from srcaco2_tpu.train.evaluator import (fast_eval,
                                             make_interpolate_forward)
    args = {'data_root': data_root, 'splits_root': splits_root,
            'scale': scale, 'n_channels': 1, 'myseed': 0,
            'use_interpolated_low': False, 'inter_low_th': 7.,
            'inter_low_sigma': 6., 'num_workers': 8,
            'eval_over_roi_also': True,
            'eval_over_roi_also_ths': constants.ROI_THRESH,
            'is_master': True}
    name = constants.caco2_name(constants.TESTSET, scale, cell)
    ds = load_dataset(args, name, constants.EVAL_PHASE, n=n).stage()
    fwd = make_interpolate_forward(scale, constants.INTER_BICUBIC)
    return fast_eval(fwd, None, ds, args, 8, constants.TESTSET)


def check_bicubic_parity(data_root: str, splits_root: str, scale: int,
                         tol_db: float = 0.05, n: int = -1) -> Dict:
    """Evaluate bicubic on all 3 cells of a scale; return per-cell
    deltas vs the published tables (|delta| <= tol_db passes)."""
    out = {}
    for cell in constants.CELLS:
        perf = eval_bicubic(data_root, splits_root, scale, cell, n)
        got_full = perf['full'][constants.PSNR_MTR]
        got_roi = perf['roi'][constants.PSNR_MTR]
        want_full = PUBLISHED_BICUBIC_FULL_PSNR[(scale, cell)]
        want_roi = PUBLISHED_BICUBIC_ROI_PSNR[(scale, cell)]
        out[cell] = {
            'full_psnr': got_full, 'full_published': want_full,
            'full_delta': got_full - want_full,
            'roi_psnr': got_roi, 'roi_published': want_roi,
            'roi_delta': got_roi - want_roi,
            'pass': (abs(got_full - want_full) <= tol_db
                     and abs(got_roi - want_roi) <= tol_db),
        }
    return out
