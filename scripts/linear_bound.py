#!/usr/bin/env python
"""Optimal-linear-restorer sanity bound for quality runs (docs/QUALITY.md).

Fits the ridge-optimal k x k linear filter mapping the bicubic-upscaled
LR (the SAME `interpolate_model` the evaluator's `<ds>_bicubic` baseline
uses) to the HR target over the train split, then evaluates it on the
test split through the SAME metric protocol as every committed run
(uint8-rounded [0,255], border=scale crop, `ops/metrics.compute_metrics`).

The bound calibrates trained-vs-bicubic margins: a trained CNN ending
below this line is undertrained/collapsed, not data-limited; the gap
above it is what nonlinearity buys. Prints one JSON line.

Usage:
  JAX_PLATFORMS=cpu python scripts/linear_bound.py --root /tmp/q4_vdsr \
      --scale 2 --cell CELL0 [--k 9] [--lam 1e1] [--stride 2]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np


def _features(img: np.ndarray, k: int) -> np.ndarray:
    """(H, W) float -> (H-k+1, W-k+1, k*k) sliding neighborhoods."""
    win = np.lib.stride_tricks.sliding_window_view(img, (k, k))
    return win.reshape(win.shape[0], win.shape[1], k * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--scale', type=int, default=2)
    ap.add_argument('--cell', default='CELL0')
    ap.add_argument('--k', type=int, default=9)
    ap.add_argument('--lam', type=float, default=1e1)
    ap.add_argument('--stride', type=int, default=2,
                    help='pixel subsampling stride for the fit')
    ap.add_argument('--max_train', type=int, default=400)
    ns = ap.parse_args()

    import jax.numpy as jnp
    from srcaco2_tpu import constants
    from srcaco2_tpu.data.folds import get_pairs
    from srcaco2_tpu.data.io import imread_uint
    from srcaco2_tpu.models.interpolate import interpolate_model
    from srcaco2_tpu.ops.metrics import compute_metrics, uint8_round

    k, r = ns.k, ns.k // 2

    def load(pair):
        l_path, h_path = pair
        img_dir = os.path.join(ns.root, 'caco2')
        h = imread_uint(os.path.join(img_dir, h_path), 1)[..., 0]
        l = imread_uint(os.path.join(img_dir, l_path), 1)[..., 0]
        lt = interpolate_model(
            jnp.asarray(l, jnp.float32)[None, None] / 255.0,
            ns.scale)['out']
        return np.asarray(lt[0, 0] * 255.0, np.float64), \
            h.astype(np.float64)

    tr_name = constants.caco2_name(constants.TRAINSET, ns.scale, ns.cell)
    te_name = constants.caco2_name(constants.TESTSET, ns.scale, ns.cell)
    tr_pairs = get_pairs(ns.root, tr_name)[0][:ns.max_train]
    te_pairs = get_pairs(ns.root, te_name)[0]

    # ridge fit: accumulate normal equations over train pixels
    d = k * k + 1                                  # + bias
    A = np.zeros((d, d))
    b = np.zeros(d)
    for pair in tr_pairs:
        lt, h = load(pair)
        X = _features(lt, k)[::ns.stride, ::ns.stride]
        y = h[r:-r, r:-r][::ns.stride, ::ns.stride]
        X = X.reshape(-1, k * k)
        X = np.concatenate([X, np.ones((X.shape[0], 1))], 1)
        y = y.reshape(-1)
        A += X.T @ X
        b += X.T @ y
    w = np.linalg.solve(A + ns.lam * np.eye(d), b)

    # evaluate on test through the standard metric stack
    def metric_mean(e_list, h_list):
        sums = {}
        n = 0
        for e, h in zip(e_list, h_list):
            # uint8_round takes [0,1] (tensor2uint82float semantics)
            m = compute_metrics(
                uint8_round(jnp.asarray(e / 255.0,
                                        jnp.float32)[None, None]),
                uint8_round(jnp.asarray(h / 255.0,
                                        jnp.float32)[None, None]),
                border=ns.scale)
            for kk, v in m.items():
                sums[kk] = sums.get(kk, 0.0) + float(v[0])
            n += 1
        return {kk: v / n for kk, v in sums.items()}

    bi_e, lin_e, hs = [], [], []
    for pair in te_pairs:
        lt, h = load(pair)
        pad = np.pad(lt, r, mode='reflect')
        X = _features(pad, k).reshape(-1, k * k)
        X = np.concatenate([X, np.ones((X.shape[0], 1))], 1)
        e = (X @ w).reshape(h.shape)
        bi_e.append(np.clip(lt, 0, 255))
        lin_e.append(np.clip(e, 0, 255))
        hs.append(h)
    bi = metric_mean(bi_e, hs)
    ln = metric_mean(lin_e, hs)
    out = {'scale': ns.scale, 'cell': ns.cell, 'k': k,
           'n_train_imgs': len(tr_pairs), 'n_test_imgs': len(te_pairs),
           'bicubic_psnr': round(bi[constants.PSNR_MTR], 4),
           'linear_psnr': round(ln[constants.PSNR_MTR], 4),
           'margin_db': round(ln[constants.PSNR_MTR]
                              - bi[constants.PSNR_MTR], 4),
           'bicubic_ssim': round(bi[constants.SSIM_MTR], 4),
           'linear_ssim': round(ln[constants.SSIM_MTR], 4)}
    print(json.dumps(out))


if __name__ == '__main__':
    main()
