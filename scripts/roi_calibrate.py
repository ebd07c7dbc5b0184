#!/usr/bin/env python
"""Design-time calibration of the INTRA-ROI restorable headroom of the
synthetic tile generator (VERDICT r3 #3 — the reference's Table-4 axis).

For a generator version (v1 = round-3 tiles, v2 = structured intra-ROI
texture) this measures, on freshly generated tiles through the exact
published ROI protocol (ROI = uint8 HR >= th, thresholds 4..10
marginalized, border=scale crop):

  - bicubic(noisy LR)            — the floor every table row is judged
  - ridge-optimal 9x9 linear on the bicubic upsample — the linear bound
  - bicubic(CLEAN LR)            — the oracle-denoise ceiling of the
                                   degradation's noise component

A generator poses the Table-4 problem iff linear/oracle ROI margins are
clearly positive: that is headroom INSIDE the cell mask that a trained
net can collect. Prints one JSON line per cell.

Usage: JAX_PLATFORMS=cpu python scripts/roi_calibrate.py \
           [--texture v2] [--scale 4] [--n_train 16] [--n_test 8]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--texture', default='v2', choices=['v1', 'v2'])
    ap.add_argument('--scale', type=int, default=4)
    ap.add_argument('--cells', default='CELL0,CELL1,CELL2')
    ap.add_argument('--n_train', type=int, default=16)
    ap.add_argument('--n_test', type=int, default=8)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--k', type=int, default=9)
    ap.add_argument('--lam', type=float, default=1e1)
    ap.add_argument('--stride', type=int, default=3)
    ap.add_argument('--photon_coef', type=float, default=8.0)
    ap.add_argument('--read_sigma', type=float, default=2.5)
    ap.add_argument('--seed', type=int, default=0)
    ns = ap.parse_args()

    import jax.numpy as jnp
    from srcaco2_tpu import constants
    from srcaco2_tpu.data.synthetic import rich_cell_tile, degrade_lr
    from srcaco2_tpu.models.interpolate import interpolate_model
    from srcaco2_tpu.ops.metrics import mb_psnr, mb_ssim, uint8_round

    sc, k, r = ns.scale, ns.k, ns.k // 2
    ths = list(constants.ROI_THRESH)

    def upsample(lr):
        return np.asarray(interpolate_model(
            jnp.asarray(lr, jnp.float32)[None, None] / 255.0,
            sc)['out'][0, 0] * 255.0, np.float64)

    def roi_marg(e, h):
        """ROI-marginalized PSNR/SSIM (published protocol)."""
        e8 = uint8_round(jnp.asarray(e / 255.0, jnp.float32)[None, None])
        h8 = uint8_round(jnp.asarray(h / 255.0, jnp.float32)[None, None])
        ps, ss = [], []
        for th in ths:
            roi = (h8 >= th).astype(jnp.float32)
            ps.append(float(mb_psnr(e8, h8, border=sc, roi=roi)[0]))
            ss.append(float(mb_ssim(e8, h8, border=sc, roi=roi)[0]))
        return float(np.mean(ps)), float(np.mean(ss))

    def feats(img):
        win = np.lib.stride_tricks.sliding_window_view(img, (k, k))
        return win.reshape(win.shape[0], win.shape[1], k * k)

    for cell in ns.cells.split(','):
        rng = np.random.default_rng(ns.seed)
        tiles, noisy, clean = [], [], []
        for _ in range(ns.n_train + ns.n_test):
            hr = rich_cell_tile(rng, ns.size, cell, texture=ns.texture)
            lo_clean = hr.astype(np.float32).reshape(
                ns.size // sc, sc, ns.size // sc, sc).mean((1, 3))
            lo = degrade_lr(hr, sc, rng, read_sigma=ns.read_sigma,
                            photon_coef=ns.photon_coef)
            tiles.append(hr.astype(np.float64))
            noisy.append(upsample(lo))
            clean.append(upsample(np.clip(lo_clean, 0,
                                          255).astype(np.uint8)))
        # ridge fit on train tiles (bicubic(noisy) -> HR)
        d = k * k + 1
        A, b = np.zeros((d, d)), np.zeros(d)
        for h, lt in zip(tiles[:ns.n_train], noisy[:ns.n_train]):
            X = feats(lt)[::ns.stride, ::ns.stride].reshape(-1, k * k)
            X = np.concatenate([X, np.ones((X.shape[0], 1))], 1)
            y = h[r:-r, r:-r][::ns.stride, ::ns.stride].reshape(-1)
            A += X.T @ X
            b += X.T @ y
        w = np.linalg.solve(A + ns.lam * np.eye(d), b)

        acc = {m: [] for m in ('bicubic', 'linear', 'oracle')}
        accs = {m: [] for m in acc}
        for h, lt, ct in zip(tiles[ns.n_train:], noisy[ns.n_train:],
                             clean[ns.n_train:]):
            pad = np.pad(lt, r, mode='reflect')
            X = feats(pad).reshape(-1, k * k)
            X = np.concatenate([X, np.ones((X.shape[0], 1))], 1)
            lin = np.clip((X @ w).reshape(h.shape), 0, 255)
            for name, e in (('bicubic', lt), ('linear', lin),
                            ('oracle', ct)):
                p, s = roi_marg(np.clip(e, 0, 255), h)
                acc[name].append(p)
                accs[name].append(s)
        out = {'texture': ns.texture, 'scale': sc, 'cell': cell,
               'n_train': ns.n_train, 'n_test': ns.n_test}
        for name in acc:
            out[f'roi_psnr_{name}'] = round(float(np.mean(acc[name])), 4)
            out[f'roi_ssim_{name}'] = round(float(np.mean(accs[name])),
                                            4)
        out['roi_linear_margin_db'] = round(
            out['roi_psnr_linear'] - out['roi_psnr_bicubic'], 4)
        out['roi_oracle_margin_db'] = round(
            out['roi_psnr_oracle'] - out['roi_psnr_bicubic'], 4)
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
