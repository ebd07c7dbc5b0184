#!/usr/bin/env python
"""Quantitative bound on the builder's registration deviation
(VERDICT r3 #9): the reference registers LR acquisitions with per-pixel
TV-L1 optical flow (caco2_resample.py:441); this builder uses iterative
pyramid phase-correlation block flow (skimage absent). How much
misalignment does the replacement leave behind?

Protocol: synthetic tiles (the benchmark generator) are warped by KNOWN
smooth deformation fields (rigid shift + low-order sinusoidal bending of
amplitude A px), then degraded like a real LR acquisition (binning +
shot/read noise + nearest upscale, the exact builder input); both
estimators register the degraded moving image onto the clean tile and
are scored on ROI pixels (HR >= 10):

  flow RMSE [px]   — |estimated - true| residual misalignment
  warp RMSE [gray] — pixel error of the registered image vs the
                     unwarped clean ground truth (what the built
                     dataset actually inherits)

TV-L1 here is the pure-numpy reimplementation of the reference's
algorithm (srcaco2_tpu/diagnosis/tvl1_flow.py). Prints one JSON line
per (field, method); paste the table into docs/QUALITY.md.

Usage: JAX_PLATFORMS=cpu python scripts/registration_bound.py
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np


def smooth_field(rng, size, amp, order=2):
    """Low-order sinusoidal deformation of peak amplitude ~amp px."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
    v = np.zeros((size, size))
    u = np.zeros((size, size))
    for _ in range(order):
        fy, fx = rng.uniform(0.5, 1.5, 2)
        py, px = rng.uniform(0, 2 * np.pi, 2)
        v += np.sin(2 * np.pi * (fy * yy + fx * xx) + py)
        u += np.cos(2 * np.pi * (fx * yy + fy * xx) + px)
    v *= amp / order
    u *= amp / order
    return v, u


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n_tiles', type=int, default=6)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--scale', type=int, default=2,
                    help='LR division simulated before registration '
                         '(the builder registers the nearest-upscaled '
                         'LR against the HR)')
    ap.add_argument('--amps', default='0,1.5,3.0')
    ap.add_argument('--photon_coef', type=float, default=8.0)
    ap.add_argument('--read_sigma', type=float, default=2.5)
    ns = ap.parse_args()

    from srcaco2_tpu.data.synthetic import rich_cell_tile, degrade_lr
    from srcaco2_tpu.data.build_scripts import (_block_flow_refine,
                                                _nearest_resize)
    from srcaco2_tpu.diagnosis.tvl1_flow import optical_flow_tvl1, _warp

    rng = np.random.default_rng(0)
    size, sc = ns.size, ns.scale
    amps = [float(a) for a in ns.amps.split(',')]
    rows = {(a, m): {'flow': [], 'warp': [], 'secs': []}
            for a in amps for m in ('none', 'block', 'tvl1')}

    for t in range(ns.n_tiles):
        tile = rich_cell_tile(rng, size, 'CELL0').astype(np.float64)
        for amp in amps:
            # true deformation: rigid shift + smooth bending
            dy, dx = rng.uniform(-2, 2, 2)
            bv, bu = smooth_field(rng, size, amp)
            gv, gu = bv + dy, bu + dx
            moving = _warp(tile, gv, gu)          # moving(x)=tile(x+g)
            # LR acquisition of the moving frame (the builder input)
            lr = degrade_lr(np.clip(moving, 0, 255).astype(np.uint8),
                            sc, rng, read_sigma=ns.read_sigma,
                            photon_coef=ns.photon_coef)
            low_up = _nearest_resize(lr, size, size).astype(np.float64)
            c = (slice(16, -16),) * 2
            roi = tile[c] >= 10.0

            for method in ('none', 'block', 'tvl1'):
                t0 = time.perf_counter()
                if method == 'none':
                    v = np.zeros_like(tile)
                    u = np.zeros_like(tile)
                elif method == 'block':
                    v, u = _block_flow_refine(tile, low_up)
                else:
                    v, u = optical_flow_tvl1(tile, low_up)
                secs = time.perf_counter() - t0
                # residual flow error: estimated flow should equal -g
                ferr = np.sqrt((v[c] + gv[c]) ** 2
                               + (u[c] + gu[c]) ** 2)
                # the registered image the dataset inherits: score the
                # CLEAN moving frame warped by the estimate (isolates
                # misalignment from the irreducible LR noise)
                reg = _warp(moving, v, u)
                werr = (reg - tile)[c]
                rows[(amp, method)]['flow'].append(
                    float(np.sqrt((ferr[roi] ** 2).mean())))
                rows[(amp, method)]['warp'].append(
                    float(np.sqrt((werr[roi] ** 2).mean())))
                rows[(amp, method)]['secs'].append(secs)

    for (amp, method), d in rows.items():
        print(json.dumps({
            'field_amp_px': amp, 'method': method,
            'n': ns.n_tiles, 'scale': sc,
            'roi_flow_rmse_px': round(float(np.mean(d['flow'])), 3),
            'roi_warp_rmse_gray': round(float(np.mean(d['warp'])), 3),
            'secs_per_tile': round(float(np.mean(d['secs'])), 2)}),
            flush=True)


if __name__ == '__main__':
    main()
