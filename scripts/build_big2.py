#!/usr/bin/env python
"""Rebuild the registration-fixed 256-tile benchmark (big2) exactly as
round 3 built it (scripts/parity_run.py make_raw_sessions with
n_tiles=256, seed=0, photon_coef=8, read_sigma=2.5; builder settings
hr 512 / psize 128 / del_border 8 / min_area 0.1 / th 4.0 /
n_test_tiles 8 / n_valid_tiles 2 — the argparse defaults below, which
match the on-disk folds: 113 test patches ≈ 8 tiles; do NOT "fix"
them to parity_run's 2/1 defaults). Deterministic from seed 0, so the
rebuild is bit-identical to the round-3 data the committed
PARITY_RUN_*_big2.yaml floors were measured on (verify with
diagnosis.parity.eval_bicubic against those yamls).

Usage: python scripts/build_big2.py [--root DIR] [--n_tiles 256]
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default=os.path.join(REPO, '.parity_big2'))
    ap.add_argument('--n_tiles', type=int, default=256)
    ap.add_argument('--photon_coef', type=float, default=8.0)
    ap.add_argument('--read_sigma', type=float, default=2.5)
    ap.add_argument('--n_test_tiles', type=int, default=8)
    ap.add_argument('--n_valid_tiles', type=int, default=2)
    ap.add_argument('--texture', default='v1', choices=['v1', 'v2'],
                    help="tile generator version (v2 = intra-ROI "
                         "structured texture; use --root .parity_big3)")
    ns = ap.parse_args()
    from srcaco2_tpu.data import build_scripts as B
    from scripts.parity_run import make_raw_sessions
    if os.path.isdir(os.path.join(ns.root, 'caco2')):
        print('# dataset already present:', ns.root)
        return
    raw = os.path.join(ns.root, 'raw')
    if os.path.isdir(os.path.join(raw, 'res1')):
        # raw tiles already generated (deterministic from seed 0) —
        # reuse them and only re-run the builder pipeline.
        dirs = {sc: os.path.join(raw, f'res{sc}') for sc in (1, 2, 4, 8)}
        sessions = [B.SessionSpec(res_dirs=dirs)]
        print('# reusing existing raw tiles:', raw)
    else:
        sessions = make_raw_sessions(ns.root, n_tiles=ns.n_tiles,
                                     photon_coef=ns.photon_coef,
                                     read_sigma=ns.read_sigma,
                                     texture=ns.texture)
    counts = B.build_caco2_from_raw(
        sessions, ns.root, hr_size=512, psize=128, del_border=8,
        min_area=0.1, threshold=4.0, n_test_tiles=ns.n_test_tiles,
        n_valid_tiles=ns.n_valid_tiles)
    print('# built:', {k: v for k, v in counts.items()
                       if k.startswith('_') or 'CELL0' in k})


if __name__ == '__main__':
    main()
