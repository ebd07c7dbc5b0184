#!/usr/bin/env python
"""Render eval_all.py results as a Table-5-format markdown (the
reference's published layout: one section per scale, one row per
method + the bicubic floor, PSNR/NRMSE/SSIM per cell + 3-cell means).

Row rendering is shared with the onboarding kit
(srcaco2_tpu.diagnosis.parity._fmt_row) so the two Table-5 emitters
cannot drift.

Usage: python scripts/sweep_table.py --results eval_all_results.json \
           [--out docs/sweep_table.md]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

from srcaco2_tpu import constants
from srcaco2_tpu.diagnosis.parity import _fmt_row

CELLS = list(constants.CELLS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--results', required=True)
    ap.add_argument('--out', default='sweep_table.md')
    ns = ap.parse_args()
    with open(ns.results) as f:
        res = json.load(f)

    # {scale: {method: {cell: metrics}}}
    table = {}
    for exp, r in res.items():
        if r.get('status') != 'ok':
            continue
        sc, net, cell = int(r['scale']), r['net'], r['cell']
        for dsn, m in r.get('datasets', {}).items():
            method = 'Bicubic' if dsn.endswith('_bicubic') else net
            table.setdefault(sc, {}).setdefault(
                method, {})[cell] = m

    lines = ['# Sweep results (Table-5 layout)', '',
             'PSNR dB / NRMSE / SSIM per cell, test split, published '
             'metric protocol.', '']
    for sc in sorted(table):
        lines += [f'## X{sc}', '',
                  '| method | ' + ' | '.join(CELLS) + ' | Mean |',
                  '|---|' + '---|' * (len(CELLS) + 1)]
        methods = sorted(table[sc], key=lambda m: (m != 'Bicubic', m))
        for method in methods:
            lines.append(_fmt_row(method, table[sc][method], CELLS))
        lines.append('')
    md = '\n'.join(lines)
    with open(ns.out, 'w') as f:
        f.write(md)
    print(md)


if __name__ == '__main__':
    main()
