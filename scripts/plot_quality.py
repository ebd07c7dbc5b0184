#!/usr/bin/env python
"""Render the committed PARITY_RUN yamls (train-loss + valid-PSNR
curves, bicubic floors, test margins) into one evidence figure:
docs/quality_curves.png. Run after scripts/parity_run.py."""
import argparse
import glob
import os
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default=os.path.join(
        REPO, 'docs', 'quality_curves.png'))
    ap.add_argument('--yamls', default='')
    ns = ap.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    paths = ns.yamls.split(',') if ns.yamls else sorted(
        glob.glob(os.path.join(REPO, 'srcaco2_tpu', 'diagnosis',
                               'PARITY_RUN*.yaml')))
    paths = [p for p in paths if 'smoke' not in p]
    runs = []
    for p in paths:
        with open(p) as f:
            d = yaml.safe_load(f)
        if d.get('curves'):
            runs.append((os.path.basename(p), d))
    if not runs:
        print('no PARITY_RUN yamls with curves found')
        return

    # wrap into banks of <=6 runs per row-pair so the figure stays
    # readable as the run count grows
    per_row = 6
    n_banks = (len(runs) + per_row - 1) // per_row
    fig, axes = plt.subplots(2 * n_banks, per_row, squeeze=False,
                             figsize=(4.6 * per_row, 6.4 * n_banks))
    for ax in axes.ravel():
        ax.set_visible(False)
    for idx, (name, d) in enumerate(runs):
        bank, j = divmod(idx, per_row)
        c = d['curves']
        cfg = d.get('config', {})
        title = (f"{cfg.get('net')} x{cfg.get('scale')} "
                 f"{cfg.get('loss')}"
                 + (f" fused={cfg.get('fused')}"
                    if cfg.get('fused') is not None else ''))
        ax = axes[2 * bank][j]
        ax.set_visible(True)
        for k, v in c.items():
            if k.startswith('train_') and k.endswith('_per_epoch'):
                ax.plot(np.linspace(0, 1, len(v)), v,
                        label=k[len('train_'):-len('_per_epoch')],
                        lw=1)
        ax.set_title(title, fontsize=9)
        ax.set_xlabel('training progress')
        ax.set_ylabel('train loss')
        ax.legend(fontsize=7)
        ax = axes[2 * bank + 1][j]
        ax.set_visible(True)
        bi = d.get('bicubic_test', {}).get('full', {}).get('psnr')
        for k in c:
            if k.startswith('valid_psnr_'):
                steps = c.get('valid_steps_' + k[len('valid_psnr_'):],
                              list(range(len(c[k]))))
                ax.plot(steps[:len(c[k])], c[k], marker='o', ms=3,
                        label='valid psnr (trained)')
        if bi is not None:
            ax.axhline(bi, color='crimson', ls='--', lw=1,
                       label=f'bicubic TEST floor {bi:.2f}')
        tt = None
        for fname, v in d.get('trained_test', {}).items():
            if fname.startswith('details_test') and 'roi' not in fname:
                tt = v.get('psnr')
        if tt is not None:
            ax.axhline(tt, color='seagreen', ls=':', lw=1.2,
                       label=f'trained TEST {tt:.2f}')
        ax.set_xlabel('step')
        ax.set_ylabel('PSNR (dB)')
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(ns.out, dpi=140)
    print(f'wrote {ns.out}')


if __name__ == '__main__':
    main()
