#!/usr/bin/env python
"""Generate the full benchmark runbook: one training command per
(method x scale x cell), mirroring the reference README's command
blocks, plus the eval sweep. Writes docs/COMMANDS.md (or stdout)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from srcaco2_tpu import constants


def train_cmd(net: str, scale: int, cell: str, data_root: str) -> str:
    tr = constants.caco2_name('train', scale, cell)
    va = constants.caco2_name('val', scale, cell)
    te = constants.caco2_name('test', scale, cell)
    parts = [
        'python main.py',
        f'--net_type {net}', f'--scale {scale}',
        '--h_size 128' if scale == 8 else
        ('--h_size 96' if scale == 2 else '--h_size 96'),
        '--n_channels 1',
        f'--train_dsets {tr}', f'--valid_dsets {va}',
        f'--test_dsets {te}',
        f'--data_root {data_root}', f'--splits_root {data_root}',
        '--l2 True --l2_lambda 1.',
        '--ssim True --ssim_lambda 5. --ssim_window_s 19',
        '--eval_over_roi_also True',
        '--eval_over_roi_also_model_select True',
        '--sample_tr_patch roi',
        '--sample_tr_patch_th_style fix_threshold',
        '--sample_tr_patch_th 4.0',
        '--amp True --batch_size 64 --max_epochs 70',
        # reference README recipe (README.md:152-159): SGD lr 0.01,
        # MyStepLR step 30 / gamma 0.5 ticked per ITERATION (reaching
        # the 1e-4 floor within ~200 steps). SGD's unnormalized
        # updates are what keeps loud-residual nets (VDSR/DRRN-class)
        # from dying to zero-residual under this loss; with Adam add
        # --G_scheduler_warmup instead (docs/QUALITY.md).
        '--G_optimizer_type sgd --G_optimizer_lr 0.01',
        '--G_scheduler_type MyStepLR --G_scheduler_step_size 30',
        '--G_scheduler_gamma 0.5',
        '--G_optimizer_clipgrad 0.5',   # stabilizes the ssim term
        '--checkpoint_eval 1.0 --checkpoint_save 1.0',
    ]
    if net == constants.SWINIR:
        parts.append('--swinir_upsampler pixelshuffledirect')
    return ' \\\n  '.join(parts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data_root', default='$DATA_ROOT')
    ap.add_argument('--out', default='docs/COMMANDS.md')
    ns = ap.parse_args()

    lines = ['# Benchmark runbook',
             '',
             'One training command per (method, scale, cell) — '
             f'{len(constants.MODELS)} methods x {len(constants.SCALES)}'
             f' scales x {len(constants.CELLS)} cells = '
             f'{len(constants.MODELS) * 9} runs — plus the sweep '
             'evaluation. Set `DATA_ROOT` to the SR-CACO-2 root '
             '(contains `caco2/` and `folds/`).', '']
    for net in constants.MODELS:
        lines.append(f'## {net}')
        lines.append('')
        for scale in constants.SCALES:
            for cell in constants.CELLS:
                lines.append(f'### {net} x{scale} {cell}')
                lines.append('```bash')
                lines.append(train_cmd(net, scale, cell, ns.data_root))
                lines.append('```')
                lines.append('')
    lines += ['## Evaluate everything', '', '```bash',
              'python eval_all.py --exps_root exps', '```', '']
    text = '\n'.join(lines)
    if ns.out == '-':
        print(text)
    else:
        os.makedirs(os.path.dirname(ns.out), exist_ok=True)
        with open(ns.out, 'w') as f:
            f.write(text)
        print(f'wrote {ns.out} ({len(lines)} lines)')


if __name__ == '__main__':
    main()
