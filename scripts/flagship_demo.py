#!/usr/bin/env python
"""Flagship demo: run the real SwinIR x8 benchmark command end-to-end on
TPU with a realistic-shape synthetic dataset (512^2 HR tiles, 64^2 LR),
including the full eval protocol (ROI marginalization, model selection
over ROI, bicubic floor). Produces the standard experiment directory.

Usage: python scripts/flagship_demo.py [--n_train 96] [--epochs 4]
Prints a JSON summary line at the end.
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n_train', type=int, default=96)
    ap.add_argument('--epochs', type=int, default=4)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--root', default='')
    ap.add_argument('--ckpt_eval', default='1.0')
    ap.add_argument('--lr', default='0.0002')
    ns = ap.parse_args()

    from srcaco2_tpu import constants
    from srcaco2_tpu.config.parser import get_args
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    from srcaco2_tpu.train.trainer import Experiment

    root = ns.root or tempfile.mkdtemp(prefix='flagship_')
    t0 = time.perf_counter()
    names = make_synthetic_dataset(root, scale=8, cell='CELL2',
                                   n_train=ns.n_train, n_val=6,
                                   n_test=8, size=512)
    print(f'# synthetic dataset in {time.perf_counter() - t0:.1f}s')

    # the README flagship command, TPU edition
    args = get_args([
        '--net_type', 'SwinIR', '--scale', '8', '--h_size', '128',
        '--n_channels', '1',
        '--train_dsets', names[0], '--valid_dsets', names[1],
        '--test_dsets', names[2],
        '--data_root', root, '--splits_root', root,
        '--l2', 'True', '--l2_lambda', '1.',
        '--ssim', 'True', '--ssim_lambda', '5.',
        '--ssim_window_s', '19',
        '--eval_over_roi_also', 'True',
        '--eval_over_roi_also_model_select', 'True',
        '--swinir_upsampler', 'pixelshuffledirect',
        '--amp', 'True',
        '--sample_tr_patch', 'roi',
        '--sample_tr_patch_th_style', 'fix_threshold',
        '--sample_tr_patch_th', '4.0',
        '--batch_size', str(ns.batch), '--eval_bsize', '4',
        '--max_epochs', str(ns.epochs),
        '--checkpoint_eval', ns.ckpt_eval,
        '--checkpoint_save', ns.ckpt_eval,
        '--G_optimizer_lr', ns.lr,
        '--G_optimizer_clipgrad', '0.5',
        '--test_epoch_freq', '1000000',
        '--plot_epoch_freq', '1000000'])
    args['abs_fd_exp'] = os.path.join(root, 'exp')
    os.makedirs(args['abs_fd_exp'], exist_ok=True)

    exp = Experiment(args)
    exp.train_valid()

    tn = names[2]
    trained = exp.tracker[constants.TESTSET][tn][
        constants.PSNR_MTR]['vals'][-1]
    bicubic = exp.tracker[constants.TESTSET][tn + '_bicubic'][
        constants.PSNR_MTR]['vals'][-1]
    roi_tr = exp.roi_tracker[constants.TESTSET][tn][
        constants.PSNR_MTR]['vals'][-1]
    roi_bi = exp.roi_tracker[constants.TESTSET][tn + '_bicubic'][
        constants.PSNR_MTR]['vals'][-1]
    print(json.dumps({
        'exp': args['abs_fd_exp'],
        'test_psnr': round(trained, 4),
        'bicubic_psnr': round(bicubic, 4),
        'roi_test_psnr': round(roi_tr, 4),
        'roi_bicubic_psnr': round(roi_bi, 4),
        'total_s': round(time.perf_counter() - t0, 1),
    }))


if __name__ == '__main__':
    main()
