#!/usr/bin/env python
"""Quality check: train a model on a synthetic dataset long enough to
beat the bicubic baseline — evidence that the full learning loop
(pipeline -> model -> loss -> optimizer -> eval protocol) improves PSNR.

Usage: python scripts/train_quality_check.py [--net VDSR] [--steps 300]
Prints one JSON line: {"net":..., "trained_psnr":..., "bicubic_psnr":...,
"delta":...}.
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--net', default='VDSR')
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--scale', type=int, default=2)
    ap.add_argument('--n_train', type=int, default=48)
    ap.add_argument('--size', type=int, default=128)
    ap.add_argument('--h_size', type=int, default=64)
    ap.add_argument('--lr', type=float, default=0.0005)
    ap.add_argument('--eval_every', default='1.0',
                    help='checkpoint_eval: float in ]0,1] = fraction '
                         'of an epoch, int = every N iterations '
                         '(fewer mid-train validations for long runs)')
    ns = ap.parse_args()

    from srcaco2_tpu.config.parser import get_args
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    from srcaco2_tpu.train.trainer import Experiment
    from srcaco2_tpu import constants

    root = tempfile.mkdtemp(prefix='qcheck_')
    names = make_synthetic_dataset(root, scale=ns.scale, cell='CELL0',
                                   n_train=ns.n_train, n_val=6,
                                   n_test=6, size=ns.size)
    batch = 8
    spe = ns.n_train // batch
    epochs = max(1, ns.steps // spe)
    args = get_args([
        '--net_type', ns.net, '--scale', str(ns.scale),
        '--h_size', str(ns.h_size), '--n_channels', '1',
        '--train_dsets', names[0], '--valid_dsets', names[1],
        '--test_dsets', names[2],
        '--data_root', root, '--splits_root', root,
        '--l2', 'True', '--max_epochs', str(epochs),
        '--batch_size', str(batch), '--eval_bsize', '6',
        '--checkpoint_eval', ns.eval_every,
        '--checkpoint_save', ns.eval_every,
        '--G_optimizer_lr', str(ns.lr)])
    args['abs_fd_exp'] = os.path.join(root, 'exp')
    os.makedirs(args['abs_fd_exp'], exist_ok=True)

    exp = Experiment(args)
    exp.train_valid()

    tn = names[2]
    trained = exp.tracker[constants.TESTSET][tn][
        constants.PSNR_MTR]['vals'][-1]
    bicubic = exp.tracker[constants.TESTSET][tn + '_bicubic'][
        constants.PSNR_MTR]['vals'][-1]
    print(json.dumps({'net': ns.net, 'steps': epochs * spe,
                      'trained_psnr': round(trained, 4),
                      'bicubic_psnr': round(bicubic, 4),
                      'delta': round(trained - bicubic, 4),
                      'beats_bicubic': trained > bicubic}))


if __name__ == '__main__':
    main()
