#!/usr/bin/env python
"""SwinIR trainability diagnostic: small SwinIR, x2, moderate LR, f32
vs bf16 — verifies the transformer training path converges (loss down,
PSNR up vs step 0)."""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run(amp: bool, lr: str, steps: int, root: str, names):
    from srcaco2_tpu import constants
    from srcaco2_tpu.config.parser import get_args
    from srcaco2_tpu.train.trainer import Experiment
    batch = 16
    n_train = 32
    spe = n_train // batch
    epochs = max(1, steps // spe)
    args = get_args([
        '--net_type', 'SwinIR', '--scale', '2', '--h_size', '64',
        '--n_channels', '1',
        '--train_dsets', names[0], '--valid_dsets', names[1],
        '--test_dsets', names[2],
        '--data_root', root, '--splits_root', root,
        '--l2', 'True', '--ssim', 'True', '--ssim_lambda', '5.',
        '--ssim_window_s', '19',
        '--swinir_embed_dim', '60', '--swinir_depths', '[2, 2]',
        '--swinir_num_heads', '[6, 6]',
        '--swinir_upsampler', 'pixelshuffledirect',
        '--amp', 'True' if amp else 'False',
        '--batch_size', str(batch), '--eval_bsize', '4',
        '--max_epochs', str(epochs),
        '--checkpoint_eval', str(max(steps // 2, 1)),
        '--checkpoint_save', str(steps),
        '--G_optimizer_lr', lr])
    args['abs_fd_exp'] = os.path.join(
        root, f'exp_amp{amp}_lr{lr}'.replace('.', 'p'))
    os.makedirs(args['abs_fd_exp'], exist_ok=True)
    exp = Experiment(args)
    exp.train_valid()
    l2 = exp.tracker['train']['period_epoch']['l2']
    tn = names[2]
    tr = exp.tracker[constants.TESTSET][tn][
        constants.PSNR_MTR]['vals'][-1]
    bi = exp.tracker[constants.TESTSET][tn + '_bicubic'][
        constants.PSNR_MTR]['vals'][-1]
    return {'amp': amp, 'lr': lr, 'l2_first': round(l2[0], 5),
            'l2_last': round(l2[-1], 5),
            'l2_min': round(min(l2), 5),
            'test_psnr': round(tr, 3), 'bicubic_psnr': round(bi, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=400)
    ns = ap.parse_args()
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    root = tempfile.mkdtemp(prefix='stab_')
    names = make_synthetic_dataset(root, scale=2, cell='CELL0',
                                   n_train=32, n_val=4, n_test=4,
                                   size=256)
    for amp, lr in [(False, '0.0002'), (True, '0.0002')]:
        print(json.dumps(run(amp, lr, ns.steps, root, names)))


if __name__ == '__main__':
    main()
