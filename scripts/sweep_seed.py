#!/usr/bin/env python
"""Seed a multi-method x multi-dataset experiment tree for the sweep
demonstration (VERDICT r3 #8: the reference's eval_all.sh runs 144 =
16 methods x 9 datasets; round 3 demonstrated 1 method x 9).

Trains each (net, scale, cell) config for a SHORT budget in ONE process
(amortizing compile + staging the way the reference's 144 cold starts
cannot), writing standard experiment dirs — config_model.yml +
best-models — that eval.py / eval_all.py consume unchanged. These are
smoke-budget checkpoints for exercising the sweep engine at scale, not
converged models (the converged evidence lives in the PARITY_RUN yamls).

Usage:
  python scripts/sweep_seed.py --root .parity_big2 [--epochs 30]
      [--nets SRCNN,VDSR,DFCAN] [--scales 2,4,8] [--cells ...]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--exps_root', default=None,
                    help='default <root>/exps_sweep')
    ap.add_argument('--nets', default='SRCNN,VDSR,DFCAN')
    ap.add_argument('--scales', default='2,4,8')
    ap.add_argument('--cells', default='CELL0,CELL1,CELL2')
    ap.add_argument('--epochs', type=int, default=30)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--eval_bsize', type=int, default=8,
                    help='eval batch at 512 squared; the heaviest '
                         'nets (MemNet) need < 8 to fit eval '
                         'activations next to the train program')
    ap.add_argument('--h_size', type=int, default=64)
    ap.add_argument('--lr', type=float, default=3e-4)
    ap.add_argument('--fast', action='store_true',
                    help='sweep-scale mode: skip the per-experiment '
                         'final test-on-best + dashboard renders '
                         '(eval_all.py re-does the test eval) and '
                         'periodic full checkpoints (best-models are '
                         'still saved on validation bests) — ~15 s '
                         'per experiment on this host, ~40 min '
                         'across the 162-grid')
    ap.add_argument('--final_eval_only', action='store_true',
                    help='skip mid-train validations entirely: the '
                         "trainer's final _validate is then the first "
                         'eval, fires the best-model save, and costs '
                         'ONE eval per experiment — the minimum that '
                         'still leaves eval_all a checkpoint to score. '
                         'For attention nets at x2 (256-square inputs) '
                         'the per-epoch eval dominates the seed cost.')
    ns = ap.parse_args()
    if ns.fast:
        os.environ['SRCACO2_FAST_SWEEP'] = '1'

    from srcaco2_tpu import constants
    from srcaco2_tpu.config.parser import enable_compile_cache, get_args
    from srcaco2_tpu.train.trainer import Experiment
    from srcaco2_tpu.utils.logger import DLLogger

    import jax
    enable_compile_cache()

    root = os.path.abspath(ns.root)
    exps_root = ns.exps_root or os.path.join(root, 'exps_sweep')
    t_all = time.perf_counter()
    n = 0
    failures = []
    stopfile = os.path.join(root, 'STOP')
    for net in ns.nets.split(','):
        for sc in [int(s) for s in ns.scales.split(',')]:
            for cell in ns.cells.split(','):
                # graceful pause point: killing a TPU client mid-op
                # wedges the device grant until the far-end lease
                # expires (minutes) — touch <root>/STOP instead and
                # the sweep exits cleanly at the next boundary.
                if os.path.isfile(stopfile):
                    print(f'# STOP file present ({stopfile}); '
                          f'exiting cleanly', flush=True)
                    print(f'# seeded {n} experiments (stopped) in '
                          f'{time.perf_counter() - t_all:.1f}s',
                          flush=True)
                    return 'stopped'
                tr = constants.caco2_name(constants.TRAINSET, sc, cell)
                va = constants.caco2_name(constants.VALIDSET, sc, cell)
                te = constants.caco2_name(constants.TESTSET, sc, cell)
                exp_dir = os.path.join(exps_root, net,
                                       f'x{sc}_{cell}')
                if os.path.isfile(os.path.join(exp_dir, 'passed.txt')):
                    print(f'# skip (done): {exp_dir}', flush=True)
                    continue
                os.makedirs(exp_dir, exist_ok=True)
                h = ns.h_size if ns.h_size % sc == 0 else 128
                args = get_args([
                    '--net_type', net, '--scale', str(sc),
                    '--h_size', str(h), '--n_channels', '1',
                    '--train_dsets', tr, '--valid_dsets', va,
                    '--test_dsets', te,
                    '--data_root', root, '--splits_root', root,
                    '--l2', 'True',
                    '--max_epochs', str(ns.epochs),
                    '--batch_size', str(ns.batch),
                    '--eval_bsize', str(ns.eval_bsize),
                    '--checkpoint_eval',
                    '1000000000' if ns.final_eval_only else '1.0',
                    '--checkpoint_save',
                    '1000000000' if ns.fast else '1.0',
                    '--G_optimizer_lr', str(ns.lr),
                    '--plot_epoch_freq', '0'])
                args['abs_fd_exp'] = exp_dir
                args['is_master'] = True
                DLLogger.init(outdir=exp_dir, is_master=True,
                              verbose=False)
                t0 = time.perf_counter()
                # one bad config (e.g. an OOM at an unlucky
                # net x shape) must not kill the other 161: record
                # and move on — the sweep artifact reports failures.
                try:
                    exp = Experiment(args)
                    exp.train_valid()
                    with open(os.path.join(exp_dir,
                                           'config_model.yml'),
                              'w') as f:
                        yaml.safe_dump(args, f)
                    n += 1
                    print(f'# [{n}] {net} x{sc} {cell}: '
                          f'{time.perf_counter() - t0:.1f}s',
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    failures.append((net, sc, cell,
                                     f'{type(e).__name__}: {e}'))
                    print(f'# FAIL {net} x{sc} {cell}: '
                          f'{type(e).__name__}: {e}', flush=True)
                finally:
                    exp = None
        # per-net executable-cache reset: 18 nets x 9 shapes of jitted
        # train/eval programs otherwise accumulate in device/host
        # memory across the one-process sweep.
        jax.clear_caches()
    print(f'# seeded {n} experiments in '
          f'{time.perf_counter() - t_all:.1f}s -> {exps_root}',
          flush=True)
    if failures:
        print(f'# {len(failures)} FAILED configs:', flush=True)
        for net, sc, cell, msg in failures:
            print(f'#   {net} x{sc} {cell}: {msg}', flush=True)


if __name__ == '__main__':
    main()
