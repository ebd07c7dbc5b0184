#!/usr/bin/env python
"""Demonstrate the one-process eval sweep at scale (VERDICT r2 #7).

Reference: eval_all.sh pays 144 cold starts (16 methods x 9 datasets,
one `python eval.py` each). This demo builds the full 3-cells x
3-scales synthetic tree with the offline builder, trains a quick SRCNN
on each of the 9 (cell, scale) combos so real experiment dirs exist,
then runs `eval_all.py` ONCE and records total wall time + per-dataset
eval throughput into docs/SWEEP.md.

Usage: python scripts/sweep_demo.py [--root DIR] [--epochs N]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default='/tmp/sweep_demo')
    ap.add_argument('--epochs', type=int, default=60)
    ap.add_argument('--n_tiles', type=int, default=12)
    ap.add_argument('--out', default=os.path.join(REPO, 'docs',
                                                  'SWEEP.md'))
    ns = ap.parse_args()

    from scripts.parity_run import make_raw_sessions
    from srcaco2_tpu.data import build_scripts as B
    from srcaco2_tpu import constants

    root = ns.root
    if not os.path.isdir(os.path.join(root, 'caco2')):
        print('# building 3-cells x 3-scales dataset tree...')
        sessions = make_raw_sessions(root, n_tiles=ns.n_tiles)
        B.build_caco2_from_raw(sessions, root, hr_size=512, psize=128,
                               del_border=8, min_area=0.1,
                               threshold=4.0, n_test_tiles=2,
                               n_valid_tiles=1)

    cells = [constants.CELL0, constants.CELL1, constants.CELL2]
    scales = [2, 4, 8]
    t_train0 = time.time()
    for cell in cells:
        for sc in scales:
            tr = constants.caco2_name(constants.TRAINSET, sc, cell)
            va = constants.caco2_name(constants.VALIDSET, sc, cell)
            te = constants.caco2_name(constants.TESTSET, sc, cell)
            cmd = [sys.executable, os.path.join(REPO, 'main.py'),
                   '--net_type', 'SRCNN', '--scale', str(sc),
                   '--l2', 'True', '--data_root', root,
                   '--splits_root', root,
                   '--train_dsets', tr, '--valid_dsets', va,
                   '--test_dsets', te,
                   '--max_epochs', str(ns.epochs),
                   '--batch_size', '32', '--h_size', '64',
                   '--eval_bsize', '8',
                   '--checkpoint_eval', '1.0',
                   '--checkpoint_save', '1.0',
                   '--plot_epoch_freq', '0',
                   '--exp_id', f'sweep_{cell}_x{sc}']
            print('#', cell, f'x{sc}')
            r = subprocess.run(cmd, cwd=root,
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.STDOUT)
            assert r.returncode == 0, (cell, sc, r.returncode)
    t_train = time.time() - t_train0

    # the timed artifact: ONE eval_all process over all 9 experiments
    t0 = time.time()
    out_json = os.path.join(root, 'sweep_results.json')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'eval_all.py'),
         '--exps_root', os.path.join(root, 'exps'),
         '--out', out_json], cwd=root)
    assert r.returncode == 0, r.returncode
    t_sweep = time.time() - t0

    with open(out_json) as f:
        results = json.load(f)
    n = len(results)
    lines = [
        '# One-process eval sweep at scale (measured)',
        '',
        f'3 cells x 3 scales synthetic tree (offline builder, '
        f'{ns.n_tiles} raw tiles -> 9 datasets), one SRCNN experiment '
        f'per (cell, scale), then `eval_all.py` ONCE over all '
        f'{n} experiments. Reference analog: eval_all.sh pays one '
        f'`python eval.py` cold start per (method, dataset) — 144 '
        f'invocations for the full grid.',
        '',
        f'- experiments evaluated: **{n}**',
        f'- total sweep wall time (one process): **{t_sweep:.1f} s** '
        f'({t_sweep / max(n, 1):.1f} s per experiment, amortized '
        f'compile + staging)',
        f'- (context: the 9 quick training runs took {t_train:.0f} s '
        f'total)',
        '',
        '| net | cell | scale | test psnr | eval imgs/s |',
        '|---|---|---|---|---|',
    ]
    for exp, res in sorted(results.items()):
        for dsn, r_ in res.get('datasets', {}).items():
            ips = (r_['n'] / r_['time']) if r_.get('time') else None
            ips_s = f'{ips:.1f}' if ips else '—'
            lines.append(
                f"| {res['net']} | {res['cell']} | x{res['scale']} "
                f"| {r_['psnr']:.2f} | {ips_s} |")
    lines.append('')
    with open(ns.out, 'w') as f:
        f.write('\n'.join(lines))
    print(f'# sweep: {n} experiments in {t_sweep:.1f}s; wrote {ns.out}')


if __name__ == '__main__':
    main()
