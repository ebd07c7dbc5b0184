#!/usr/bin/env python
"""Re-score finished parity-run experiments over ROI and collect the
trained-vs-bicubic ROI test numbers into one committed yaml.

The reference's headline Table 4 (doc/roi-perf.png, BASELINE.md Table
B) is ROI-only: metrics computed inside the thresholded cell mask,
marginalized over thresholds 4..10 (utils_trainer.py:874). The
parity runs train with the ROI pass off (it doubles eval cost); this
script re-runs the test protocol on each finished exp with
eval_over_roi_also=True via eval.py and extracts the ROI rows the
tracker records for the trained model and the bicubic co-eval.

Usage: python scripts/roi_rescore.py [--out FILE.yaml] <exp_dir> ...
       python scripts/roi_rescore.py --all   # all id_big2* exps
"""
import glob
import os
import pickle
import subprocess
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, 'srcaco2_tpu', 'diagnosis',
                   'PARITY_ROI_big2.yaml')


def last_vals(tracker, split, ds):
    m = tracker.get(split, {}).get(ds, {})
    return {k: float(v['vals'][-1]) for k, v in m.items()
            if isinstance(v, dict) and v.get('vals')}


def rescore(exp):
    exp = exp.rstrip('/')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'eval.py'),
         '--exp_path', exp, '--eval_over_roi_also', 'True'],
        env={**os.environ, 'SRCACO2_SWIN_F32_SOFTMAX': '1'})
    assert r.returncode == 0, (exp, r.returncode)
    outd = os.path.join(exp, 'eval_test_test')
    with open(os.path.join(outd, 'roi_tracker.pkl'), 'rb') as f:
        roi = pickle.load(f)
    with open(os.path.join(outd, 'tracker.pkl'), 'rb') as f:
        full = pickle.load(f)
    rows = {}
    for ds in roi.get('test', {}):
        vals = last_vals(roi, 'test', ds)
        if vals:
            rows[ds] = {'roi': vals,
                        'full': last_vals(full, 'test', ds)}
    return rows


def main():
    import argparse
    global OUT
    ap = argparse.ArgumentParser(
        description='re-score finished exps over ROI; merges into '
                    '--out (existing keys for other exps are kept)')
    ap.add_argument('exps', nargs='*', help='experiment directories')
    ap.add_argument('--out', default=OUT)
    ap.add_argument('--all', action='store_true',
                    help='all finished id_big2* exps')
    ns = ap.parse_args()
    OUT = os.path.abspath(ns.out)
    exps = ns.exps
    if ns.all:
        exps += sorted(
            d for d in glob.glob(os.path.join(
                REPO, '.parity_big2', 'exps', 'super-resolution',
                '*', '*', 'id_big2*'))
            if os.path.isfile(os.path.join(d, 'passed.txt')))
    assert exps, 'no experiments given'
    doc = {}
    if os.path.isfile(OUT):
        with open(OUT) as f:
            doc = yaml.safe_load(f) or {}
    doc.setdefault(
        'note',
        'ROI test metrics (thresholds 4..10 marginalized, reference '
        'Table 4 protocol) for the big2 parity runs, produced by '
        'scripts/roi_rescore.py re-running eval.py with '
        'eval_over_roi_also=True on each finished exp dir.')
    for exp in exps:
        key = '/'.join(exp.rstrip('/').split(os.sep)[-3:])
        print(f'== rescoring {key}')
        doc[key] = rescore(exp)
        with open(OUT, 'w') as f:
            yaml.safe_dump(doc, f, sort_keys=False)
    print(f'wrote {OUT}')


if __name__ == '__main__':
    main()
