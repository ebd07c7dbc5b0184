#!/usr/bin/env python
"""Full evaluation sweep: every (method x cell x scale) in ONE process.

Reference analog: eval_all.sh — 144 separate `python eval.py` invocations
(16 methods x 3 cells x 3 scales). TPU redesign: a single process walks
the experiment tree (or an explicit list), reuses the staged datasets
across experiments of the same (cell, scale), and runs each eval with the
jitted batched evaluator — so the sweep amortizes decode + compile
instead of paying 144 cold starts.

Usage:
  python eval_all.py --exps_root exps [--methods SwinIR,DFCAN]
                     [--scales 2,4,8] [--cells CELL0,CELL1,CELL2]
                     [--split test]
"""
import argparse
import json
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from srcaco2_tpu import constants
from srcaco2_tpu.utils.logger import DLLogger, fmsg


def find_experiments(exps_root: str):
    """Yield experiment dirs (those containing config_model.yml)."""
    for dirpath, _, filenames in os.walk(exps_root):
        if 'config_model.yml' in filenames:
            yield dirpath


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--exps_root', default='exps')
    p.add_argument('--methods', default='')
    p.add_argument('--scales', default='')
    p.add_argument('--cells', default='')
    p.add_argument('--split', default=constants.TESTSET)
    p.add_argument('--out', default='eval_all_results.json')
    ns = p.parse_args()

    methods = [m for m in ns.methods.split(',') if m]
    scales = [int(s) for s in ns.scales.split(',') if s]
    cells = [c for c in ns.cells.split(',') if c]

    from srcaco2_tpu.config.parser import enable_compile_cache
    enable_compile_cache()

    DLLogger.init(outdir=None, is_master=True, verbose=True)
    from eval import evaluate_pretrained

    # Resume: a 162-experiment sweep runs ~1-2 h in one process; reload
    # prior results so a crash/restart only re-pays the unfinished tail
    # (reference analog: eval_all.sh restarts skip nothing — each of its
    # 144 processes is all-or-nothing).
    results = {}
    if os.path.isfile(ns.out):
        with open(ns.out) as f:
            results = {k: v for k, v in json.load(f).items()
                       if isinstance(v, dict)
                       and v.get('status') == 'ok'}
        if results:
            DLLogger.log(f'[eval_all] resuming: {len(results)} ok '
                         f'experiments loaded from {ns.out}')

    def dump():
        # atomic: the sweep is long and the json is the sweep's whole
        # artifact — never leave a half-written file.
        tmp = ns.out + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(results, f, indent=2)
        os.replace(tmp, ns.out)

    n_run = 0
    for exp in sorted(find_experiments(ns.exps_root)):
        with open(os.path.join(exp, 'config_model.yml')) as f:
            cfg = yaml.safe_load(f)
        nt = cfg['netG']['net_type']
        sc = int(cfg['scale'])
        cell = None
        for c in constants.CELLS:
            if c in str(cfg.get('test_dsets', '')):
                cell = c
        if methods and nt not in methods:
            continue
        if scales and sc not in scales:
            continue
        if cells and cell not in cells:
            continue
        if exp in results:
            continue
        DLLogger.log(fmsg(f'[{n_run}] {nt} x{sc} {cell}: {exp}'))
        try:
            summary = evaluate_pretrained(exp, ns.split)
            results[exp] = {'net': nt, 'scale': sc, 'cell': cell,
                            'status': 'ok',
                            'datasets': summary or {}}
        except Exception as e:  # keep sweeping
            DLLogger.log(f'[eval_all] FAILED {exp}: {e}')
            results[exp] = {'net': nt, 'scale': sc, 'cell': cell,
                            'status': f'error: {e}'}
        n_run += 1
        dump()

    dump()
    DLLogger.log(fmsg(f'sweep done: {n_run} experiments -> {ns.out}'))


if __name__ == '__main__':
    main()
