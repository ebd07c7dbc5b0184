#!/usr/bin/env python
"""Evaluate a trained experiment directory.

Reference analog: eval.py:46 — re-hydrate config_model.yml from the exp
dir, load best-models/G-model, run the test protocol (including the
bicubic baseline), save tracker.

Usage: python eval.py --exp_path <exp dir> [--split test]
"""
import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from srcaco2_tpu import constants
from srcaco2_tpu.train.trainer import Experiment
from srcaco2_tpu.train import checkpoint as CKPT
from srcaco2_tpu.utils import tracker as T
from srcaco2_tpu.utils.logger import DLLogger, fmsg


def evaluate_pretrained(exp_path: str, split: str = constants.TESTSET,
                        over_roi: bool = None):
    cfg_path = os.path.join(exp_path, 'config_model.yml')
    assert os.path.isfile(cfg_path), cfg_path
    with open(cfg_path) as f:
        args = yaml.safe_load(f)
    args['is_train'] = False
    args['distributed'] = False
    args['abs_fd_exp'] = os.path.abspath(exp_path)
    if over_roi is not None:
        # re-score a finished exp over ROI even if it trained with the
        # ROI pass off (reference: eval_over_roi_also,
        # utils_config.py; the ROI headline table doc/roi-perf.png
        # is produced this way).
        args['eval_over_roi_also'] = bool(over_roi)

    outd = os.path.join(exp_path, f'eval_test_{split}')
    os.makedirs(outd, exist_ok=True)
    DLLogger.init(outdir=outd, is_master=True,
                  verbose=args.get('verbose', True))
    DLLogger.log(fmsg(f"eval {args['method']} x{args['scale']} "
                      f"({exp_path})"))

    exp = Experiment(args)
    exp.state = exp.state.replace(
        params=CKPT.load_best(exp_path, exp.state.params))
    summary = exp.evaluate_test(step=0, use_best=True)
    T.save_tracker(exp.tracker, outd)
    T.save_tracker(exp.roi_tracker, outd, 'roi_tracker.pkl')
    T.plot_tracker(exp.tracker, outd)
    return summary


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--exp_path', required=True)
    p.add_argument('--split', default=constants.TESTSET)
    p.add_argument('--eval_over_roi_also', default=None,
                   help='True/False: override the saved config (re-score '
                        'a finished exp over ROI)')
    ns = p.parse_args()
    over_roi = None
    if ns.eval_over_roi_also is not None:
        over_roi = str(ns.eval_over_roi_also).lower() in ('1', 'true', 'yes')
    evaluate_pretrained(ns.exp_path, ns.split, over_roi)


if __name__ == '__main__':
    main()
