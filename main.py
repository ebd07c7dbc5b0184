#!/usr/bin/env python
"""Train + validate + test entry point.

Reference analog: main.py:23 — parse -> find checkpoint -> loaders ->
model -> train_valid -> final config dump. Same CLI flag surface
(--net_type --scale --train_dsets ... ; see srcaco2_tpu/config/parser.py).
"""
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from srcaco2_tpu.config.parser import parse_input
from srcaco2_tpu.train.trainer import Experiment
from srcaco2_tpu.utils.logger import DLLogger, fmsg


def main():
    args_obj, args = parse_input()
    DLLogger.log(fmsg(f"{args['method']} x{args['scale']} -> "
                      f"{args['fd_exp']}"))
    exp = Experiment(args)
    exp.train_valid()
    if args.get('is_master', True):
        with open(os.path.join(args['abs_fd_exp'],
                               'config_final.yml'), 'w') as f:
            yaml.safe_dump(args, f)
        # eval.py re-hydrates this file (reference: eval.py:64).
        with open(os.path.join(args['abs_fd_exp'],
                               'config_model.yml'), 'w') as f:
            yaml.safe_dump(args, f)


if __name__ == '__main__':
    main()
