"""Batch inference over reconstruct-task experiment trees.

Reference analog: dlib/inference/inference_reconstruct.py — re-evaluate
a trained reconstruct experiment with an OVERRIDDEN reconstruct_input
(:164, the 'fake' blurred-chain input vs the eval-only 'real'
HR-downscale input), co-evaluate the interpolate baseline under
`<ds>_<basic_interpolation>`, write per-variant image dirs, and build
input | restored | target comparison figures. The shared walk /
noise-study machinery lives in inference.super_res (the reconstruct
mapping itself happens in data/dataset.load_dataset)."""
import os
from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.data.dataset import load_dataset
from srcaco2_tpu.data import pipeline as P
from srcaco2_tpu.ops import metrics as M
from srcaco2_tpu.utils.logger import DLLogger
from srcaco2_tpu.inference.super_res import (comparison_figure,
                                             load_exp, noise_study,
                                             reevaluate)

__all__ = ['load_exp', 'reevaluate', 'noise_study',
           'comparison_figure', 'reevaluate_reconstruct',
           'reconstruct_figure']


def reevaluate_reconstruct(exp_path: str,
                           reconstruct_input: Optional[str] = None,
                           split: str = constants.TESTSET,
                           n: int = -1,
                           save_images: bool = True) -> Dict:
    """Re-evaluate a trained reconstruct experiment, optionally
    overriding reconstruct_input ('fake' | 'real'); also evaluates the
    interpolate baseline under `<ds>_<basic_interpolation>` and writes
    predictions into per-variant image dirs
    (`<exp>/inference_reconstruct/images/<variant>/<split>/<ds>/`)."""
    from srcaco2_tpu.train.evaluator import (fast_eval,
                                             make_interpolate_forward)
    from srcaco2_tpu.train.steps import make_eval_forward

    model, params, args = load_exp(exp_path)
    assert args.get('task') == constants.RECONSTRUCT, args.get('task')
    if reconstruct_input is not None:
        args['reconstruct_input'] = reconstruct_input
    variant = str(args.get('reconstruct_input', 'fake'))
    ds_names = [s for s in str(args['test_dsets']
                               if split == constants.TESTSET
                               else args['valid_dsets']).split('+')
                if s]
    fwd = make_eval_forward(model, args['netG']['net_type'],
                            int(args['scale']), netG=args['netG'])
    outd = os.path.join(exp_path, 'inference_reconstruct')
    out = {}
    for name in ds_names:
        ds = load_dataset(args, name, constants.EVAL_PHASE, n=n)
        ds.stage()
        img_dir = None
        if save_images:
            img_dir = os.path.join(outd, 'images', variant, split,
                                   name.replace('/', '_'))
            os.makedirs(img_dir, exist_ok=True)
        perf = fast_eval(fwd, params, ds, args,
                         int(args['eval_bsize']), split,
                         save_img_dir=img_dir)
        out[name] = perf
        # interpolate baseline (inference_reconstruct.py:238-255):
        # at reconstruct scale 1 this is the identity pass-through,
        # i.e. the unrestored-input floor.
        interp = make_interpolate_forward(
            ds.scale, args.get('basic_interpolation',
                               constants.INTER_BICUBIC))
        bname = f"{name}_{args.get('basic_interpolation', 'bicubic')}"
        bperf = fast_eval(interp, None, ds, args,
                          int(args['eval_bsize']), split)
        out[bname] = bperf
        DLLogger.log(
            f"[reconstruct/{variant}] {name}: psnr "
            f"{perf['full'][constants.PSNR_MTR]:.4f} (floor "
            f"{bperf['full'][constants.PSNR_MTR]:.4f})")
    return out


def reconstruct_figure(exp_path: str, out_path: str,
                       sample_idx: int = 0,
                       reconstruct_input: Optional[str] = None,
                       split: str = constants.TESTSET) -> str:
    """input | restored | target panel figure for one sample of a
    reconstruct experiment (the reconstruct-specific layout of
    inference_reconstruct.py's visualization: the input is the
    degraded chain, not an LR image, so all three panels share the
    same resolution)."""
    from srcaco2_tpu.diagnosis.visualize import restore_grid
    from srcaco2_tpu.train.steps import make_eval_forward

    model, params, args = load_exp(exp_path)
    assert args.get('task') == constants.RECONSTRUCT, args.get('task')
    if reconstruct_input is not None:
        args['reconstruct_input'] = reconstruct_input
    name = [s for s in str(args['test_dsets']
                           if split == constants.TESTSET
                           else args['valid_dsets']).split('+') if s][0]
    ds = load_dataset(args, name, constants.EVAL_PHASE,
                      n=sample_idx + 1)
    ds.stage()
    batch = P.make_eval_batch(ds.hr_dev, ds.lr_dev,
                              jnp.asarray([sample_idx]))
    fwd = make_eval_forward(model, args['netG']['net_type'],
                            int(args['scale']), netG=args['netG'])
    e = np.asarray(fwd(params, batch))[0, 0]
    inp = np.asarray(M.uint8_round(batch['l_im']))[0, 0]
    trg = np.asarray(M.uint8_round(batch['h_im']))[0, 0]
    return restore_grid(
        [inp.astype(np.float32), e.astype(np.float32)],
        ['input (degraded)', 'restored'],
        trg.astype(np.float32), out_path)
