"""Batch inference / re-evaluation / visualization over experiment trees.

Capability parity with dlib/inference/inference_super_res.py: walk trained
experiment dirs, re-evaluate on a chosen split (evaluate():138), build
side-by-side comparison figures across methods (LR / bicubic / method
predictions / HR), and run the synthetic-noise robustness study
(generate_synthetic_via_noise():268 — re-evaluate with extra Gaussian
noise of increasing sigma injected into the LR inside the ROI).
"""
import os
from typing import Dict, List, Optional

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.data import pipeline as P
from srcaco2_tpu.data.dataset import load_dataset
from srcaco2_tpu.data.io import imsave
from srcaco2_tpu.ops import metrics as M
from srcaco2_tpu.utils.logger import DLLogger


def load_exp(exp_path: str):
    """Rebuild (model, params, args) from a trained experiment dir."""
    with open(os.path.join(exp_path, 'config_model.yml')) as f:
        args = yaml.safe_load(f)
    args['is_train'] = False
    args['distributed'] = False
    from srcaco2_tpu.models.registry import define_g, init_params
    from srcaco2_tpu.train import checkpoint as CKPT
    model = define_g(args)
    nt = args['netG']['net_type']
    in_hw = args['h_size'] if nt in constants.PRE_UPSAMPLED_INPUT_NETS \
        else args['h_size'] // args['scale']
    sample = jnp.zeros((1, args['n_channels'], in_hw, in_hw), jnp.float32)
    params = init_params(model, jax.random.key(0), sample)
    params = CKPT.load_best(exp_path, params)
    return model, params, args


def reevaluate(exp_path: str, split: str = constants.TESTSET,
               n: int = -1, noise_sigma: float = 0.0,
               inter_low_th: float = 7.0) -> Dict:
    """Re-evaluate one experiment; optionally inject synthetic Gaussian
    noise (std noise_sigma, inside ROI=(v>=th)) into the LR first."""
    model, params, args = load_exp(exp_path)
    ds_names = [s for s in str(args['test_dsets']
                               if split == constants.TESTSET
                               else args['valid_dsets']).split('+') if s]
    from srcaco2_tpu.train.steps import make_eval_forward
    fwd = make_eval_forward(model, args['netG']['net_type'],
                            int(args['scale']), netG=args['netG'])
    out = {}
    for name in ds_names:
        ds = load_dataset(args, name, constants.EVAL_PHASE, n=n)
        if noise_sigma > 0:
            lr = ds.lr.astype(np.float32)
            rng = np.random.default_rng(0)
            roi = lr >= inter_low_th
            noisy = lr + rng.normal(0, noise_sigma, lr.shape) * roi
            ds.lr = np.clip(noisy, 0, 255).astype(np.uint8)
        ds.stage()
        from srcaco2_tpu.train.evaluator import fast_eval
        perf = fast_eval(fwd, params, ds, args, int(args['eval_bsize']),
                         split)
        out[name] = perf
        DLLogger.log(f'{exp_path} {name} sigma={noise_sigma}: '
                     f"psnr {perf['full'][constants.PSNR_MTR]:.4f}")
    return out


def noise_study(exp_path: str, sigmas=(0, 5, 10, 20, 40),
                n: int = 8) -> Dict[float, Dict]:
    """Synthetic-noise robustness curve."""
    return {s: reevaluate(exp_path, noise_sigma=float(s), n=n)
            for s in sigmas}


def comparison_figure(exp_paths: List[str], out_path: str,
                      sample_idx: int = 0, split=constants.TESTSET):
    """Side-by-side figure: LR(bicubic) | per-method preds | HR."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from srcaco2_tpu.models.interpolate import interpolate_model

    panels = []
    titles = []
    hr_img = None
    for i, exp in enumerate(exp_paths):
        model, params, args = load_exp(exp)
        name = [s for s in str(args['test_dsets']).split('+') if s][0]
        ds = load_dataset(args, name, constants.EVAL_PHASE,
                          n=sample_idx + 1).stage()
        batch = P.make_eval_batch(ds.hr_dev, ds.lr_dev,
                                  jnp.asarray([sample_idx]))
        if i == 0:
            bi = interpolate_model(batch['l_im'],
                                   int(args['scale']))['out']
            panels.append(np.asarray(M.uint8_round(bi))[0, 0])
            titles.append('Bicubic')
            hr_img = np.asarray(M.uint8_round(batch['h_im']))[0, 0]
        from srcaco2_tpu.train.steps import make_eval_forward
        fwd = make_eval_forward(model, args['netG']['net_type'],
                                int(args['scale']), netG=args['netG'])
        e = np.asarray(fwd(params, batch))[0, 0]
        panels.append(e)
        titles.append(args['netG']['net_type'])
    # per-panel PSNR/SSIM captions + optional method GIF
    # (reference inference_super_res.py:138-334 builds the same
    # side-by-side figures and per-method gifs across the exp tree).
    from srcaco2_tpu.diagnosis.visualize import restore_grid
    gif = os.path.splitext(out_path)[0] + '.gif'
    return restore_grid(panels, titles, hr_img, out_path,
                        gif_path=gif)
