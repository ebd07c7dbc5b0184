"""Evaluation engine: fast_eval + the test protocol.

Reference analogs: utils_trainer.fast_eval:533 (per-batch forward,
uint8-rounded metrics, ROI marginalization over thresholds 4..10,
per-image details, first-N prediction dumps), evaluate:1184 (test on
best-per-valid-ds models plus the bicubic Interpolate baseline under
'<ds>_bicubic'), and the corruption guard check_model_output_corruption.

TPU redesign: eval runs in fixed-size batches (last batch padded so one
compiled program serves the whole split); full + all 7 ROI thresholds are
computed in one device call per batch; per-image details come back as
(B,) vectors keyed by the static per-shard index map — no float-id
dict-sync trick needed.
"""
import functools
import os
import time
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.data import pipeline as P
from srcaco2_tpu.data.dataset import SRDataset
from srcaco2_tpu.models.interpolate import interpolate_model
from srcaco2_tpu.ops import metrics as M
from srcaco2_tpu.utils.logger import DLLogger

EVAL_METRICS = [constants.PSNR_MTR, constants.PSNR_Y_MTR,
                constants.MSE_MTR, constants.NRMSE_MTR,
                constants.SSIM_MTR]


def _metrics_one_batch(e_img, h_img, border: int, over_roi: bool,
                       roi_ths):
    out = {'full': M.compute_metrics(e_img, h_img, border)}
    if over_roi:
        out['roi'] = M.compute_metrics_roi_marginal(e_img, h_img, border,
                                                    roi_ths)
    return out


@functools.lru_cache(maxsize=32)
def make_metric_fn(border: int, over_roi: bool,
                   roi_ths: tuple) -> Callable:
    """Cached so repeated validations reuse one compiled program
    (a fresh jit per call re-compiled every validation)."""
    return jax.jit(lambda e, h: _metrics_one_batch(e, h, border,
                                                   over_roi, roi_ths))


def fast_eval(forward: Callable, params, ds: SRDataset, args,
              eval_bsize: int, split: str,
              save_img_dir: Optional[str] = None,
              nbr_to_plot: int = 30,
              current_step: int = 0,
              track_evolution_img: bool = False) -> Dict:
    """Evaluate one dataset split. Returns
    {'full': {metric: mean}, 'roi': {...}, 'details': {id: {...}},
    'n': N, 'time': s}."""
    t0 = time.perf_counter()
    n = len(ds)
    border = int(args['scale'])
    over_roi = bool(args.get('eval_over_roi_also', False))
    roi_ths = args.get('eval_over_roi_also_ths', constants.ROI_THRESH)
    metric_fn = make_metric_fn(border, over_roi,
                               tuple(roi_ths))

    if ds.hr_dev is None:
        ds.stage()

    sums = {'full': {m: 0.0 for m in EVAL_METRICS}}
    if over_roi:
        sums['roi'] = {m: 0.0 for m in EVAL_METRICS}
    details = {}
    roi_details = {}

    n_plotted = 0
    # multi-host: processes take interleaved batches and the
    # per-sample results are all-gathered afterwards; single-process
    # runs take every batch (utils_parallel sync_* analog).
    pidx, pcount = jax.process_index(), jax.process_count()
    starts = list(range(0, n, eval_bsize))[pidx::pcount] \
        if pcount > 1 else range(0, n, eval_bsize)
    for start in starts:
        idx = np.arange(start, min(start + eval_bsize, n))
        pad = eval_bsize - len(idx)
        idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad)]) \
            if pad else idx
        batch = P.make_eval_batch(ds.hr_dev, ds.lr_dev, jnp.asarray(idx_p))
        e_img = forward(params, batch)
        if not bool(jnp.all(jnp.isfinite(e_img))):
            DLLogger.log(f'CORRUPTED model output in eval ({ds.name}); '
                         f'aborting.')
            raise FloatingPointError('non-finite eval output')
        h_img = M.uint8_round(batch['h_im'])
        res = metric_fn(e_img, h_img)
        res = jax.tree.map(np.asarray, res)
        # metric sanity guard (reference: check_negative_non_float,
        # utils_trainer.py:933 — hard stop on nan/inf/negative).
        # SSIM is legitimately in [-1, 1]: an anticorrelated output
        # from a smoke-budget net triggers the negative branch without
        # any corruption, so fast-sweep mode (SRCACO2_FAST_SWEEP=1,
        # few-epoch seeds) demotes finite-negative to a warning; the
        # non-finite branch stays fatal everywhere.
        fast_sweep = os.environ.get('SRCACO2_FAST_SWEEP') == '1'
        for scope in res:
            for m, v in res[scope].items():
                vv = v[:len(idx)]
                if not np.all(np.isfinite(vv)):
                    DLLogger.log(f'CORRUPTED metric {scope}/{m} in '
                                 f'{ds.name}: {vv}')
                    raise FloatingPointError(
                        f'non-finite metric {scope}/{m}')
                if np.any(vv < 0):
                    DLLogger.log(f'CORRUPTED metric {scope}/{m} in '
                                 f'{ds.name}: {vv}')
                    if not fast_sweep:
                        raise FloatingPointError(
                            f'non-finite/negative metric {scope}/{m}')
        for scope in sums:
            for m in EVAL_METRICS:
                sums[scope][m] += float(res[scope][m][:len(idx)].sum())
        for j, gi in enumerate(idx):
            img_id = ds.ids[gi]
            details[img_id] = {m: float(res['full'][m][j])
                               for m in EVAL_METRICS}
            if over_roi:
                roi_details[img_id] = {m: float(res['roi'][m][j])
                                       for m in EVAL_METRICS}
        if save_img_dir and n_plotted < nbr_to_plot and \
                args.get('is_master', True):
            from srcaco2_tpu.data.io import imsave
            e_np = np.asarray(e_img)
            for j, gi in enumerate(idx):
                if n_plotted >= nbr_to_plot:
                    break
                img_id = ds.ids[gi].replace('/', '_')
                if track_evolution_img:
                    d = os.path.join(save_img_dir, img_id)
                    path = os.path.join(d, f'{img_id}_{current_step}.png')
                else:
                    path = os.path.join(save_img_dir, f'{img_id}.png')
                imsave(e_np[j].transpose(1, 2, 0), path)
                n_plotted += 1

    if pcount > 1:
        # gather the disjoint per-sample results across processes via
        # a dense (n, metrics) matrix (zeros off-process) + allgather.
        from jax.experimental import multihost_utils as MH
        scopes = [('full', details)] + ([('roi', roi_details)]
                                        if over_roi else [])
        for scope, det in scopes:
            mat = np.zeros((n, len(EVAL_METRICS)), np.float64)
            for gi, img_id in enumerate(ds.ids):
                if img_id in det:
                    mat[gi] = [det[img_id][m] for m in EVAL_METRICS]
            gathered = np.asarray(MH.process_allgather(mat)).sum(0)
            for gi, img_id in enumerate(ds.ids):
                det[img_id] = {m: float(gathered[gi, k])
                               for k, m in enumerate(EVAL_METRICS)}
            sums[scope] = {m: float(gathered[:, k].sum())
                           for k, m in enumerate(EVAL_METRICS)}

    out = {'full': {m: sums['full'][m] / n for m in EVAL_METRICS},
           'details': details, 'n': n,
           'time': time.perf_counter() - t0}
    if over_roi:
        out['roi'] = {m: sums['roi'][m] / n for m in EVAL_METRICS}
        out['roi_details'] = roi_details
    return out


def make_interpolate_forward(scale: int, mode: str) -> Callable:
    """The bicubic Interpolate pseudo-model as an eval forward."""

    @jax.jit
    def fwd(params, batch):
        out = interpolate_model(batch['l_im'], scale, mode)['out']
        return M.uint8_round(out)

    return fwd


def log_perf(tag: str, perf: Dict):
    f = perf['full']
    msg = (f"[{tag}] psnr {f[constants.PSNR_MTR]:.4f} dB | "
           f"ssim {f[constants.SSIM_MTR]:.4f} | "
           f"nrmse {f[constants.NRMSE_MTR]:.5f} | "
           f"mse {f[constants.MSE_MTR]:.4f} | "
           f"psnr_y {f[constants.PSNR_Y_MTR]:.4f} | "
           f"n={perf['n']} | {perf['time']:.1f}s")
    if 'roi' in perf:
        r = perf['roi']
        msg += (f"\n[{tag}/ROI] psnr {r[constants.PSNR_MTR]:.4f} dB | "
                f"ssim {r[constants.SSIM_MTR]:.4f} | "
                f"nrmse {r[constants.NRMSE_MTR]:.5f}")
    DLLogger.log(msg)
