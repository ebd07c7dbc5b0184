#!/usr/bin/env python
"""Decompose a finished exp's ROI score into its per-item, per-threshold
anatomy (VERDICT r3 #3 follow-up).

The reference's Table 4 protocol (utils_trainer.py:874) averages
per-item ROI PSNR over thresholds 4..10, where an item whose ROI mask
is EMPTY at a threshold contributes the MSE-floor PSNR cap (~496.67 dB,
utils_image.py:843 epsilon -> ops/metrics.PSNR_CAP_DB). On benchmarks
whose test items are 128x128 patches, background-dominated patches hit
the cap and arithmetically dilute the trained-vs-bicubic margin: a
handful of 496 dB terms shared by BOTH arms dominate the mean while the
margin on real-ROI items shrinks by the cap mass.

This script reports, for the trained model and the bicubic baseline:
  * per threshold: empty-ROI items, cap hits, mean ROI px;
  * the protocol mean ROI PSNR (sanity: matches roi_rescore);
  * the cap-excluded mean ROI PSNR margin (items x thresholds where
    neither arm capped);
  * the pooled ROI PSNR (MSE summed over ALL ROI pixels of the split,
    then one log) — the cap-free, pixel-weighted headline.

Usage: python scripts/roi_anatomy.py --exp_path <exp dir>
"""
import argparse
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--exp_path', required=True)
    ap.add_argument('--out', default=None, help='optional yaml out')
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from srcaco2_tpu import constants
    from srcaco2_tpu.data import pipeline as P
    from srcaco2_tpu.ops import metrics as M
    from srcaco2_tpu.train import checkpoint as CKPT
    from srcaco2_tpu.train.trainer import Experiment
    from srcaco2_tpu.utils.logger import DLLogger

    exp_path = ns.exp_path.rstrip('/')
    with open(os.path.join(exp_path, 'config_model.yml')) as f:
        args = yaml.safe_load(f)
    args['is_train'] = False
    args['distributed'] = False
    args['abs_fd_exp'] = os.path.abspath(exp_path)
    DLLogger.init(outdir='/tmp', is_master=True, verbose=False)
    exp = Experiment(args)
    params = CKPT.load_best(exp_path, exp.state.params)
    border = int(args['scale'])
    ths = list(args.get('eval_over_roi_also_ths', constants.ROI_THRESH))

    ds = exp.test_sets[0]
    ds.stage()
    n = len(ds)
    bs = int(args['eval_bsize'])

    @jax.jit
    def batch_metrics(e_img, h_img):
        out = {}
        for th in ths:
            m = M.compute_metrics(e_img, h_img, border,
                                  roi_th=float(th))
            roi = (h_img >= float(th))[:, :1]
            roi = roi[:, :, border:-border, border:-border] \
                if border else roi
            b = roi.shape[0]
            rf = roi.reshape(b, -1).astype(jnp.float32)
            out[th] = {'psnr': m[constants.PSNR_MTR],
                       'roi_px': rf.sum(-1),
                       'roi_sse': ((e_img - h_img)[:, :1,
                                   border:-border or None,
                                   border:-border or None].reshape(
                                       b, -1) ** 2 * rf).sum(-1)}
        return out

    from srcaco2_tpu.train.evaluator import make_interpolate_forward
    bic = make_interpolate_forward(int(args['scale']),
                                   args.get('interpolation_mode',
                                            'bicubic'))

    rows = {'trained': [], 'bicubic': []}
    for start in range(0, n, bs):
        idx = np.arange(start, min(start + bs, n))
        pad = bs - len(idx)
        idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad)]) \
            if pad else idx
        batch = P.make_eval_batch(ds.hr_dev, ds.lr_dev,
                                  jnp.asarray(idx_p))
        h_img = M.uint8_round(batch['h_im'])
        for name, fwd in (('trained',
                           lambda b: exp.forward(params, b)),
                          ('bicubic', lambda b: bic(None, b))):
            res = jax.tree.map(
                np.asarray, batch_metrics(fwd(batch), h_img))
            rows[name].append({t: {k: v[:len(idx)]
                                   for k, v in res[t].items()}
                               for t in res})

    cat = {a: {t: {k: np.concatenate([r[t][k] for r in rows[a]])
                   for k in rows[a][0][t]} for t in ths}
           for a in rows}
    cap = M.PSNR_CAP_DB - 1.0
    report = {'exp': exp_path, 'n_items': int(n), 'thresholds': ths,
              'per_threshold': {}}
    tr_all, bi_all, keep_tr, keep_bi = [], [], [], []
    sse_tr = sse_bi = px_tot = 0.0
    for t in ths:
        tr, bi = cat['trained'][t], cat['bicubic'][t]
        capped = (tr['psnr'] >= cap) | (bi['psnr'] >= cap)
        report['per_threshold'][int(t)] = {
            'empty_roi_items': int((tr['roi_px'] == 0).sum()),
            'cap_hits': int(capped.sum()),
            'mean_roi_px': float(tr['roi_px'].mean()),
            'mean_psnr_trained': float(tr['psnr'].mean()),
            'mean_psnr_bicubic': float(bi['psnr'].mean()),
        }
        tr_all.append(tr['psnr'])
        bi_all.append(bi['psnr'])
        keep_tr.append(tr['psnr'][~capped])
        keep_bi.append(bi['psnr'][~capped])
        sse_tr += float(tr['roi_sse'].sum())
        sse_bi += float(bi['roi_sse'].sum())
        px_tot += float(tr['roi_px'].sum())
    tr_all, bi_all = np.concatenate(tr_all), np.concatenate(bi_all)
    keep_tr, keep_bi = np.concatenate(keep_tr), np.concatenate(keep_bi)
    pooled_tr = 10 * np.log10(255.0 ** 2 / (sse_tr / px_tot))
    pooled_bi = 10 * np.log10(255.0 ** 2 / (sse_bi / px_tot))
    report['protocol_mean'] = {
        'trained': float(tr_all.mean()), 'bicubic': float(bi_all.mean()),
        'margin': float(tr_all.mean() - bi_all.mean())}
    report['cap_excluded_mean'] = {
        'kept_frac': float(len(keep_tr) / len(tr_all)),
        'trained': float(keep_tr.mean()), 'bicubic': float(keep_bi.mean()),
        'margin': float(keep_tr.mean() - keep_bi.mean())}
    report['pooled_roi'] = {
        'trained': float(pooled_tr), 'bicubic': float(pooled_bi),
        'margin': float(pooled_tr - pooled_bi),
        'roi_px': float(px_tot)}
    print(yaml.safe_dump(report, sort_keys=False))
    if ns.out:
        with open(ns.out, 'w') as f:
            yaml.safe_dump(report, f, sort_keys=False)


if __name__ == '__main__':
    main()
