"""Metric tracker: nested dict of train losses + eval metrics with
best-value tracking, persisted to pickle, plotted with matplotlib.

Capability parity with /root/reference/dlib/utils/utils_tracker.py:
`init_tracker`:42, `update_tracker_eval`:226 (master metric picks the best
index, other metrics follow it), `save_tracker`:336, `find_last_tracker`:84,
`plot_tracker_eval`:344 / `plot_tracker_train`:476.
"""
import os
import pickle
from typing import Dict, List, Optional

from srcaco2_tpu import constants

PERIOD_EPOCH = 'period_epoch'
PERIOD_ITER = 'period_iter'


def init_tracker(loss_names: List[str], eval_ds_names: List[str],
                 metrics: Optional[List[str]] = None) -> dict:
    metrics = metrics or constants.METRICS
    t: Dict = {'train': {PERIOD_EPOCH: {}, PERIOD_ITER: {}}}
    for period in (PERIOD_EPOCH, PERIOD_ITER):
        for name in loss_names:
            t['train'][period][name] = []
    for split in (constants.VALIDSET, constants.TESTSET):
        t[split] = {}
        for ds in eval_ds_names:
            t[split][ds] = {}
            for m in metrics:
                t[split][ds][m] = {'vals': [], 'steps': [],
                                   'best_val': None, 'idx_best': -1}
    return t


def update_tracker_train(tracker: dict, period: str,
                         losses: Dict[str, float]):
    assert period in (PERIOD_EPOCH, PERIOD_ITER), period
    holder = tracker['train'][period]
    for name, val in losses.items():
        holder.setdefault(name, []).append(float(val))


def update_tracker_eval(tracker: dict, split: str, ds: str,
                        metrics: Dict[str, float], step: int,
                        master_metric: str) -> bool:
    """Append one eval point. The master metric decides whether this point
    is the new best; every other metric's `idx_best` follows the master's
    index (reference: utils_tracker.py:226). Returns True if new best."""
    holder = tracker[split][ds]
    is_best = False
    cmp = constants.BEST_MTR[master_metric]
    m_rec = holder[master_metric]
    new_val = float(metrics[master_metric])
    if m_rec['best_val'] is None or \
            cmp(new_val, m_rec['best_val']) == new_val:
        is_best = True
    new_idx = len(m_rec['vals'])
    for m, v in metrics.items():
        if m not in holder:
            holder[m] = {'vals': [], 'steps': [], 'best_val': None,
                         'idx_best': -1}
        rec = holder[m]
        rec['vals'].append(float(v))
        rec['steps'].append(int(step))
        if is_best:
            rec['idx_best'] = new_idx
            rec['best_val'] = rec['vals'][new_idx]
    return is_best


def best_of(tracker: dict, split: str, ds: str, metric: str):
    rec = tracker[split][ds][metric]
    return rec['best_val'], rec['idx_best']


def save_tracker(tracker: dict, outdir: str, name: str = 'tracker.pkl'):
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, name), 'wb') as f:
        pickle.dump(tracker, f, protocol=pickle.HIGHEST_PROTOCOL)


def find_last_tracker(outdir: str, name: str = 'tracker.pkl'
                      ) -> Optional[dict]:
    path = os.path.join(outdir, name)
    if os.path.isfile(path):
        with open(path, 'rb') as f:
            return pickle.load(f)
    return None


def plot_tracker(tracker: dict, outdir: str, prefix: str = 'tracker'):
    """Matplotlib dashboards: one figure for train losses, one per eval
    split with a subplot per (dataset, metric)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    os.makedirs(outdir, exist_ok=True)
    # train losses
    for period in (PERIOD_EPOCH, PERIOD_ITER):
        holder = tracker['train'][period]
        names = [n for n, v in holder.items() if v]
        if not names:
            continue
        fig, axes = plt.subplots(len(names), 1,
                                 figsize=(8, 2.5 * len(names)),
                                 squeeze=False)
        for ax, n in zip(axes[:, 0], names):
            ax.plot(holder[n])
            ax.set_title(f'train/{n} [{period}]', fontsize=9)
            ax.grid(True, alpha=.3)
        fig.tight_layout()
        fig.savefig(os.path.join(outdir, f'{prefix}_train_{period}.png'),
                    dpi=100)
        plt.close(fig)
    # eval metrics
    for split in (constants.VALIDSET, constants.TESTSET):
        if split not in tracker:
            continue
        for ds, mdict in tracker[split].items():
            names = [m for m, rec in mdict.items() if rec['vals']]
            if not names:
                continue
            fig, axes = plt.subplots(len(names), 1,
                                     figsize=(8, 2.5 * len(names)),
                                     squeeze=False)
            for ax, m in zip(axes[:, 0], names):
                rec = mdict[m]
                ax.plot(rec['steps'], rec['vals'], marker='.')
                if rec['idx_best'] >= 0:
                    ax.axvline(rec['steps'][rec['idx_best']],
                               color='r', ls='--', alpha=.5)
                ax.set_title(f'{split}/{ds}/{m} '
                             f'(best={rec["best_val"]})', fontsize=8)
                ax.grid(True, alpha=.3)
            fig.tight_layout()
            safe_ds = ds.replace('/', '_')
            fig.savefig(
                os.path.join(outdir, f'{prefix}_{split}_{safe_ds}.png'),
                dpi=100)
            plt.close(fig)
