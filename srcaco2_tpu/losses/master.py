"""Composable loss system: MasterLoss over elementary terms.

Reference analogs: loss/master.py:19 (MasterLoss summing ElementaryLoss
terms, per-term `l_holder`/`n_holder` logging), loss/core.py:17
(lambda_, epoch-window is_on, ELB wrapper, use_residuals switch pulling
model.global_residual / y_target - model.x_interp), and
utils_instance.define_loss:23 (flag -> term construction).

Functional redesign: build_loss(args) returns a MasterLoss whose __call__
is pure and jittable: (outputs, batch, params, epoch, elb_t) ->
(total, {name: value}). Epoch-window activation uses jnp.where so terms
can switch on/off without retracing.
"""
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.losses import ops as L
from srcaco2_tpu.losses.elb import elb


@dataclass(frozen=True)
class Term:
    name: str
    lam: float
    fn: Callable     # (pred, target, ctx) -> scalar (unscaled)
    use_residuals: bool = False
    start_epoch: Optional[int] = None
    end_epoch: Optional[int] = None

    def is_on(self, epoch):
        on = jnp.ones((), bool)
        if self.start_epoch is not None:
            on &= epoch >= self.start_epoch
        if self.end_epoch is not None:
            on &= epoch <= self.end_epoch
        return on


@dataclass
class MasterLoss:
    terms: List[Term]
    elb_init_t: float = 1.0
    elb_max_t: float = 10.0
    elb_mulcoef: float = 1.01

    @property
    def names(self) -> List[str]:
        return [t.name for t in self.terms] + ['total']

    def __call__(self, outputs: Dict, batch: Dict, params=None,
                 epoch=0, elb_t=1.0) -> Tuple[jnp.ndarray, Dict]:
        pred = outputs['out']
        target = batch['h_im']
        ctx = {
            'elb_t': elb_t,
            'params': params,
            'weights': batch.get('h_per_pixel_weight'),
            'outputs': outputs,
            'batch': batch,
        }
        total = jnp.zeros((), jnp.float32)
        holder = {}
        for t in self.terms:
            if t.use_residuals:
                assert 'global_residual' in outputs, \
                    f'{t.name}: model exposes no residuals'
                p = outputs['global_residual']
                y = target - outputs['x_interp']
            else:
                p, y = pred, target
            val = t.lam * t.fn(p, y, ctx)
            val = jnp.where(t.is_on(epoch), val, 0.0)
            holder[t.name] = val
            total = total + val
        holder['total'] = total
        return total, holder


# ------------------------------------------------------------ term bodies
def _weighted_mean(err, w):
    if w is None:
        return err.mean()
    return (err * w).mean()


def _l1(p, y, ctx):
    return _weighted_mean(jnp.abs(p - y), ctx['weights'])


def _l2(p, y, ctx):
    return ((p - y) ** 2).mean()


def _l2sum(p, y, ctx):
    return ((p - y) ** 2).sum()


def _charbonnier(eps):
    def f(p, y, ctx):
        d = y - p
        return jnp.sqrt(d * d + eps).mean()
    return f


def _neg_ssim(window_size):
    def f(p, y, ctx):
        return -L.ssim_train(p, y, window_size).mean()
    return f


def _boundpred(eps, restore_range, color_max):
    def f(p, y, ctx):
        b = p.shape[0]
        yh = p.reshape(b, -1)
        yy = y.reshape(b, -1)
        if restore_range:
            yh = yh * color_max
            yy = yy * color_max
        right = yh - (yy + eps)
        left = yy - eps - yh
        t = ctx['elb_t']
        return (elb(right, t) + elb(left, t)) / 2.0
    return f


def _local_moments(kszs):
    def f(p, y, ctx):
        loss = 0.0
        filter_smooth = None
        for i, k in enumerate(kszs):
            sm, sv = L.patch_moments(p, k)
            tm, tv = L.patch_moments(y, k)
            if i == 0:
                filter_smooth = (tv == 0).astype(jnp.float32)
            kl = L.kl_2_gaussians(sm, sv, tm, tv)
            loss = loss + (kl * filter_smooth).mean()
        return loss
    return f


def _deriv_loss(op, norm_str, norm_of_vec=False):
    def f(p, y, ctx):
        trg = jax.lax.stop_gradient(op(y))
        prd = op(p)
        if norm_of_vec:
            trg = jnp.linalg.norm(trg, axis=1, keepdims=True)
            prd = jnp.linalg.norm(prd, axis=1, keepdims=True)
        d = prd - trg
        if norm_str == constants.NORM1:
            return jnp.abs(d).mean()
        return (d * d).mean()
    return f


def _hist(norm_str, sigma, nbins):
    def f(p, y, ctx):
        b = p.shape[0]
        trg = jax.lax.stop_gradient(
            L.soft_histogram(y.reshape(b, -1), nbins, 0.0, 1.0, sigma))
        trg = trg + 1.0
        trg = trg / trg.sum(-1, keepdims=True)
        prd = L.soft_histogram(p.reshape(b, -1), nbins, 0.0, 1.0, sigma)
        prd = prd + 1.0
        prd = prd / prd.sum(-1, keepdims=True)
        if norm_str == constants.KL:
            return (trg * (jnp.log(trg) - jnp.log(prd))).sum(-1).mean()
        if norm_str == constants.BH:
            return elb(-L.bhattacharyya(prd, trg), ctx['elb_t'])
        if norm_str == constants.NORM1:
            return jnp.abs(prd - trg).mean()
        return ((prd - trg) ** 2).mean()
    return f


def _kde(norm_str, bw, nbins):
    def f(p, y, ctx):
        eps = 1e-4
        trg = jax.lax.stop_gradient(L.gaussian_kde(y, nbins, bw)) + eps
        prd = L.gaussian_kde(p, nbins, bw) + eps
        if norm_str == constants.BH:
            return elb(-L.bhattacharyya(prd, trg), ctx['elb_t'])
        if norm_str == constants.NORM1:
            return jnp.abs(prd - trg).mean() / prd.shape[1]
        return ((prd - trg) ** 2).mean() / prd.shape[1]
    return f


def _ce(color_max):
    def f(p, y, ctx):
        logits = ctx['outputs']['raw_segmentation']  # (B, nclasses, H, W)
        labels = jnp.round(y[:, 0] * color_max).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)
        return nll.mean()
    return f


def _w_sparsity(p, y, ctx):
    total = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(ctx['params']):
        total = total + jnp.abs(leaf).sum()
    return total


def build_loss(args: dict) -> MasterLoss:
    """Flag-driven term construction (define_loss parity)."""
    terms: List[Term] = []
    a = args

    def res(key):
        return bool(a.get(f'{key}_use_residuals', False))

    if a.get('l1'):
        terms.append(Term('l1', a['l1_lambda'], _l1, res('l1')))
    if a.get('l2'):
        terms.append(Term('l2', a['l2_lambda'], _l2, res('l2')))
    if a.get('l2sum'):
        terms.append(Term('l2sum', a['l2sum_lambda'], _l2sum,
                          res('l2sum')))
    if a.get('ssim'):
        terms.append(Term('ssim', a['ssim_lambda'],
                          _neg_ssim(int(a['ssim_window_s']))))
    if a.get('charbonnier'):
        terms.append(Term('charbonnier', a['charbonnier_lambda'],
                          _charbonnier(a['charbonnier_eps']),
                          res('charbonnier')))
    if a.get('boundpred'):
        terms.append(Term('boundpred', a['boundpred_lambda'],
                          _boundpred(a['boundpred_eps'],
                                     a['boundpred_restore_range'],
                                     float(a.get('color_max', 255))),
                          res('boundpred')))
    if a.get('local_moments'):
        kszs = sorted(int(k) for k in
                      str(a['local_moments_ksz']).split('_'))
        terms.append(Term('local_moments', a['local_moments_lambda'],
                          _local_moments(kszs), res('local_moments')))
    if a.get('img_grad'):
        terms.append(Term('img_grad', a['img_grad_lambda'],
                          _deriv_loss(L.image_gradient,
                                      a['img_grad_norm']),
                          res('img_grad')))
    if a.get('norm_img_grad'):
        terms.append(Term('norm_img_grad', a['norm_img_grad_lambda'],
                          _deriv_loss(L.image_gradient,
                                      a['norm_img_grad_type'], True),
                          res('norm_img_grad')))
    if a.get('laplace'):
        terms.append(Term('laplace', a['laplace_lambda'],
                          _deriv_loss(L.laplacian_filter,
                                      a['laplace_norm']),
                          res('laplace')))
    if a.get('norm_laplace'):
        terms.append(Term('norm_laplace', a['norm_laplace_lambda'],
                          _deriv_loss(L.laplacian_filter,
                                      a['norm_laplace_type'], True),
                          res('norm_laplace')))
    if a.get('loc_var'):
        op = lambda x: L.local_variation(x, int(a['loc_var_ksz']))
        terms.append(Term('loc_var', a['loc_var_lambda'],
                          _deriv_loss(op, a['loc_var_norm']),
                          res('loc_var')))
    if a.get('norm_loc_var'):
        op = lambda x: L.local_variation(x, int(a['norm_loc_var_ksz']))
        terms.append(Term('norm_loc_var', a['norm_loc_var_lambda'],
                          _deriv_loss(op, a['norm_loc_var_type'], True),
                          res('norm_loc_var')))
    if a.get('hist'):
        nbins = int(a.get('color_max', 255)) - int(a.get('color_min', 0)) \
            + 1
        terms.append(Term('hist', a['hist_lambda'],
                          _hist(a['hist_metric'], float(a['hist_sigma']),
                                nbins)))
    if a.get('kde'):
        terms.append(Term('kde', a['kde_lambda'],
                          _kde(a['kde_metric'], float(a['kde_kde_bw']),
                               int(a['kde_nbins']))))
    if a.get('ce'):
        terms.append(Term('ce', a['ce_lambda'],
                          _ce(float(a.get('color_max', 255)))))
    if a.get('w_sparsity'):
        terms.append(Term('w_sparsity', a['w_sparsity_lambda'],
                          _w_sparsity))

    assert terms, 'no loss term enabled (set at least one of l1/l2/...)'
    return MasterLoss(terms,
                      elb_init_t=float(a.get('elb_init_t', 1.0)),
                      elb_max_t=float(a.get('elb_max_t', 10.0)),
                      elb_mulcoef=float(a.get('elb_mulcoef', 1.01)))
