"""Training orchestration: train_valid + the test protocol.

Reference analog: utils_trainer.train_valid:276 — step-0 bicubic-baseline
validation, per-step deterministic keys, mid-epoch validation every
checkpoint_eval (int iters or float fraction of an epoch), checkpoint
save + GC + tracker pickle, best-model selection per validation ds,
periodic test-on-best every test_epoch_freq, tracker plots every
plot_epoch_freq, ELB t update per epoch, final test with the bicubic
Interpolate baseline under '<ds>_bicubic' (evaluate:1184).
"""
import os
import time
from typing import Dict, List, Optional

import numpy as np
import yaml
import jax
import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.data import pipeline as P
from srcaco2_tpu.data.dataset import SRDataset, load_dataset, SEP
from srcaco2_tpu.losses.elb import update_t
from srcaco2_tpu.losses.master import build_loss
from srcaco2_tpu.models.registry import (apply_init, count_params,
                                         define_g, init_params,
                                         init_variables)
from srcaco2_tpu.config.net_defaults import safe_str_var
from srcaco2_tpu.train import checkpoint as CKPT
from srcaco2_tpu.train.evaluator import (fast_eval, log_perf,
                                         make_interpolate_forward)
from srcaco2_tpu.train.schedule import build_optimizer
from srcaco2_tpu.train.state import TrainState
from srcaco2_tpu.train.steps import make_eval_forward, make_train_step
from srcaco2_tpu.utils import tracker as T
from srcaco2_tpu.utils.logger import DLLogger, fmsg


def _freq_to_iters(v, steps_per_epoch: int) -> int:
    """int = iterations; float in ]0,1] = fraction of an epoch
    (utils_trainer.py:330-352)."""
    if isinstance(v, float) and 0 < v <= 1.0:
        return max(1, int(round(v * steps_per_epoch)))
    return int(v)


def choose_superstep(k: int, rate_k: float, rate_1: float,
                     margin: float = 1.05) -> int:
    """Superstep-under-mesh decision rule: keep the configured K
    unless per-step dispatch (K=1) measures faster by more than the
    hysteresis margin (timing noise must not flip a proven default).
    Pure so the policy is unit-testable (tests/test_parallel.py)."""
    if rate_1 > margin * rate_k:
        return 1
    return k


def _summary_entry(perf: Dict) -> Dict:
    """Flatten one fast_eval perf dict into the evaluate_test summary
    row (shared by the trained-model and bicubic co-eval entries)."""
    row = {'psnr': float(perf['full']['psnr']),
           'ssim': float(perf['full']['ssim']),
           'nrmse': float(perf['full']['nrmse']),
           'n': int(perf['n']), 'time': float(perf['time'])}
    if 'roi' in perf:
        row['roi_psnr'] = float(perf['roi']['psnr'])
        row['roi_ssim'] = float(perf['roi']['ssim'])
    return row


class Experiment:
    """Builds and holds all training components for one experiment."""

    def __init__(self, args: dict):
        self.args = args
        self.exp_dir = args['abs_fd_exp'] or os.getcwd()
        nt = args['netG']['net_type']
        self.net_type = nt

        # datasets ---------------------------------------------------
        tr_names = [s for s in str(args['train_dsets']).split(SEP) if s]
        self.train_sets: List[SRDataset] = [
            load_dataset(args, n, constants.TRAIN_PHASE,
                         frac=float(args.get('train_n', 1.0)))
            for n in tr_names]
        assert self.train_sets, 'no train dataset'
        # concatenate multiple train datasets into one packed stack
        if len(self.train_sets) == 1:
            self.train_ds = self.train_sets[0]
        else:
            d0 = self.train_sets[0]
            self.train_ds = SRDataset(
                name='+'.join(tr_names), phase=constants.TRAIN_PHASE,
                scale=d0.scale, n_channels=d0.n_channels,
                hr=np.concatenate([d.hr for d in self.train_sets]),
                lr=np.concatenate([d.lr for d in self.train_sets]),
                ids=sum([d.ids for d in self.train_sets], []),
                h_paths=sum([d.h_paths for d in self.train_sets], []),
                l_paths=sum([d.l_paths for d in self.train_sets], []),
                lr_is_real=d0.lr_is_real)
        self.train_ds.stage()

        n_val = int(args.get('valid_n_samples', -1))
        self.valid_sets = [
            load_dataset(args, n, constants.EVAL_PHASE, n=n_val).stage()
            for n in str(args['valid_dsets']).split(SEP) if n]
        self.test_sets = [
            load_dataset(args, n, constants.EVAL_PHASE)
            for n in str(args['test_dsets']).split(SEP) if n]

        # model + loss + optimizer ------------------------------------
        if args.get('task') == constants.RECONSTRUCT:
            # reconstruct = scale-1 (blurred LR -> LR); the net must not
            # upscale, and crops live on the LR grid (dataset.py maps
            # the pairs accordingly).
            snt0 = safe_str_var(nt)
            if f'{snt0}_upscale' in args['netG']:
                args['netG'][f'{snt0}_upscale'] = 1
        self.model = define_g(args)
        self.master = build_loss(args)
        self.tx = build_optimizer(args['train'])
        self.pipe_cfg = P.from_args(args)
        if args.get('task') == constants.RECONSTRUCT:
            from dataclasses import replace as _dc_replace
            self.pipe_cfg = _dc_replace(
                self.pipe_cfg, scale=1,
                h_size=args['h_size'] // args['scale'])

        bs = int(args['batch_size'])
        self.batch_size = bs
        self.steps_per_epoch = max(1, len(self.train_ds) // bs)

        key = jax.random.key(int(args.get('myseed', 0)))
        self.root_key = key
        in_hw = self.pipe_cfg.h_size \
            if nt in constants.PRE_UPSAMPLED_INPUT_NETS \
            else self.pipe_cfg.l_size
        sample = jnp.zeros((1, args['n_channels'], in_hw, in_hw),
                           jnp.float32)
        params, model_state = init_variables(self.model, key, sample)
        snt = safe_str_var(nt)
        scheme = args['netG'].get(f'{snt}_init_type',
                                  constants.INIT_W_DEFAULT)
        gain = float(args['netG'].get(f'{snt}_init_gain', 1.0))
        params = apply_init(params, scheme, gain,
                            jax.random.fold_in(key, 7))
        # warm-start from pretrained weights (netG.init_pretrained_path;
        # non-strict when G_param_strict is False — model_base.py:183).
        pre = args['netG'].get('init_pretrained_path', '')
        if pre:
            if bool(args['train'].get('G_param_strict', True)):
                params = CKPT.load_params(pre, params)
            else:
                params = CKPT.load_params_nonstrict(pre, params)
            DLLogger.log(f'loaded pretrained weights from {pre}')
        DLLogger.log(f'netG {nt}: {count_params(params):,} params')

        e_decay = float(args['train'].get('E_decay', 0.0) or 0.0)
        self.e_decay = e_decay
        self.eval_netE = e_decay > 0 and bool(
            args['train'].get('eval_netE', False))
        self.state = TrainState.create(
            params, self.tx, e_decay,
            elb_init_t=float(args.get('elb_init_t', 1.0)),
            model_state=model_state or None)

        # EDT-cap sanity (silent-degradation guard): the device EDT is
        # a chamfer approximation capped at 48 (data/sampling.edt_device);
        # check the staged data's true interior depth once on host and
        # warn when the cap binds (PARITY.md 'known deviations').
        if self.pipe_cfg.sample_tr_patch in (constants.SAMPLE_EDT,
                                             constants.SAMPLE_EDTXROI):
            from srcaco2_tpu.data.sampling import edt_map, roi_mask
            import numpy as _np
            hr0 = _np.asarray(self.train_ds.hr[0])[..., 0] \
                if self.train_ds.hr[0].ndim == 3 \
                else _np.asarray(self.train_ds.hr[0])
            depth = float(edt_map(roi_mask(
                hr0, self.pipe_cfg.th_style,
                self.pipe_cfg.th_fix)).max())
            if depth > 48:
                DLLogger.log(
                    f'[warn] EDT sampling: true interior depth '
                    f'{depth:.0f}px exceeds the device chamfer cap '
                    f'(48); deepest-interior pixels share the max '
                    f'weight (sampling slightly flattened there)')

        self.ppiw_table = None
        if args.get('ppiw', False):
            self.ppiw_table = jnp.asarray(P.per_color_weights(
                self.train_ds.hr,
                float(args.get('ppiw_min_per_col_w', 0.001))))

        self.mesh = None
        if args.get('distributed', False):
            from srcaco2_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh(args)
            dsize = self.mesh.shape[constants.DATA_AXIS]
            assert bs % dsize == 0, \
                f'batch_size {bs} not divisible by data axis {dsize}'
            DLLogger.log(f'mesh: {dict(self.mesh.shape)}')
            # multi-host: re-stage the packed splits as GLOBAL
            # replicated arrays over the full mesh (dataset.stage uses
            # make_array_from_process_local_data across processes).
            from srcaco2_tpu.parallel.mesh import replicated
            rep = replicated(self.mesh)
            self.train_ds.stage(rep)
            for _ds in self.valid_sets + getattr(self, 'test_sets', []):
                _ds.stage(rep)
        # superstep (steps.py make_train_step): scan K optimizer
        # updates per dispatch — dispatch-bound small models gain up
        # to the full dispatch overhead back. Works under a mesh too
        # (round 4): the scan body shards per step, so the gradient
        # all-reduce still happens every optimizer update.
        self.steps_per_call = max(
            1, int(args['train'].get('train_steps_per_call', 1) or 1))
        self.train_step = make_train_step(
            self.model, self.master, self.tx, nt, self.pipe_cfg,
            e_decay=e_decay, steps_per_epoch=self.steps_per_epoch,
            ppiw_table=self.ppiw_table, mesh=self.mesh,
            netG=args['netG'], steps_per_call=self.steps_per_call)
        # amp vs amp_eval (reference: separate train/eval autocast
        # flags): when training in bf16 but amp_eval is False, evaluate
        # with an f32-compute twin of the same params.
        eval_model = self.model
        if args.get('amp', False) and not args.get('amp_eval', False):
            a2 = dict(args)
            a2['amp'] = False
            eval_model = define_g(a2)
        self.eval_model = eval_model
        _fwd_raw = make_eval_forward(
            eval_model, nt, int(args['scale']), netG=args['netG'],
            test_mode=int(args.get('test_mode', 0) or 0))
        # bind the live model_state (BN running stats) — stateless
        # models pass None and the jit signature is unchanged.
        self.forward = lambda p, b: _fwd_raw(p, b,
                                             self.state.model_state)
        if self.mesh is not None and \
                int(args['eval_bsize']) % \
                self.mesh.shape[constants.DATA_AXIS] == 0:
            # shard full-image eval batches over the data axis too
            # (requires eval_bsize divisible by the data axis; smaller
            # eval batches fall back to the replicated forward).
            from srcaco2_tpu.parallel.mesh import shard_eval_forward
            from srcaco2_tpu.train.steps import net_input
            model = eval_model
            netG = args['netG']

            def _fwd(params, batch):
                x = net_input(nt, batch, netG)
                out = model.apply({'params': params}, x,
                                  train=False)['out']
                return jnp.clip(
                    jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0),
                    0.0, 255.0)

            self.forward = shard_eval_forward(_fwd, self.mesh)
        elif self.mesh is not None:
            DLLogger.log(
                f"[warn] eval_bsize {args['eval_bsize']} not divisible "
                f"by the data axis "
                f"{self.mesh.shape[constants.DATA_AXIS]}: full-image "
                f"eval falls back to a REPLICATED single-device "
                f"forward (no eval sharding)")
        self.interp_forward = make_interpolate_forward(
            int(self.pipe_cfg.scale),
            args.get('basic_interpolation', constants.INTER_BICUBIC))

        # tracker ------------------------------------------------------
        eval_names = [d.name for d in self.valid_sets] + \
            [d.name for d in self.test_sets] + \
            [d.name + '_bicubic' for d in self.test_sets]
        self.tracker = T.find_last_tracker(self.exp_dir) or \
            T.init_tracker(self.master.names, eval_names)
        self.roi_tracker = T.find_last_tracker(
            self.exp_dir, 'roi_tracker.pkl') or \
            T.init_tracker(self.master.names, eval_names)

    # ------------------------------------------------------------ helpers
    def eval_params(self):
        """Weights used for validation / model selection / test: netE
        (EMA) when train.eval_netE and E_decay > 0, else netG. The
        reference keeps netE checkpointed but always tests netG
        (model_plain.py:398); eval_netE opts onto the EMA weights."""
        if self.eval_netE and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def resume(self) -> int:
        self.state, step = CKPT.load_checkpoint(
            self.exp_dir, self.state,
            load_optimizer=bool(
                self.args['train'].get('G_optimizer_reuse', True)))
        if step:
            DLLogger.log(fmsg(f'Resumed from iteration {step}'))
        return step

    def _validate(self, step: int) -> None:
        args = self.args
        multi = len(self.valid_sets) > 1
        for ds in self.valid_sets:
            img_dir = os.path.join(self.exp_dir, args['save_dir_imgs'],
                                   constants.VALIDSET, ds.name)
            os.makedirs(img_dir, exist_ok=True)
            perf = fast_eval(self.forward, self.eval_params(), ds, args,
                             int(args['eval_bsize']), constants.VALIDSET,
                             save_img_dir=img_dir, current_step=step,
                             track_evolution_img=True)
            log_perf(f'valid/{ds.name}@{step}', perf)
            is_best = T.update_tracker_eval(
                self.tracker, constants.VALIDSET, ds.name, perf['full'],
                step, args['model_select_mtr'])
            if 'roi' in perf:
                roi_best = T.update_tracker_eval(
                    self.roi_tracker, constants.VALIDSET, ds.name,
                    perf['roi'], step, args['model_select_mtr'])
                if args.get('eval_over_roi_also_model_select', False):
                    is_best = roi_best
            if is_best and args.get('is_master', True):
                CKPT.save_best(self.exp_dir, self.eval_params(),
                               ds.name if multi else None)
                safe = ds.name.replace('/', '_')
                bd = os.path.join(self.exp_dir, 'best-models')
                with open(os.path.join(bd, f'details_{safe}.yml'),
                          'w') as f:
                    yaml.safe_dump(perf['details'], f)
                # summary perf yaml next to the details (reference:
                # _validate saves per-ds perf yaml, utils_trainer:246).
                summary = {'step': int(step), 'full': perf['full']}
                if 'roi' in perf:
                    summary['roi'] = perf['roi']
                with open(os.path.join(bd, f'summary_{safe}.yaml'),
                          'w') as f:
                    yaml.safe_dump(summary, f)
                DLLogger.log(f'[best] new best on {ds.name} @ {step}')

    def evaluate_test(self, step: int, use_best: bool = True):
        """Test protocol (utils_trainer.evaluate:1184): per test ds, load
        the best model (per matching valid ds when multi-valid), evaluate,
        plus the bicubic baseline under <ds>_bicubic. Returns
        {ds_name: {'psnr', 'ssim', 'n', 'time'}} (trained model)."""
        args = self.args
        multi = len(self.valid_sets) > 1
        summary = {}
        for ds in self.test_sets:
            if ds.hr_dev is None:
                ds.stage()
            params = self.eval_params()
            if use_best:
                try:
                    vds = None
                    if multi:
                        vds = ds.name.replace('test', 'val')
                    params = CKPT.load_best(self.exp_dir,
                                            self.state.params, vds)
                except Exception as e:
                    DLLogger.log(f'[test] no best model yet '
                                 f'({e}); using current weights')
            img_dir = os.path.join(self.exp_dir, args['save_dir_imgs'],
                                   constants.TESTSET, ds.name)
            os.makedirs(img_dir, exist_ok=True)
            perf = fast_eval(self.forward, params, ds, args,
                             int(args['eval_bsize']), constants.TESTSET,
                             save_img_dir=img_dir, current_step=step)
            log_perf(f'test/{ds.name}@{step}', perf)
            summary[ds.name] = _summary_entry(perf)
            if args.get('is_master', True):
                # per-image metric dump for offline verification
                # (reference: details_*.yml, utils_trainer.py:253).
                dd = os.path.join(self.exp_dir, 'best-models')
                os.makedirs(dd, exist_ok=True)
                with open(os.path.join(
                        dd, f'details_test_{ds.name}.yml'.replace(
                            '/', '_')), 'w') as f:
                    yaml.safe_dump(perf['details'], f)
                if 'roi_details' in perf:
                    with open(os.path.join(
                            dd, f'details_test_roi_{ds.name}.yml'
                            .replace('/', '_')), 'w') as f:
                        yaml.safe_dump(perf['roi_details'], f)
            T.update_tracker_eval(self.tracker, constants.TESTSET,
                                  ds.name, perf['full'], step,
                                  args['model_select_mtr'])
            if 'roi' in perf:
                T.update_tracker_eval(self.roi_tracker, constants.TESTSET,
                                      ds.name, perf['roi'], step,
                                      args['model_select_mtr'])
            # bicubic floor
            bperf = fast_eval(self.interp_forward, None, ds, args,
                              int(args['eval_bsize']), constants.TESTSET)
            log_perf(f'test/{ds.name}_bicubic@{step}', bperf)
            summary[ds.name + '_bicubic'] = _summary_entry(bperf)
            T.update_tracker_eval(self.tracker, constants.TESTSET,
                                  ds.name + '_bicubic', bperf['full'],
                                  step, args['model_select_mtr'])
            if 'roi' in bperf:
                T.update_tracker_eval(self.roi_tracker, constants.TESTSET,
                                      ds.name + '_bicubic', bperf['roi'],
                                      step, args['model_select_mtr'])
        return summary

    # ---------------------------------------------- superstep probe
    def _probe_superstep(self, hr_dev, lr_dev, key, n_train) -> None:
        """Time K=steps_per_call vs K=1 under the mesh on the real
        staged data and keep the faster dispatch (>5% hysteresis
        toward the configured K). Runs on COPIES of the train state,
        so the training trajectory is bit-identical with the probe on
        or off; costs one extra executable compile (the K=1 step)."""
        args = self.args
        k = self.steps_per_call
        bs = self.batch_size
        fn1 = make_train_step(
            self.model, self.master, self.tx, self.net_type,
            self.pipe_cfg, e_decay=self.e_decay,
            steps_per_epoch=self.steps_per_epoch,
            ppiw_table=self.ppiw_table, mesh=self.mesh,
            netG=args['netG'], steps_per_call=1)

        def fresh_state():
            return jax.tree_util.tree_map(
                lambda x: jnp.copy(x) if isinstance(x, jax.Array)
                else x, self.state)

        def rate(fn, kk, calls):
            idxs = (jnp.arange(kk * bs, dtype=jnp.int32) % n_train)
            idxs = idxs.reshape(kk, bs) if kk > 1 else idxs
            st = fresh_state()
            st, holder, _ = fn(st, hr_dev, lr_dev, idxs, key)
            jax.block_until_ready(holder)          # compile + warmup
            t0 = time.perf_counter()
            for _ in range(calls):
                st, holder, _ = fn(st, hr_dev, lr_dev, idxs, key)
            jax.block_until_ready(holder)
            return calls * kk * bs / (time.perf_counter() - t0)

        calls_k = 3
        rate_k = rate(self.train_step, k, calls_k)
        rate_1 = rate(fn1, 1, calls_k * k)
        chosen = choose_superstep(k, rate_k, rate_1)
        DLLogger.log(
            f'superstep probe (mesh '
            f'{dict(self.mesh.shape)}): K={k} '
            f'{rate_k:.1f} patches/s vs K=1 {rate_1:.1f} patches/s '
            f'-> K={chosen}')
        if chosen == 1:
            self.steps_per_call = 1
            self.train_step = fn1

    # ------------------------------------------------------------- train
    def train_valid(self):
        args = self.args
        t_start = time.perf_counter()
        start_step = self.resume()
        spe = self.steps_per_epoch
        max_epochs = int(args['max_epochs'])
        total_steps = max_epochs * spe
        n_check_eval = _freq_to_iters(args['train']['checkpoint_eval'],
                                      spe)
        n_check_save = _freq_to_iters(args['train']['checkpoint_save'],
                                      spe)
        test_epoch_freq = int(args['train'].get('test_epoch_freq', 0))
        plot_epoch_freq = int(args['train'].get('plot_epoch_freq', 0))

        # step-0 bicubic baseline validation (utils_trainer.py:292)
        if start_step == 0:
            DLLogger.log(fmsg('step-0 bicubic-baseline validation'))
            for ds in self.valid_sets:
                perf = fast_eval(self.interp_forward, None, ds, args,
                                 int(args['eval_bsize']),
                                 constants.VALIDSET)
                log_perf(f'valid/{ds.name}_bicubic@0', perf)

        hr_dev = self.train_ds.hr_dev
        lr_dev = self.train_ds.lr_dev
        n_train = len(self.train_ds)
        step = start_step
        key = self.root_key
        state = self.state
        epoch_losses: Dict[str, list] = {}
        last_epoch = step // spe

        # measured superstep-under-mesh policy (train_superstep_probe):
        # the single-chip superstep win is proven, but under a mesh the
        # dispatch/collective tradeoff is hardware-dependent (the
        # virtual-CPU mesh measures K>1 SLOWER at every width,
        # MULTICHIP_r04) — so measure, don't assume.
        if (self.mesh is not None and self.steps_per_call > 1
                and bool(args['train'].get('train_superstep_probe',
                                           True))
                and spe >= self.steps_per_call
                and total_steps - start_step
                >= 50 * self.steps_per_call):
            self._probe_superstep(hr_dev, lr_dev, key, n_train)

        DLLogger.log(fmsg(
            f'training {self.net_type}: {n_train} samples, '
            f'{spe} steps/epoch, {max_epochs} epochs'))

        # pending per-step failure flags (device scalars), drained in
        # ONE stacked host transfer every `failure_surface_lag` steps
        # and at every eval/checkpoint boundary: a blocking scalar
        # read per step costs a full round-trip through a remote TPU
        # tunnel and serializes the dispatch pipeline. Lag 1 restores
        # reference-exact per-step surfacing (tools.py:55 exits every
        # step; here a skipped update logs <= lag steps late and
        # corruption still hard-stops the run).
        flag_lag = max(1, int(args['train'].get(
            'failure_surface_lag', 32) or 1))
        pending_flags = []   # [(first step, flags dev scalar or (k,))]
        pending_n = [0]      # steps covered by pending_flags

        def drain_flags():
            if not pending_flags:
                return
            entries = list(pending_flags)
            pending_flags.clear()
            pending_n[0] = 0
            devs_ = [jnp.ravel(jnp.atleast_1d(d)) for _, d in entries]
            vals = np.asarray(jnp.concatenate(devs_)
                              if len(devs_) > 1 else devs_[0])
            vals = vals.astype(np.int64)
            off = 0
            for (s0_, _), d_ in zip(entries, devs_):
                for j_ in range(int(d_.shape[0])):
                    v_ = vals[off + j_]
                    if v_ & 1:
                        DLLogger.log(f'[warn] step {s0_ + j_}: '
                                     f'non-finite loss/grads — '
                                     f'update skipped')
                    if v_ & 2:
                        raise RuntimeError(
                            f'step {s0_ + j_}: corrupted parameters '
                            f'or predictions (non-finite) — stopping '
                            f'(reference check_corruption semantics)')
                off += int(d_.shape[0])

        spc = self.steps_per_call
        # periodic weight regularizers (model_plain.py:365-387).
        orthstep = int(args['train'].get('G_regularizer_orthstep',
                                         0) or 0)
        clipstep = int(args['train'].get('G_regularizer_clipstep',
                                         0) or 0)
        while step < total_steps:
            epoch = step // spe
            # per-epoch permutation (DistributedSampler analog)
            if step == start_step or step % spe == 0:
                # one permutation per epoch (DistributedSampler analog)
                perm = P.epoch_indices(key, n_train, jnp.int32(epoch))
            i_in_epoch = step % spe
            # chunk size: up to steps_per_call, never crossing an
            # epoch / eval / save / regularizer / end boundary so
            # every periodic host action still lands on its exact step.
            k = min(spc, spe - i_in_epoch, total_steps - step)
            for per in (n_check_eval, n_check_save, orthstep, clipstep):
                if per:
                    k = min(k, per - step % per)
            if spc > 1:
                idxs = jax.lax.dynamic_slice_in_dim(
                    perm, i_in_epoch * self.batch_size,
                    k * self.batch_size).reshape(k, self.batch_size)
            else:
                idxs = jax.lax.dynamic_slice_in_dim(
                    perm, i_in_epoch * self.batch_size, self.batch_size)
            state, holder, ok = self.train_step(state, hr_dev, lr_dev,
                                                idxs, key)
            step += k

            pending_flags.append((step - k, holder['_flags']))
            pending_n[0] += k
            if pending_n[0] >= flag_lag:
                drain_flags()
            if orthstep > 0 and step % orthstep == 0:
                from srcaco2_tpu.train.regularizers import \
                    regularizer_orth
                state = state.replace(
                    params=regularizer_orth(state.params))
            if clipstep > 0 and step % clipstep == 0:
                from srcaco2_tpu.train.regularizers import \
                    regularizer_clip
                state = state.replace(
                    params=regularizer_clip(state.params))

            for name, v in holder.items():
                if not name.startswith('_'):
                    epoch_losses.setdefault(name, []).append(v)

            if step % n_check_eval == 0:
                drain_flags()          # surface failures before eval
                self.state = state
                self._validate(step)
            if step % n_check_save == 0 and args.get('is_master', True):
                drain_flags()          # never checkpoint corrupt state
                self.state = state
                CKPT.save_checkpoint(self.exp_dir, state)
                CKPT.gc_checkpoints(self.exp_dir, int(state.step))
                T.save_tracker(self.tracker, self.exp_dir)
                T.save_tracker(self.roi_tracker, self.exp_dir,
                               'roi_tracker.pkl')

            new_epoch = step // spe
            if new_epoch != last_epoch:
                # epoch boundary: aggregate losses, ELB t, periodic
                # jobs. Losses were kept as device scalars during the
                # epoch — fetch them in ONE stacked transfer (per-value
                # float() costs a tunnel round-trip each).
                names_ = list(epoch_losses)
                flat_ = [jnp.ravel(jnp.atleast_1d(v)) for n in names_
                         for v in epoch_losses[n]]
                vals_ = np.asarray(jnp.concatenate(flat_)
                                   if len(flat_) > 1 else flat_[0]) \
                    if flat_ else np.zeros((0,))
                per_iter, off_ = {}, 0
                for n in names_:
                    k_ = sum(int(np.prod(np.shape(v)) or 1)
                             for v in epoch_losses[n])
                    per_iter[n] = [float(v) for v in
                                   vals_[off_:off_ + k_]]
                    off_ += k_
                for n, vs in per_iter.items():
                    self.tracker['train'][T.PERIOD_ITER].setdefault(
                        n, []).extend(vs)
                agg = {n: float(np.mean(vs))
                       for n, vs in per_iter.items()}
                T.update_tracker_train(self.tracker, T.PERIOD_EPOCH, agg)
                loss_line = ' '.join(f'{n}={v:.6f}'
                                     for n, v in agg.items())
                DLLogger.log(f'[epoch {last_epoch}] {loss_line} '
                             f'({time.perf_counter() - t_start:.1f}s '
                             f'elapsed)')
                epoch_losses = {}
                state = state.replace(elb_t=update_t(
                    state.elb_t, self.master.elb_mulcoef,
                    self.master.elb_max_t))
                if test_epoch_freq and new_epoch % test_epoch_freq == 0:
                    self.state = state
                    self.evaluate_test(step)
                if plot_epoch_freq and new_epoch % plot_epoch_freq == 0 \
                        and args.get('is_master', True):
                    T.plot_tracker(self.tracker, self.exp_dir)
                # preemptible-cluster mirror (reference: CC scratch sync,
                # utils_trainer.py:473).
                sync_freq = int(args['train'].get(
                    'synch_scratch_epoch_freq', 0) or 0)
                if sync_freq and new_epoch % sync_freq == 0:
                    from srcaco2_tpu.utils.cluster import (
                        is_cluster, sync_exp_to_durable)
                    if is_cluster() and args.get('scratch_root'):
                        sync_exp_to_durable(self.exp_dir,
                                            args['scratch_root'])
                last_epoch = new_epoch

        # drain the remaining lagged failure checks
        drain_flags()

        # final: save, validate, test, plots ---------------------------
        self.state = state
        if args.get('is_master', True):
            CKPT.save_checkpoint(self.exp_dir, state)
            CKPT.gc_checkpoints(self.exp_dir, int(state.step))
        self._validate(step)
        # SRCACO2_FAST_SWEEP=1 (scripts/sweep_seed.py --fast): the
        # 162-experiment sweep re-runs the test eval in eval_all.py and
        # never looks at per-experiment dashboards, so the final
        # test-on-best + matplotlib renders (~10-15 s/exp on this
        # 1-core host = ~30 min across the grid) are pure overhead
        # there. Normal runs keep the reference-parity final sequence.
        fast_sweep = os.environ.get('SRCACO2_FAST_SWEEP') == '1'
        if not fast_sweep:
            self.evaluate_test(step, use_best=True)
        if args.get('is_master', True):
            T.save_tracker(self.tracker, self.exp_dir)
            T.save_tracker(self.roi_tracker, self.exp_dir,
                           'roi_tracker.pkl')
        if args.get('is_master', True) and not fast_sweep:
            T.plot_tracker(self.tracker, self.exp_dir)
            if args.get('eval_over_roi_also', False):
                T.plot_tracker(self.roi_tracker, self.exp_dir,
                               prefix='roi_tracker')
            # reference-style multi-panel dashboards (one grid per
            # split: rows=datasets, cols=metrics, roi overlay + best
            # markers — utils_tracker.py:344-530)
            for _split in (constants.VALIDSET, constants.TESTSET):
                T.plot_tracker_dashboard(
                    self.tracker, self.roi_tracker, _split,
                    os.path.join(self.exp_dir,
                                 f'dashboard_{_split}.png'),
                    roi_select=bool(args.get(
                        'eval_over_roi_also_model_select', False)))
        if args.get('is_master', True):
            total_t = time.perf_counter() - t_start
            with open(os.path.join(self.exp_dir, 'passed.txt'), 'w') as f:
                f.write(f'done in {total_t:.1f}s\n')
            with open(os.path.join(self.exp_dir, 'LOG.txt'), 'a') as f:
                f.write(f'{self.net_type} x{args["scale"]} '
                        f'steps={step} time={total_t:.1f}s\n')
            DLLogger.log(fmsg(f'training done in {total_t:.1f}s'))
