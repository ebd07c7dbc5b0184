"""Packed-array dataset staging for the device-resident pipeline.

The reference streams per-sample tif decodes through torch DataLoader
workers (dlib/datasets/dataset_dpsr.py:746). TPU-native redesign: decode
every image of a split ONCE on host into packed uint8 arrays, push them to
device HBM, and do all per-step work (LR synthesis, crop, augment,
normalize) inside the jitted step. A full caco2 split is ~2.6 GB uint8 —
it fits in HBM, and the per-step input cost becomes a few matmuls.

LR synthesis parity (dataset_dpsr.py:746-840):
  * img_h_to_l = torch-bicubic downscale of HR (no antialias), clamped,
    cast to uint8 by TRUNCATION (the reference's .astype(np.uint8));
  * caco2 + synthesize: add N(v, sigma^2) noise inside ROI=(v>=th), seeded
    per sample index, clamp, truncate to uint8 (simulate_low_res:713);
  * real-LR datasets read the LR tif instead;
  * reconstruct task: img_low_blurred = up2/down2 x2 MATLAB-bicubic chain
    of the LR (._reconstruct_blure_true_lr:645).
"""
import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.data import folds as F
from srcaco2_tpu.data import io as dio
from srcaco2_tpu.ops.resize import interpolate, imresize_matlab

SEP = '+'


def ds_dir(ds_name: str) -> str:
    """Dataset directory under data_root (reference: constants.DS_DIR)."""
    if ds_name.startswith('caco2'):
        return 'caco2'
    if ds_name.startswith('biosr'):
        return 'biosr'
    raise NotImplementedError(ds_name)


def is_caco2(path: str) -> bool:
    return 'caco2' in path.lower()


@dataclass
class SRDataset:
    """One split of one dataset, staged as packed arrays."""
    name: str
    phase: str                      # train | eval
    scale: int
    n_channels: int
    hr: np.ndarray                  # (N, H, W, C) uint8
    lr: np.ndarray                  # (N, h, w, C) uint8 (real or synthetic)
    ids: List[str]
    h_paths: List[str]
    l_paths: List[str]
    lr_is_real: bool = False
    # staged device copies (filled by stage())
    hr_dev: Optional[jax.Array] = field(default=None, repr=False)
    lr_dev: Optional[jax.Array] = field(default=None, repr=False)

    def __len__(self):
        return self.hr.shape[0]

    @property
    def h_size(self):
        return self.hr.shape[1]

    @property
    def l_size(self):
        return self.lr.shape[1]

    def stage(self, sharding=None):
        """Push packed arrays to device (replicated by default).

        Multi-host: with a sharding over a multi-process mesh, GLOBAL
        arrays are formed with jax.make_array_from_process_local_data
        (every process loads the full split, so a replicated sharding
        is satisfied by identical local copies) — a plain device_put of
        host-local arrays would not produce a global array
        (utils_parallel.py:36-66 analog; tested by the 2-process CPU
        run in tests/test_multihost.py)."""
        if sharding is None:
            self.hr_dev = jnp.asarray(self.hr)
            self.lr_dev = jnp.asarray(self.lr)
        elif jax.process_count() > 1:
            self.hr_dev = jax.make_array_from_process_local_data(
                sharding, self.hr)
            self.lr_dev = jax.make_array_from_process_local_data(
                sharding, self.lr)
        else:
            self.hr_dev = jax.device_put(self.hr, sharding)
            self.lr_dev = jax.device_put(self.lr, sharding)
        return self


def synth_lr_from_hr(hr_u8: np.ndarray, scale: int, seed: int,
                     inter_low_th: float, inter_low_sigma: float,
                     simulate_noise: bool, batch: int = 256) -> np.ndarray:
    """Synthesize the LR stack from HR on device, batched.

    Parity with interpolate_torch + simulate_low_res: bicubic downscale
    (no antialias), clamp [0,255], truncate to uint8; then per-sample-keyed
    Gaussian noise in ROI, clamp, truncate.
    """
    n, h, w, c = hr_u8.shape
    lh, lw = h // scale, w // scale
    root = jax.random.key(seed)

    @jax.jit
    def one_batch(x_u8, idxs):
        x = x_u8.astype(jnp.float32).transpose(0, 3, 1, 2)  # NCHW
        lo = interpolate(x, size=(lh, lw), mode='bicubic')
        lo = jnp.clip(lo, 0.0, 255.0)
        lo = jnp.floor(lo)  # uint8 truncation, as the reference casts
        if simulate_noise:
            def per_sample(img, idx):
                key = jax.random.fold_in(root, idx)
                roi = (img >= inter_low_th).astype(jnp.float32)
                noisy = img + inter_low_sigma * jax.random.normal(
                    key, img.shape, jnp.float32)
                noisy = jnp.clip(noisy, 0.0, 255.0)
                out = noisy * roi + (1.0 - roi) * img
                return jnp.floor(jnp.clip(out, 0.0, 255.0))
            lo = jax.vmap(per_sample)(lo, idxs)
        return lo.transpose(0, 2, 3, 1).astype(jnp.uint8)

    chunks = []
    for i in range(0, n, batch):
        x = jnp.asarray(hr_u8[i:i + batch])
        idxs = jnp.arange(i, min(i + batch, n))
        # pad last chunk to the batch size to avoid a recompile
        pad = 0
        if x.shape[0] < batch and i > 0:
            pad = batch - x.shape[0]
            x = jnp.concatenate([x, x[:pad]], 0)
            idxs = jnp.concatenate([idxs, idxs[:pad]], 0)
        out = np.asarray(one_batch(x, idxs))
        if pad:
            out = out[:-pad]
        chunks.append(out)
    return np.concatenate(chunks, 0)


def blur_true_lr(lr_u8: np.ndarray, batch: int = 256) -> np.ndarray:
    """Reconstruct-task blur chain: (up2, down2) x2 with MATLAB bicubic
    (reference: _reconstruct_blure_true_lr, dataset_dpsr.py:645).
    Returns float32 in [0,1]."""
    n = lr_u8.shape[0]

    @jax.jit
    def one(x_u8):
        x = x_u8.astype(jnp.float32).transpose(0, 3, 1, 2)
        for _ in range(2):
            x = imresize_matlab(x, 2.0)
            x = imresize_matlab(x, 0.5)
        return (x / 255.0).transpose(0, 2, 3, 1)

    outs = [np.asarray(one(jnp.asarray(lr_u8[i:i + batch])))
            for i in range(0, n, batch)]
    return np.concatenate(outs, 0)


def load_dataset(args, ds_name: str, phase: str, n: int = -1,
                 frac: float = 1.0) -> SRDataset:
    """Decode + stage one dataset split.

    args needs: data_root, splits_root, scale, n_channels, myseed,
    use_interpolated_low, inter_low_th, inter_low_sigma, num_workers.

    task == 'reconstruct' (reference: reconstruct_type=low_res,
    reconstruct_input=fake — dataset_dpsr.py:972-1005): the pair becomes
    (blur-chain(LR) -> LR) at scale 1, so the whole SR machinery (crops,
    augs, metrics at border=scale) reuses unchanged with hr := real LR
    and lr := blurred LR.
    """
    split, scale, _ = constants.parse_caco2_name(ds_name)
    assert scale == args['scale'], (scale, args['scale'])
    splits_root = args['splits_root'] or args['data_root']
    l_h, _ = F.get_pairs(splits_root, ds_name)
    if frac < 1.0:
        l_h = F.subset_fraction(l_h, frac)
    if n > 0:
        l_h = l_h[:n]
    base = os.path.join(args['data_root'], ds_dir(ds_name))
    l_paths = [os.path.join(base, l.split(constants.CODE_IDENTIFIER)[0])
               for (l, _) in l_h]
    h_paths = [os.path.join(base, h.split(constants.CODE_IDENTIFIER)[0])
               for (_, h) in l_h]
    ids = [h for (_, h) in l_h]

    nch = args['n_channels']
    hr = dio.read_image_stack(h_paths, nch, args.get('num_workers', 8))

    have_real = all(os.path.isfile(p) for p in l_paths[:4]) and l_paths
    use_interp = bool(args.get('use_interpolated_low', False))
    synthesize = (not have_real) or use_interp

    if synthesize:
        lr = synth_lr_from_hr(
            hr, scale, seed=int(args.get('myseed', 0)),
            inter_low_th=float(args['inter_low_th']),
            inter_low_sigma=float(args['inter_low_sigma']),
            simulate_noise=is_caco2(base))
        lr_is_real = False
    else:
        lr = dio.read_image_stack(l_paths, nch, args.get('num_workers', 8))
        lr_is_real = True

    assert lr.shape[1] * scale == hr.shape[1], (lr.shape, hr.shape)

    if args.get('task') == constants.RECONSTRUCT:
        rin = str(args.get('reconstruct_input', 'fake'))
        if rin == 'real':
            # eval-only inference mode (dataset_dpsr.py:969-972):
            # input = target = the HR acquisition downscaled to LR
            # size — the interest is the restoration network's output
            # on a REAL-statistics image, not the (identity) metric.
            assert phase == constants.EVAL_PHASE, \
                ('reconstruct_input=real is eval-only', phase)
            h_to_l = synth_lr_from_hr(
                hr, scale, seed=int(args.get('myseed', 0)),
                inter_low_th=float(args['inter_low_th']),
                inter_low_sigma=float(args['inter_low_sigma']),
                simulate_noise=False)
            return SRDataset(name=ds_name, phase=phase, scale=1,
                             n_channels=nch, hr=h_to_l, lr=h_to_l,
                             ids=ids, h_paths=h_paths,
                             l_paths=h_paths, lr_is_real=False)
        # 'fake' (default): blurred LR -> real LR, at scale 1.
        blurred = np.clip(np.round(blur_true_lr(lr) * 255.0), 0,
                          255).astype(np.uint8)
        return SRDataset(name=ds_name, phase=phase, scale=1,
                         n_channels=nch, hr=lr, lr=blurred, ids=ids,
                         h_paths=l_paths, l_paths=l_paths,
                         lr_is_real=lr_is_real)

    return SRDataset(name=ds_name, phase=phase, scale=scale,
                     n_channels=nch, hr=hr, lr=lr, ids=ids,
                     h_paths=h_paths, l_paths=l_paths,
                     lr_is_real=lr_is_real)
