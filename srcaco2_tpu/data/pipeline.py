"""Device-resident input pipeline: the jitted per-step batch assembly.

The reference does per-sample CPU work in DataLoader workers
(dataset_dpsr.__getitem__:746): read tif, downscale, noise, crop, augment.
TPU-native redesign: the packed uint8 split lives in HBM (dataset.py) and
every per-step transform below runs inside jit, so input prep fuses into
the training step and costs a few matmuls + VPU ops:

  * epoch-permutation index sampling (DistributedSampler analog);
  * patch-origin draw (uniform / ROI-weighted categorical) on the
    pre-upscaled LR, parity with PatchSampler (dataset_dpsr.py:293);
  * paired dynamic-slice crops, HR at (x0,y0), LR at (x0//s, y0//s)
    (dataset_dpsr.py:870-886 — including its up-to-(s-1)px misalignment);
  * joint 8-way dihedral augmentation (util.augment_img analog);
  * LR-only local augs: block blur / binary dot noise / additive Gaussian
    (dataset_dpsr.py:1075-1190), mask-based so shapes stay static;
  * l_to_h recomputation from the augmented LR crop, uint8-quantized
    (dataset_dpsr.py:909-911);
  * optional per-pixel inverse-color-frequency weights (ppiw).

All randomness is derived with fold_in from (root seed, step, sample slot)
— bitwise reproducible, order-independent.
"""
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.data.sampling import otsu_threshold_device
from srcaco2_tpu.ops.resize import resize2d


@dataclass(frozen=True)
class PipeConfig:
    scale: int
    h_size: int                     # HR patch size
    n_channels: int = 1
    sample_tr_patch: str = constants.SAMPLE_UNIF
    th_style: str = constants.TH_AUTO
    th_fix: float = 0.0
    # local augs
    da_blur: bool = False
    da_blur_prob: float = 0.5
    da_blur_area: float = 0.3
    da_blur_sigma: float = 1.0
    da_dot_bin_noise: bool = False
    da_dot_bin_noise_prob: float = 0.5
    da_dot_bin_noise_area: float = 0.3
    da_dot_bin_noise_p: float = 0.5
    da_add_gaus_noise: bool = False
    da_add_gaus_noise_prob: float = 0.5
    da_add_gaus_noise_area: float = 0.3
    da_add_gaus_noise_std: float = 0.03
    ppiw: bool = False
    # Reference-exact crops (False): the HR origin is drawn on the HR
    # grid and the LR origin is its floor division
    # (dataset_dpsr.py:866-877 `rnd_h_l = rnd_h_h // self.sf`), so the
    # input/target pair is misaligned by (origin mod scale) HR pixels —
    # up to scale-1. That quirk caps what training can learn (it is a
    # plausible mechanism for the reference's own published x4/x8 rows
    # sitting at/below the bicubic floor). aligned_crops=True snaps the
    # origin to the LR grid (exactly aligned pairs) — a deliberate
    # BEYOND-reference option (docs/QUALITY.md crop-alignment study).
    aligned_crops: bool = False

    @property
    def l_size(self):
        return self.h_size // self.scale


def from_args(args: dict) -> PipeConfig:
    return PipeConfig(
        scale=args['scale'], h_size=args['h_size'],
        n_channels=args['n_channels'],
        sample_tr_patch=args['sample_tr_patch'],
        th_style=args['sample_tr_patch_th_style'],
        th_fix=float(args['sample_tr_patch_th'])
        if args['sample_tr_patch_th_style'] == constants.TH_FIX else 0.0,
        da_blur=args['da_blur'], da_blur_prob=args['da_blur_prob'],
        da_blur_area=args['da_blur_area'],
        da_blur_sigma=args['da_blur_sigma'],
        da_dot_bin_noise=args['da_dot_bin_noise'],
        da_dot_bin_noise_prob=args['da_dot_bin_noise_prob'],
        da_dot_bin_noise_area=args['da_dot_bin_noise_area'],
        da_dot_bin_noise_p=args['da_dot_bin_noise_p'],
        da_add_gaus_noise=args['da_add_gaus_noise'],
        da_add_gaus_noise_prob=args['da_add_gaus_noise_prob'],
        da_add_gaus_noise_area=args['da_add_gaus_noise_area'],
        da_add_gaus_noise_std=args['da_add_gaus_noise_std'],
        ppiw=args['ppiw'],
        aligned_crops=bool(args.get('train_aligned_crops', False)))


# ----------------------------------------------------------------- helpers
def dihedral(img: jax.Array, mode: jax.Array) -> jax.Array:
    """Apply one of the 8 dihedral transforms to an HWC image (joint
    flip/rot augmentation, reference analog util.augment_img)."""
    def rot(k):
        return lambda x: jnp.rot90(x, k=k, axes=(0, 1))

    def rot_flip(k):
        return lambda x: jnp.flipud(jnp.rot90(x, k=k, axes=(0, 1)))

    return jax.lax.switch(mode, [rot(0), rot(1), rot(2), rot(3),
                                 rot_flip(0), rot_flip(1), rot_flip(2),
                                 rot_flip(3)], img)


def _block_mask(key: jax.Array, h: int, w: int, area: float) -> jax.Array:
    """Random block mask (1 inside the block). Block side fraction ~
    N(area, 0.01) of each dim (reference: get_random_coordinates_block)."""
    kr, kh, kw = jax.random.split(key, 3)
    ratio = jax.random.normal(kr, ()) * 0.01 + area
    ratio = jnp.clip(ratio, 0.0, 1.0)
    bh = (h * ratio).astype(jnp.int32)
    bw = (w * ratio).astype(jnp.int32)
    ch = jax.random.randint(kh, (), 0, jnp.maximum(h - bh + 1, 1))
    cw = jax.random.randint(kw, (), 0, jnp.maximum(w - bw + 1, 1))
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    m = ((ii >= ch) & (ii < ch + bh) & (jj >= cw) & (jj < cw + bw))
    return m[..., None].astype(jnp.float32)


def _gauss_blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur of an HWC image (scipy.ndimage
    gaussian_filter analog: truncate=4*sigma, reflect boundary)."""
    radius = int(4.0 * sigma + 0.5)
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    k = jnp.asarray(k / k.sum())
    c = img.shape[-1]
    x = img.transpose(2, 0, 1)[None]                        # 1,C,H,W
    x = jnp.pad(x, ((0, 0), (0, 0), (radius, radius),
                    (radius, radius)), mode='reflect')
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, len(xs), 1),
                                        ('NCHW', 'OIHW', 'NCHW'))
    xx = x.reshape(c, 1, x.shape[2], x.shape[3])
    xx = jax.lax.conv_general_dilated(
        xx, k.reshape(1, 1, -1, 1), (1, 1), 'VALID', dimension_numbers=dn)
    xx = jax.lax.conv_general_dilated(
        xx, k.reshape(1, 1, 1, -1), (1, 1), 'VALID', dimension_numbers=dn)
    return xx.reshape(c, img.shape[0], img.shape[1]).transpose(1, 2, 0)


def _apply_local_augs(key: jax.Array, lr: jax.Array,
                      cfg: PipeConfig) -> jax.Array:
    """LR-only block augs; lr is HWC float [0,1]."""
    h, w = lr.shape[0], lr.shape[1]
    kb, kd, kg = jax.random.split(key, 3)
    if cfg.da_blur and cfg.da_blur_area > 0:
        ka, km, kinv = jax.random.split(kb, 3)
        apply = jax.random.uniform(ka, ()) < cfg.da_blur_prob
        m = _block_mask(km, h, w, cfg.da_blur_area)
        blurred = _gauss_blur(lr, cfg.da_blur_sigma)
        # with prob .98 blur everything OUTSIDE the block (keep block
        # sharp); else blur inside the block (np_blur:1106-1112).
        inside = jax.random.uniform(kinv, ()) >= 0.98
        blended = jnp.where(inside > 0,
                            m * blurred + (1 - m) * lr,
                            (1 - m) * blurred + m * lr)
        lr = jnp.where(apply, blended, lr)
    if cfg.da_dot_bin_noise and cfg.da_dot_bin_noise_area > 0:
        ka, km, kn = jax.random.split(kd, 3)
        apply = jax.random.uniform(ka, ()) < cfg.da_dot_bin_noise_prob
        m = _block_mask(km, h, w, cfg.da_dot_bin_noise_area)
        mask = jax.random.bernoulli(
            kn, 1.0 - cfg.da_dot_bin_noise_p, (h, w, 1)).astype(jnp.float32)
        lr = jnp.where(apply, lr * (m * mask + (1 - m)), lr)
    if cfg.da_add_gaus_noise and cfg.da_add_gaus_noise_area > 0:
        ka, km, kn = jax.random.split(kg, 3)
        apply = jax.random.uniform(ka, ()) < cfg.da_add_gaus_noise_prob
        m = _block_mask(km, h, w, cfg.da_add_gaus_noise_area)
        noise = cfg.da_add_gaus_noise_std * jax.random.normal(
            kn, lr.shape, jnp.float32)
        lr = jnp.where(apply, lr + m * noise, lr)
    return lr


def _u8_quant(x01: jax.Array) -> jax.Array:
    """Round to the uint8 grid in [0,1] (the reference materializes
    intermediate images as uint8)."""
    return jnp.round(jnp.clip(x01, 0.0, 1.0) * 255.0) / 255.0


def _sample_origin(key: jax.Array, l2h_u8: jax.Array,
                   cfg: PipeConfig):
    h, w = l2h_u8.shape
    psize = cfg.h_size
    if cfg.sample_tr_patch == constants.SAMPLE_UNIF:
        kx, ky = jax.random.split(key)
        x0 = jax.random.randint(kx, (), 0, max(0, h - psize) + 1)
        y0 = jax.random.randint(ky, (), 0, max(0, w - psize) + 1)
        return x0, y0
    if cfg.th_style == constants.TH_AUTO:
        th = otsu_threshold_device(l2h_u8)
    else:
        th = jnp.float32(cfg.th_fix)
    roi = (l2h_u8.astype(jnp.float32) >= th).astype(jnp.float32)
    lhalf = psize // 2
    rhalf = -(-psize // 2)

    def crop(m):
        return m[lhalf:h - rhalf, lhalf:w - rhalf]

    st = cfg.sample_tr_patch
    if st == constants.SAMPLE_ROI:
        weights = jnp.exp(crop(roi) * 5.0) + 1.0
    elif st == constants.SAMPLE_EDT:
        from srcaco2_tpu.data.sampling import edt_device
        weights = crop(edt_device(roi)) + 1.0
    elif st == constants.SAMPLE_EDTXROI:
        from srcaco2_tpu.data.sampling import edt_device
        wr = jnp.exp(crop(roi) * 5.0) + 1.0
        we = crop(edt_device(roi)) + 1.0
        weights = (wr / wr.sum()) * (we / we.sum())
    else:
        raise NotImplementedError(st)
    flat = jax.random.categorical(key, jnp.log(weights).ravel())
    wh = w - lhalf - rhalf
    return (flat // wh).astype(jnp.int32), (flat % wh).astype(jnp.int32)


# ------------------------------------------------------------- train batch
def epoch_indices(key: jax.Array, n: int, epoch: jax.Array) -> jax.Array:
    """Per-epoch permutation of [0, n) (DistributedSampler analog)."""
    return jax.random.permutation(jax.random.fold_in(key, epoch), n)


def make_train_batch(hr_u8: jax.Array, lr_u8: jax.Array,
                     idxs: jax.Array, key: jax.Array,
                     cfg: PipeConfig,
                     ppiw_table: Optional[jax.Array] = None) -> dict:
    """Assemble one train batch fully on device.

    hr_u8: (N, H, W, C) uint8; lr_u8: (N, h, w, C) uint8; idxs: (B,) int32;
    key: per-step key. Returns dict of NCHW float32 in [0,1]:
    l_im (B,C,ls,ls), h_im (B,C,hs,hs), l_to_h_img (B,C,hs,hs),
    [h_per_pixel_weight].
    """
    sf = cfg.scale
    hs, ls = cfg.h_size, cfg.l_size

    hr_batch = hr_u8[idxs]          # (B, H, W, C)
    lr_batch = lr_u8[idxs]

    def per_sample(hr_img, lr_img, skey):
        k_orig, k_mode, k_aug = jax.random.split(skey, 3)
        # pre-upscaled LR (uint8 grid) drives the origin draw.
        lr_f = lr_img.astype(jnp.float32).transpose(2, 0, 1)   # CHW
        if cfg.sample_tr_patch == constants.SAMPLE_UNIF:
            H = hr_img.shape[0]
            kx, ky = jax.random.split(k_orig)
            x0 = jax.random.randint(kx, (), 0, max(0, H - hs) + 1)
            y0 = jax.random.randint(ky, (), 0, max(0, H - hs) + 1)
        else:
            l2h_full = resize2d(lr_f, (hr_img.shape[0], hr_img.shape[1]))
            l2h_u8 = jnp.round(jnp.clip(l2h_full, 0, 255))[0]
            x0, y0 = _sample_origin(k_orig, l2h_u8, cfg)
        xl = x0 // sf
        yl = y0 // sf
        if cfg.aligned_crops:
            # beyond-reference: snap the HR origin to the LR grid so
            # the (l_im, h_im) pair is exactly aligned (see PipeConfig)
            x0 = xl * sf
            y0 = yl * sf
        h_patch = jax.lax.dynamic_slice(
            hr_img, (x0, y0, 0), (hs, hs, hr_img.shape[2]))
        l_patch = jax.lax.dynamic_slice(
            lr_img, (xl, yl, 0), (ls, ls, lr_img.shape[2]))
        # joint dihedral aug
        mode = jax.random.randint(k_mode, (), 0, 8)
        h_patch = dihedral(h_patch.astype(jnp.float32) / 255.0, mode)
        l_patch = dihedral(l_patch.astype(jnp.float32) / 255.0, mode)
        # LR-only local augs
        l_patch = _apply_local_augs(k_aug, l_patch, cfg)
        l_patch = jnp.clip(l_patch, 0.0, 1.0)
        # l_to_h from the augmented LR crop, uint8-quantized like cv2.
        l2h = resize2d(l_patch.transpose(2, 0, 1), (hs, hs))
        l2h = _u8_quant(l2h.transpose(1, 2, 0))
        return (l_patch.transpose(2, 0, 1), h_patch.transpose(2, 0, 1),
                l2h.transpose(2, 0, 1))

    skeys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(idxs.shape[0]))
    l_im, h_im, l2h = jax.vmap(per_sample)(hr_batch, lr_batch, skeys)
    out = {'l_im': l_im, 'h_im': h_im, 'l_to_h_img': l2h,
           'l_to_h_img_aug': l2h}
    if cfg.ppiw and ppiw_table is not None:
        cols = jnp.round(jnp.clip(h_im, 0, 1) * 255.0).astype(jnp.int32)
        out['h_per_pixel_weight'] = ppiw_table[cols]
    return out


# -------------------------------------------------------------- eval batch
@jax.jit
def make_eval_batch(hr_u8: jax.Array, lr_u8: jax.Array,
                    idxs: jax.Array) -> dict:
    """Full-image eval batch: NCHW float32 [0,1] l_im / h_im / l_to_h.
    Jitted (one compiled program per shape) — assembling eagerly cost a
    dispatch per op on TPU."""
    hr = hr_u8[idxs].astype(jnp.float32).transpose(0, 3, 1, 2) / 255.0
    lr_u8_b = lr_u8[idxs]
    lr = lr_u8_b.astype(jnp.float32).transpose(0, 3, 1, 2)
    l2h = resize2d(lr, (hr.shape[2], hr.shape[3]))
    l2h = jnp.round(jnp.clip(l2h, 0, 255)) / 255.0
    return {'l_im': lr / 255.0, 'h_im': hr, 'l_to_h_img': l2h,
            'l_to_h_img_aug': l2h}


def per_color_weights(hr_u8: np.ndarray, min_w: float) -> np.ndarray:
    """Inverse-frequency per-color weight table from the train HR stack,
    renormalized to [min_w, 1] (reference: dataset_dpsr.py:592-643)."""
    hist = np.bincount(hr_u8.ravel(), minlength=256).astype(np.float64)
    hist = hist / hist.sum()
    w = 1.0 / np.maximum(hist, 1e-12)
    w[hist == 0] = 0.0
    nz = w > 0
    wmin, wmax = w[nz].min(), w[nz].max()
    if wmax > wmin:
        w[nz] = (w[nz] - wmin) / (wmax - wmin) * (1.0 - min_w) + min_w
    else:
        w[nz] = 1.0
    return w.astype(np.float32)
