"""Diagnosis & visualization suite — figure/GIF artifact classes of
the reference's dlib/diagnosis + dlib/visualization:

  * patch_sampling_demo  — ROI/EDT heatmaps + sampling-probability
    maps + drawn sample boxes (patches.py / demo_patches.py analog)
  * noise_model_plot     — metric-vs-noise curves + residual study
    (noise.py analog)
  * color_distribution   — per-cell intensity histograms/CDFs
    (color_dist analog)
  * restore_grid         — LR / bicubic / per-method / HR comparison
    grid with per-image PSNR/SSIM captions, + per-method GIF
    (restore.py / visualization/videos.py analog)

All figures are written headless (matplotlib Agg); GIFs via imageio.
"""
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def _ensure_dir(path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)


# ------------------------------------------------------------- sampling
def patch_sampling_demo(img_u8: np.ndarray, psize: int, out_path: str,
                        n_samples: int = 24, seed: int = 0) -> str:
    """One figure: image | ROI(otsu) | EDT heatmap | per-strategy
    sampling-probability maps | drawn sampled-patch boxes (reference
    dlib/diagnosis/patches.py + demo_patches.py)."""
    from srcaco2_tpu import constants
    from srcaco2_tpu.data.sampling import (edt_map, origin_prob_map,
                                           otsu_threshold, roi_mask)
    plt = _plt()
    img = np.asarray(img_u8)
    if img.ndim == 3:
        img = img[..., 0]
    th = otsu_threshold(img)
    roi = roi_mask(img, constants.TH_AUTO, 0.0)
    edt = edt_map(roi)

    strategies = [constants.SAMPLE_UNIF, constants.SAMPLE_ROI,
                  constants.SAMPLE_EDT, constants.SAMPLE_EDTXROI]
    probs = {st: origin_prob_map(img, st, psize) for st in strategies}

    ncols = 3 + len(strategies)
    fig, axes = plt.subplots(1, ncols, figsize=(2.6 * ncols, 3.0))
    axes[0].imshow(img, cmap='magma')
    axes[0].set_title(f'image (otsu th={th:.0f})', fontsize=8)
    axes[1].imshow(roi, cmap='gray')
    axes[1].set_title('ROI mask', fontsize=8)
    axes[2].imshow(edt, cmap='viridis')
    axes[2].set_title('EDT', fontsize=8)
    for ax, st in zip(axes[3:], strategies):
        ax.imshow(probs[st], cmap='viridis')
        ax.set_title(f'p(origin) [{st}]', fontsize=8)
        # draw a few samples from this strategy
        rng = np.random.default_rng(seed)
        p = probs[st].ravel()
        p = p / p.sum()
        for k in rng.choice(p.size, size=min(n_samples, p.size),
                            p=p, replace=True):
            y, x = divmod(int(k), probs[st].shape[1])
            ax.add_patch(plt.Rectangle((x, y), psize, psize,
                                       fill=False, ec='w', lw=0.4))
    for ax in axes:
        ax.axis('off')
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


# ---------------------------------------------------------------- noise
def noise_model_plot(hr_u8: np.ndarray, lr_u8: np.ndarray, scale: int,
                     out_path: str,
                     study: Optional[Dict[float, Dict]] = None) -> str:
    """Noise study figure (reference dlib/diagnosis/noise.py): the real
    LR acquisition vs the clean downscale of HR — residual map,
    residual histogram, std-vs-intensity curve; optionally metric-vs-
    injected-noise curves from inference.super_res.noise_study."""
    from srcaco2_tpu.ops.resize import resize2d
    import jax.numpy as jnp
    plt = _plt()

    hr = np.asarray(hr_u8).astype(np.float32)
    lr = np.asarray(lr_u8).astype(np.float32)
    if hr.ndim == 3:
        hr = hr[..., 0]
    if lr.ndim == 3:
        lr = lr[..., 0]
    clean = np.asarray(resize2d(
        jnp.asarray(hr)[None, None] / 255.0,
        (lr.shape[0], lr.shape[1])))[0, 0] * 255.0
    resid = lr - clean

    ncols = 4 + (1 if study else 0)
    fig, axes = plt.subplots(1, ncols, figsize=(3.0 * ncols, 3.0))
    im = axes[0].imshow(resid, cmap='coolwarm', vmin=-40, vmax=40)
    axes[0].set_title('LR - downscale(HR)', fontsize=8)
    axes[0].axis('off')
    fig.colorbar(im, ax=axes[0], fraction=0.046)
    axes[1].hist(resid.ravel(), bins=81, color='#444')
    axes[1].set_title(f'residual hist (std={resid.std():.2f})',
                      fontsize=8)
    bins = np.linspace(0, 255, 18)
    ctr, stds, means = [], [], []
    for a, b in zip(bins[:-1], bins[1:]):
        m = (clean >= a) & (clean < b)
        if m.sum() > 20:
            ctr.append(0.5 * (a + b))
            stds.append(resid[m].std())
            means.append(resid[m].mean())
    axes[2].plot(ctr, stds, marker='o', label='std')
    axes[2].plot(ctr, means, marker='.', label='mean')
    axes[2].set_xlabel('clean intensity')
    axes[2].set_title('noise vs intensity', fontsize=8)
    axes[2].legend(fontsize=7)
    axes[2].grid(alpha=.3)
    axes[3].imshow(lr, cmap='magma')
    axes[3].set_title('real LR', fontsize=8)
    axes[3].axis('off')
    if study:
        sig = sorted(study.keys())
        for metric in ('psnr', 'ssim'):
            vals = [study[s].get(metric) for s in sig]
            if all(v is not None for v in vals):
                axes[4].plot(sig, vals, marker='o', label=metric)
        axes[4].set_xlabel('injected noise sigma')
        axes[4].set_title('robustness', fontsize=8)
        axes[4].legend(fontsize=7)
        axes[4].grid(alpha=.3)
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


# ----------------------------------------------------------------- color
def color_distribution(images_by_cell: Dict[str, Sequence[np.ndarray]],
                       out_path: str) -> str:
    """Per-cell intensity histograms + CDFs (reference color-dist
    study): one row per cell type."""
    plt = _plt()
    cells = list(images_by_cell.keys())
    fig, axes = plt.subplots(len(cells), 2,
                             figsize=(8, 2.4 * len(cells)),
                             squeeze=False)
    for r, cell in enumerate(cells):
        vals = np.concatenate([np.asarray(im).ravel()
                               for im in images_by_cell[cell]])
        h, edges = np.histogram(vals, bins=256, range=(0, 255),
                                density=True)
        axes[r, 0].plot(edges[:-1], h)
        axes[r, 0].set_yscale('log')
        axes[r, 0].set_title(f'{cell}: intensity pdf '
                             f'(mean={vals.mean():.1f})', fontsize=8)
        axes[r, 1].plot(edges[:-1], np.cumsum(h) / h.sum())
        axes[r, 1].set_title(f'{cell}: cdf', fontsize=8)
        for ax in axes[r]:
            ax.grid(alpha=.3)
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


# --------------------------------------------------------------- restore
def restore_grid(panels: List[np.ndarray], titles: List[str],
                 hr: np.ndarray, out_path: str,
                 gif_path: Optional[str] = None) -> str:
    """LR/bicubic/method/HR grid with per-panel PSNR/SSIM captions vs
    HR (reference dlib/diagnosis/restore.py figures), plus an optional
    animated GIF cycling the panels (visualization/videos.py)."""
    from srcaco2_tpu.ops import metrics as M
    import jax.numpy as jnp
    plt = _plt()

    hr = np.asarray(hr).astype(np.float32)
    caps = []
    for img, t in zip(panels, titles):
        a = np.asarray(img).astype(np.float32)
        if a.shape == hr.shape and t != 'HR':
            ea = jnp.asarray(a)[None, None]
            ha = jnp.asarray(hr)[None, None]
            p = float(M.mb_psnr(ea, ha, border=0)[0])
            s = float(M.mb_ssim(ea, ha, border=0)[0])
            caps.append(f'{t}\nPSNR {p:.2f} / SSIM {s:.4f}')
        else:
            caps.append(t)
    n = len(panels) + 1
    fig, axes = plt.subplots(1, n, figsize=(2.8 * n, 3.4))
    for ax, img, c in zip(axes, panels + [hr], caps + ['HR']):
        ax.imshow(np.asarray(img), cmap='magma', vmin=0, vmax=255)
        ax.set_title(c, fontsize=7)
        ax.axis('off')
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)

    if gif_path:
        import imageio.v2 as imageio
        import cv2
        frames = []
        for img, c in zip(panels + [hr], caps + ['HR']):
            f = np.asarray(img).astype(np.uint8)
            f = np.stack([f] * 3, -1)
            cv2.putText(f, c.split('\n')[0], (4, 18),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255),
                        1, cv2.LINE_AA)
            frames.append(f)
        _ensure_dir(gif_path)
        imageio.mimsave(gif_path, frames, duration=0.8, loop=0)
    return out_path
