"""Host-side image IO.

Behavioral parity with dlib/utils/utils_image.py `imread_uint`:237 (tif via
cv2, grayscale kept as 1 channel, BGR->RGB for color) and
`cv2_imsave_rgb_in`:260.
"""
import os
from concurrent.futures import ThreadPoolExecutor
from typing import List

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False
    from PIL import Image


def imread_uint(path: str, n_channels: int = 1) -> np.ndarray:
    """Read image as uint8 HWC with exactly n_channels (1 or 3)."""
    assert n_channels in (1, 3), n_channels
    if _HAS_CV2:
        if n_channels == 1:
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if img is None:
                raise FileNotFoundError(path)
            if img.ndim == 3:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            img = np.expand_dims(img, axis=2)
        else:
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if img is None:
                raise FileNotFoundError(path)
            if img.ndim == 2:
                img = cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
            else:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    else:  # pragma: no cover - PIL fallback
        img = np.asarray(Image.open(path))
        if n_channels == 1:
            if img.ndim == 3:
                img = img.mean(-1).astype(np.uint8)
            img = img[..., None]
        else:
            if img.ndim == 2:
                img = np.stack([img] * 3, -1)
    if img.dtype != np.uint8:
        # 16-bit tifs: scale down to uint8 range.
        img = (img.astype(np.float32) * (255.0 / img.max())).astype(np.uint8)
    return img


def imsave(img: np.ndarray, path: str):
    """Save HW / HWC uint8 (or [0,255] float) image as png/tif."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if _HAS_CV2:
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        cv2.imwrite(path, img)
    else:  # pragma: no cover
        Image.fromarray(img).save(path)


def read_image_stack(paths: List[str], n_channels: int = 1,
                     num_workers: int = 8) -> np.ndarray:
    """Decode a list of images into one (N, H, W, C) uint8 array using a
    thread pool. This is the host staging step for the device-resident
    pipeline: decode once, keep packed."""
    if not paths:
        return np.zeros((0, 0, 0, n_channels), np.uint8)
    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        imgs = list(ex.map(lambda p: imread_uint(p, n_channels), paths))
    shapes = {im.shape for im in imgs}
    assert len(shapes) == 1, f'inhomogeneous image sizes: {shapes}'
    return np.stack(imgs)


def cv2_resize_cubic_uint8(img: np.ndarray, out_wh) -> np.ndarray:
    """cv2 INTER_CUBIC resize of a uint8 HWC image, keeping channel dim
    (reference: _resize_low_to_scale, dataset_dpsr.py:659)."""
    if _HAS_CV2:
        out = cv2.resize(img, dsize=tuple(out_wh),
                         interpolation=cv2.INTER_CUBIC)
    else:  # pragma: no cover
        from srcaco2_tpu.ops.resize import resize2d
        import jax.numpy as jnp
        x = jnp.asarray(img.astype(np.float32).transpose(2, 0, 1))
        out = np.asarray(resize2d(x, (out_wh[1], out_wh[0]))
                         ).transpose(1, 2, 0)
        out = np.clip(np.round(out), 0, 255).astype(img.dtype)
    if out.ndim == 2:
        out = out[:, :, None]
    return out
