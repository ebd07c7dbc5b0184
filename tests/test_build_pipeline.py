"""Raw-tiles -> dataset roundtrip (VERDICT r1 #5): synthesize raw
acquisition sessions, run the ONE-command builder
(fix -> register -> sample -> folds), load the result through the
standard fold/dataset loaders, and take a train batch from it."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from srcaco2_tpu import constants
from srcaco2_tpu.data import build_scripts as B
from srcaco2_tpu.data import io as dio

HR = 256          # raw HR tile size (reference: 1024)
PSIZE = 64        # patch size (reference: 512)
BORDER = 8        # registration crop (keeps 240 % 8 == 0)


def _make_raw_sessions(root, rng, n_tiles=4):
    """Two sessions with the reference quirks: session 2 renumbers its
    tiles (+offset) and stores channels in reversed order."""
    sessions = []
    specs = [(0, (0, 1, 2), range(1, 3)), (10, (2, 1, 0), range(1, 3))]
    for si, (off, order, tile_rng) in enumerate(specs):
        dirs = {}
        for sc in (1, 2, 4, 8):
            dirs[sc] = os.path.join(root, f'session{si}', f'res{sc}')
            os.makedirs(dirs[sc], exist_ok=True)
        for t in tile_rng:
            # bright cell blobs on dark background, 3 channels
            hr = np.zeros((3, HR, HR), np.uint8)
            yy, xx = np.mgrid[:HR, :HR]
            for c in range(3):
                img = np.zeros((HR, HR), np.float32)
                for _ in range(30):
                    cy, cx = rng.integers(16, HR - 16, 2)
                    r = rng.integers(6, 20)
                    img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = \
                        rng.integers(60, 200)
                hr[c] = img.astype(np.uint8)
            # sessions store channels in their own order; the builder
            # re-orders them back via channel_order
            inv = np.argsort(np.asarray(order))
            raw = hr[inv]
            for sc, d in dirs.items():
                if sc == 1:
                    img = raw
                else:
                    # misaligned low acquisition: shift then decimate
                    dy, dx = int(rng.integers(-3, 4)), \
                        int(rng.integers(-3, 4))
                    sh = np.roll(np.roll(raw, dy, 1), dx, 2)
                    img = sh[:, ::sc, ::sc]
                B._imsave_chw(img, os.path.join(
                    d, f'exp_Tile{t}_acq.tif'))
        sessions.append(B.SessionSpec(res_dirs=dirs, tile_offset=off,
                                      channel_order=order))
    return sessions


def test_raw_to_dataset_roundtrip(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    sessions = _make_raw_sessions(root, rng)

    counts = B.build_caco2_from_raw(
        sessions, root, hr_size=HR, psize=PSIZE, del_border=BORDER,
        min_area=0.05, threshold=4.0, n_test_tiles=1, n_valid_tiles=1)

    # all 27 (cell x scale x split) fold files exist and are non-empty
    for cell in constants.CELLS:
        for sc in (2, 4, 8):
            for split in constants.SPLITS:
                ds = constants.caco2_name(split, sc, cell)
                assert counts.get(ds, 0) > 0, (ds, counts)
    assert counts['_sampled'] > 0

    # the reference patch naming parses
    hr_files = os.listdir(os.path.join(root, 'caco2', 'hr_div_1'))
    info = B.get_info_patch(hr_files[0])
    assert info['ii'] - info['i'] == PSIZE
    assert info['cell'] in constants.CELLS

    # loads through the standard fold/dataset machinery and stages
    from srcaco2_tpu.data.dataset import load_dataset
    args = {'data_root': root, 'splits_root': root, 'scale': 2,
            'n_channels': 1, 'myseed': 0, 'num_workers': 2,
            'use_interpolated_low': False}
    ds = load_dataset(args, constants.caco2_name(
        constants.TRAINSET, 2, constants.CELL1), constants.TRAINSET)
    assert len(ds) == counts[constants.caco2_name(
        constants.TRAINSET, 2, constants.CELL1)]
    ds.stage()

    # a train batch comes off the staged arrays
    from srcaco2_tpu.data import pipeline as P
    cfg = P.PipeConfig(scale=2, h_size=32)
    batch = P.make_train_batch(ds.hr_dev, ds.lr_dev,
                               jnp.zeros((2,), jnp.int32),
                               jax.random.key(0), cfg, None)
    assert batch['h_im'].shape == (2, 1, 32, 32)
    assert bool(jnp.all(jnp.isfinite(batch['h_im'])))


def test_nearest_resize_matches_pil_center_convention():
    """The builder's resizes must match the reference's PIL NEAREST
    (caco2_resample.py:492,513): the output pixel CENTER maps to the
    source coordinate, so an s-fold downsample samples the BLOCK
    CENTER (s*y + s//2), not the corner s*y. The corner convention
    shifted every built LR by (s-1)/2 px against its HR (~1.5 px at
    x4 — measured as ~2.2 dB of spurious 'restorable margin' by the
    ridge probe in docs/QUALITY.md)."""
    from PIL import Image
    rng = np.random.default_rng(0)
    for ih, oh in [(128, 64), (128, 32), (128, 16), (16, 128),
                   (32, 128)]:
        img = rng.integers(0, 256, (ih, ih)).astype(np.uint8)
        ours = B._nearest_resize(img, oh, oh)
        pil = np.array(Image.fromarray(img).resize(
            (oh, oh), resample=Image.NEAREST))
        np.testing.assert_array_equal(ours, pil, err_msg=f'{ih}->{oh}')


def test_register_im_preserves_grid_alignment():
    """register_im of an ALREADY-ALIGNED (hr, blockmean-lr) pair must
    return an LR whose bicubic upsample is centered on the HR grid:
    on a linear ramp, the mean difference reads the misalignment in
    pixels directly (the old corner-sampling downscale returned a
    ~(s-1)/2-px-shifted LR)."""
    s = 4
    ramp = np.tile(np.arange(128, dtype=np.float32), (128, 1))
    hr = np.stack([ramp, ramp.T, (ramp + ramp.T) / 2]).astype(np.uint8)
    low = hr.astype(np.float32).reshape(3, 32, s, 32, s).mean(
        (2, 4)).round().astype(np.uint8)
    reg, ref_c = B.register_im(hr, low, scale=s, del_border=8,
                               global_shift=True)
    # block-center expectation of the cropped reference
    exp = ref_c.astype(np.float32).reshape(
        3, ref_c.shape[1] // s, s, ref_c.shape[2] // s, s).mean((2, 4))
    # interior only (warp edge effects)
    d = (reg.astype(np.float32) - exp)[:, 2:-2, 2:-2]
    # ramp slope is 1/px in HR units: the mean difference IS the shift
    assert abs(d.mean()) < 0.75, d.mean()


def test_register_im_tvl1_method():
    """register_im(method='tvl1') — the reference's exact registration
    algorithm (caco2_resample.py:441 via diagnosis/tvl1_flow.py) wired
    as a builder option — reduces a translated pair's residual like the
    default pyramid path does."""
    rng = np.random.default_rng(3)
    hr = np.zeros((1, 128, 128), np.uint8)
    yy, xx = np.mgrid[:128, :128]
    img = np.zeros((128, 128), np.float32)
    for _ in range(20):
        cy, cx = rng.integers(12, 116, 2)
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= 36] = 180
    hr[0] = img
    shifted = np.roll(np.roll(hr, 3, 1), -2, 2)
    low = shifted[:, ::2, ::2]
    reg, ref_c = B.register_im(hr, low, scale=2, del_border=8,
                               method='tvl1')
    up = np.stack([B._nearest_resize(reg[c], ref_c.shape[1],
                                     ref_c.shape[2]) for c in range(1)])
    before = np.stack([B._nearest_resize(low[c], ref_c.shape[1],
                                         ref_c.shape[2])
                       for c in range(1)])
    err_after = np.abs(up.astype(int) - ref_c.astype(int)).mean()
    hr_c = hr[:, 8:-8, 8:-8]
    err_before = np.abs(before.astype(int) - hr_c.astype(int)).mean()
    assert err_after < 0.6 * err_before, (err_after, err_before)
    # the legacy bool still maps to the single-pass block estimate
    reg_b, _ = B.register_im(hr, low, scale=2, del_border=8,
                             pyramid=False)
    assert reg_b.shape == reg.shape


def test_registration_recovers_global_shift():
    """A pure translation between low and high acquisitions is
    recovered by register_im (global_shift mode) to <=1px."""
    rng = np.random.default_rng(1)
    hr = np.zeros((3, 128, 128), np.uint8)
    yy, xx = np.mgrid[:128, :128]
    for c in range(3):
        img = np.zeros((128, 128), np.float32)
        for _ in range(20):
            cy, cx = rng.integers(12, 116, 2)
            img[(yy - cy) ** 2 + (xx - cx) ** 2 <= 36] = 180
        hr[c] = img
    shifted = np.roll(np.roll(hr, 3, 1), -2, 2)
    low = shifted[:, ::2, ::2]
    reg, ref_c = register_im_pair = B.register_im(
        hr, low, scale=2, del_border=8, global_shift=True)
    up = np.stack([B._nearest_resize(reg[c], ref_c.shape[1],
                                     ref_c.shape[2])
                   for c in range(3)])
    before = np.stack([B._nearest_resize(low[c], ref_c.shape[1],
                                         ref_c.shape[2])
                       for c in range(3)])
    err_after = np.abs(up.astype(int) - ref_c.astype(int)).mean()
    # compare against the unregistered baseline
    hr_c = hr[:, 8:-8, 8:-8]
    err_before = np.abs(before.astype(int) - hr_c.astype(int)).mean()
    assert err_after < 0.6 * err_before, (err_after, err_before)


def test_pyramid_flow_recovers_nonuniform_warp():
    """A smooth NON-UNIFORM flow (sinusoidal, locally varying, +-3 px)
    is recovered sub-pixel by the iterative pyramid warp-and-refine
    (_block_flow_refine) where the legacy single-pass 4x4 block flow
    is not — the endpoint-error comparison from VERDICT r2 #5."""
    from srcaco2_tpu.data.synthetic import rich_cell_tile
    rng = np.random.default_rng(7)
    ref = rich_cell_tile(rng, 256, 'CELL1').astype(np.float64) / 255.0
    h, w = ref.shape
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    v_true = 3.0 * np.sin(2 * np.pi * xx / w) \
        + 1.5 * np.cos(2 * np.pi * yy / h)
    u_true = -2.0 * np.cos(2 * np.pi * yy / h) \
        + 1.0 * np.sin(2 * np.pi * xx / w)
    # observed image: ref deformed so that warping img by (v_true,
    # u_true) maps it back onto ref (inverse-map convention)
    img = B._warp_f(ref, -v_true, -u_true)

    inner = (slice(16, -16), slice(16, -16))  # skip warp borders

    def epe(v, u):
        return float(np.hypot(v - v_true, u - u_true)[inner].mean())

    v1, u1 = B._block_flow(ref, img)                    # single-pass
    vp, up = B._block_flow_refine(ref, img)             # pyramid
    e_single, e_pyr = epe(v1, u1), epe(vp, up)
    assert e_pyr < 0.5, (e_single, e_pyr)               # sub-pixel
    assert e_pyr < 0.5 * e_single, (e_single, e_pyr)    # clear win


def test_phase_correlation_subpixel():
    """Parabolic peak refinement recovers fractional translations to
    <0.25 px where the integer peak is off by up to 0.5 px."""
    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, (96, 96))
    from scipy.ndimage import fourier_shift, gaussian_filter
    base = gaussian_filter(base, 2.0)
    shift = (1.6, -2.3)
    shifted = np.fft.ifft2(fourier_shift(np.fft.fft2(base),
                                         shift)).real
    dy, dx = B.phase_correlation_shift(base, shifted)
    # aligning b back onto a: the recovered displacement is -shift
    assert abs(dy + shift[0]) < 0.25 and abs(dx + shift[1]) < 0.25, \
        (dy, dx)
    dyi, dxi = B.phase_correlation_shift(base, shifted,
                                         subpixel=False)
    assert float(dyi) == int(dyi) and float(dxi) == int(dxi)
