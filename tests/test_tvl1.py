"""TV-L1 optical flow (the registration-deviation oracle,
diagnosis/tvl1_flow.py): recovery of known warps on benchmark-class
tiles."""
import numpy as np

from srcaco2_tpu.data.synthetic import rich_cell_tile
from srcaco2_tpu.diagnosis.tvl1_flow import optical_flow_tvl1, _warp


def test_tvl1_recovers_rigid_shift():
    rng = np.random.default_rng(0)
    tile = rich_cell_tile(rng, 128, 'CELL0').astype(np.float64)
    g = (1.5, -0.8)
    img = _warp(tile, np.full_like(tile, g[0]), np.full_like(tile, g[1]))
    v, u = optical_flow_tvl1(tile, img)
    c = (slice(12, -12),) * 2
    roi = tile[c] >= 10.0
    err = np.sqrt((v[c] + g[0]) ** 2 + (u[c] + g[1]) ** 2)
    assert float(err[roi].mean()) < 0.35, float(err[roi].mean())


def test_tvl1_recovers_smooth_field():
    rng = np.random.default_rng(1)
    tile = rich_cell_tile(rng, 128, 'CELL0').astype(np.float64)
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float64) / 128.0
    gv = 1.5 * np.sin(2 * np.pi * yy)
    gu = 1.5 * np.cos(2 * np.pi * xx)
    img = _warp(tile, gv, gu)
    v, u = optical_flow_tvl1(tile, img)
    c = (slice(12, -12),) * 2
    roi = tile[c] >= 10.0
    err = np.sqrt((v[c] + gv[c]) ** 2 + (u[c] + gu[c]) ** 2)
    assert float(err[roi].mean()) < 0.5, float(err[roi].mean())
