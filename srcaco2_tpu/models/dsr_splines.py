"""DSR-Splines: learned per-color-range spline transfer functions.

Capability parity with the reference (network_dsr_splines.py:283):
the color range [color_min, color_max] is split into n_splines_per_color
contiguous knot intervals; each interval owns a small _SplineNet
(in_ksz conv + 1x1 MLP stack, optional local residuals, tanh head under
global residual) whose output is masked to pixels whose (uint8) intensity
falls inside its knots; spline outputs sum, optionally added to the
bicubic upscale (global residual). Exposes x_interp / global_residual.

TPU redesign: instead of n Python-level submodules (n sequential small
convs), all splines run as ONE batched network via vmapped parameters —
an (S, ...) leading axis on every kernel — so the S spline branches
execute as single batched convolutions on the MXU.
"""
from typing import Any, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu import constants
from srcaco2_tpu.models.blocks import bicubic_up, nchw_to_nhwc, \
    nhwc_to_nchw

Dtype = Any


def make_knots(color_min: int, color_max: int, n_splines: int
               ) -> List[Tuple[int, int]]:
    colors = list(range(color_min, color_max)) + [color_max]
    splits = np.array_split(colors, n_splines)
    return [(int(min(s)), int(max(s))) for s in splits]


class _SplineNet(nn.Module):
    """One spline branch (applied under nn.vmap over the S axis)."""
    in_planes: int
    h_layers: tuple
    in_ksz: int
    use_local_residual: bool
    use_global_residual: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def layer(z, out_c, k, act):
            pad = (k - 1) // 2
            zin = z
            if pad:
                # reference _full_conv uses padding_mode='reflect'
                # (network_dsr_splines.py:24)
                zin = jnp.pad(z, ((0, 0), (pad, pad), (pad, pad),
                                  (0, 0)), mode='reflect')
            y = nn.Conv(out_c, (k, k), padding='VALID',
                        dtype=self.dtype)(zin)
            if self.use_local_residual:
                y = nn.relu(y)
                if z.shape[-1] != out_c:
                    z = nn.Conv(out_c, (1, 1), dtype=self.dtype)(z)
                y = y + z
            return act(y)

        h = layer(x, self.h_layers[0], self.in_ksz, nn.relu)
        for out_c in self.h_layers[1:]:
            h = layer(h, out_c, 1, nn.relu)
        out_act = jnp.tanh if self.use_global_residual else nn.relu
        return layer(h, self.in_planes, 1, out_act)


class DSRSplines(nn.Module):
    in_planes: int = 1
    upscale: int = 2
    in_ksz: int = 3
    splinenet_type: str = 'snet_type1'
    n_splines_per_color: int = 16
    color_min: int = 0
    color_max: int = 255
    use_local_residual: bool = False
    use_global_residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.in_planes == 1, \
            'multi-plane splines grow as n^planes; reference tested grey'
        x_up = bicubic_up(x, self.upscale)
        y = nchw_to_nhwc(x_up)

        knots = make_knots(self.color_min, self.color_max,
                           self.n_splines_per_color)
        s = len(knots)
        lows = jnp.asarray([k[0] for k in knots], jnp.float32)
        highs = jnp.asarray([k[1] for k in knots], jnp.float32)

        # per-pixel knot masks (S, B, H, W, 1)
        x_un = jnp.clip(jnp.floor(y * self.color_max),
                        self.color_min, self.color_max)
        mask = ((x_un[None] >= lows[:, None, None, None, None])
                & (x_un[None] <= highs[:, None, None, None, None]))
        mask = jax.lax.stop_gradient(mask.astype(y.dtype))

        h_layers = tuple(constants.SPLINEHIDDEN[self.splinenet_type])
        SplineBank = nn.vmap(
            _SplineNet,
            in_axes=0, out_axes=0,
            variable_axes={'params': 0},
            split_rngs={'params': True})
        y_rep = jnp.broadcast_to(y[None], (s,) + y.shape)
        preds = SplineBank(self.in_planes, h_layers, self.in_ksz,
                           self.use_local_residual,
                           self.use_global_residual,
                           dtype=self.dtype, name='splines')(y_rep)
        out = (preds * mask).sum(axis=0)
        out = nhwc_to_nchw(out)
        res = {'out': out, 'x_interp': x_up}
        if self.use_global_residual:
            res['global_residual'] = out
            res['out'] = out + x_up
        return res
