"""ProSR: progressive dense pyramid SR network.

Capability parity with the reference (network_prosr.py:256, ProSRL
variant: residual_denseblock=True): one init_conv per pyramid depth; each
pyramid level = optional 1x1 compression (levels > 0) + a chain of
DenseResidualBlocks (dense block + 1x1 compress + res_factor residual) +
final conv + level residual + x2 pixel-shuffle; per-level reconstruction
convs produce intermediate predictions added to the bicubic upscale of
the input (progressive loss, model_plain.loss_prosr:236).
"""
import math
from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (Conv, nchw_to_nhwc, nhwc_to_nchw,
                                       pixel_shuffle)
from srcaco2_tpu.ops.resize import resize2d


class RConv(nn.Module):
    """3x3 conv with REFLECTION padding — the reference's custom
    Conv2d pads reflectively by default (network_prosr.py:41-86);
    verified by differential test (zero padding shifts outputs by
    >0.2 at the borders)."""
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode='reflect')
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       padding='VALID', dtype=self.dtype)(x)

Dtype = Any


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    bn_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_layers):
            y = Conv(self.bn_size * self.growth_rate, 1,
                     dtype=self.dtype)(x)
            y = nn.relu(y)
            y = RConv(self.growth_rate, 3, dtype=self.dtype)(y)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class DenseResidualBlock(nn.Module):
    num_layers: int
    num_input_features: int
    growth_rate: int
    bn_size: int
    res_factor: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = DenseBlock(self.num_layers, self.growth_rate, self.bn_size,
                       dtype=self.dtype)(x)
        y = nn.Conv(self.num_input_features, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        return self.res_factor * y + x


class ProSR(nn.Module):
    in_chans: int = 1
    upscale: int = 8
    num_init_features: int = 160
    growth_rate: int = 40
    bn_size: int = 4
    max_num_feature: int = 312
    level_config: Dict[int, List[List[int]]] = None
    res_factor: float = 0.2
    block_compression: float = 0.4
    ps_woReLU: bool = False     # reference default: the pyramid
                                # upsampler appends a ReLU after the
                                # pixel shuffle (network_prosr.py:100,
                                # utils_init_default_args.py:136)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_pyramids = int(math.log2(self.upscale))
        cfg = (self.level_config or {
            2: [[8] * 9], 4: [[8] * 9, [8] * 3],
            8: [[8] * 9, [8] * 3, [8]]})[self.upscale]
        assert len(cfg) == n_pyramids, (cfg, n_pyramids)

        y = nchw_to_nhwc(x)
        nf = self.num_init_features
        feats = RConv(nf, 3, dtype=self.dtype,
                      name=f'init_conv_{n_pyramids}')(y)
        outs = []
        num_features = nf
        for s in range(n_pyramids):
            level_in = feats
            z = feats
            if s != 0:
                z = nn.Conv(nf, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f'compression_{s}')(z)
                num_features = nf
            for b, num_layers in enumerate(cfg[s]):
                z = DenseResidualBlock(
                    num_layers, num_features, self.growth_rate,
                    self.bn_size, self.res_factor, dtype=self.dtype,
                    name=f'p{s}_drb{b}')(z)
            z = RConv(num_features, 3, dtype=self.dtype,
                      name=f'p{s}_final_conv')(z)
            feats = z + level_in                       # pyramid residual
            feats = RConv(4 * num_features, 3, dtype=self.dtype,
                          name=f'p{s}_up')(feats)
            feats = pixel_shuffle(feats, 2)
            if not self.ps_woReLU:
                feats = nn.relu(feats)
            rec = RConv(self.in_chans, 3, dtype=self.dtype,
                        name=f'reconst_{s + 1}')(feats)
            up = 2 ** (s + 1)
            ident = jnp.clip(resize2d(x, (x.shape[-2] * up,
                                          x.shape[-1] * up)), 0.0, 1.0)
            outs.append(nhwc_to_nchw(rec) + ident)

        return {'out': outs[-1], 'intermediate_outs': outs[:-1]}
