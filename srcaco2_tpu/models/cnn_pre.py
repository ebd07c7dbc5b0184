"""Pre-upsampling CNN family: SRCNN, VDSR, DRRN, MemNet.

Capability parity with the reference zoo (network_srcnn.py:23,
network_vdsr.py:37, network_drrn.py:46, network_memnet.py:80). Each model
returns a dict: {'out': NCHW prediction, and optional 'x_interp' /
'global_residual' for residual-based losses}.
"""
import math
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (Conv, ConvReLU, bicubic_up,
                                       nchw_to_nhwc, nhwc_to_nchw)

Dtype = Any


class SRCNN(nn.Module):
    """3-layer mapping CNN on the bicubically pre-upscaled input
    (reference: network_srcnn.py:23 — conv5x5/1024, conv1x1/128,
    conv1x1/C; consumes l_to_h_img per model_plain.py:196)."""
    in_chans: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nchw_to_nhwc(x)
        # feature std: sqrt(2 / (out_c * k*k)) normal, recon layer std 1e-3
        def gauss(std):
            return nn.initializers.normal(stddev=std)
        y = nn.Conv(1024, (5, 5), padding=[(2, 2), (2, 2)],
                    dtype=self.dtype,
                    kernel_init=gauss(math.sqrt(2 / (1024 * 25))))(y)
        y = nn.relu(y)
        y = nn.Conv(128, (1, 1), dtype=self.dtype,
                    kernel_init=gauss(math.sqrt(2 / 128)))(y)
        y = nn.relu(y)
        y = nn.Conv(self.in_chans, (1, 1), dtype=self.dtype,
                    kernel_init=gauss(1e-3))(y)
        return {'out': nhwc_to_nchw(y)}


class VDSR(nn.Module):
    """Very deep (20-conv) residual CNN with internal bicubic upscale
    (reference: network_vdsr.py:37). Exposes x_interp and global_residual
    for `use_residuals` losses (loss/core.py:108)."""
    in_chans: int = 1
    upscale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_up = bicubic_up(x, self.upscale)
        y = nchw_to_nhwc(x_up)
        # kaiming-normal fan_out like the reference init
        kinit = nn.initializers.variance_scaling(2.0, 'fan_out',
                                                 'truncated_normal')
        y = nn.relu(nn.Conv(64, (3, 3), use_bias=False, dtype=self.dtype,
                            kernel_init=kinit)(y))
        for _ in range(18):
            y = nn.relu(nn.Conv(64, (3, 3), use_bias=False,
                                dtype=self.dtype, kernel_init=kinit)(y))
        y = nn.Conv(self.in_chans, (3, 3), use_bias=False,
                    dtype=self.dtype, kernel_init=kinit)(y)
        res = nhwc_to_nchw(y)
        return {'out': x_up + res, 'x_interp': x_up,
                'global_residual': res}


class DRRN(nn.Module):
    """Deep recursive residual network: one recursive residual unit
    applied num_residual_units times with shared weights, internal
    bicubic upscale (reference: network_drrn.py:46)."""
    in_chans: int = 1
    upscale: int = 2
    num_residual_units: int = 25
    features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_up = bicubic_up(x, self.upscale)
        inp = nchw_to_nhwc(x_up)
        kinit = nn.initializers.variance_scaling(2.0, 'fan_out',
                                                 'truncated_normal')
        h0 = nn.Conv(self.features, (3, 3), use_bias=False,
                     dtype=self.dtype, kernel_init=kinit)(nn.relu(inp))
        # shared-weight recursive unit: two pre-activation convs.
        # The residual shortcut is relu(h0), NOT h0: the reference's
        # recursive unit starts with nn.ReLU(inplace=True), which
        # mutates the saved shortcut tensor in place on the first
        # iteration (network_drrn.py:28,40-42) — verified by
        # differential test (tests/test_parity_torch.py).
        conv1 = nn.Conv(self.features, (3, 3), use_bias=False,
                        dtype=self.dtype, kernel_init=kinit, name='rec1')
        conv2 = nn.Conv(self.features, (3, 3), use_bias=False,
                        dtype=self.dtype, kernel_init=kinit, name='rec2')
        shortcut = nn.relu(h0)
        h = shortcut
        for _ in range(self.num_residual_units):
            z = conv1(nn.relu(h))
            z = conv2(nn.relu(z))
            h = shortcut + z
        out = nn.Conv(self.in_chans, (3, 3), use_bias=False,
                      dtype=self.dtype, kernel_init=kinit)(nn.relu(h))
        res = nhwc_to_nchw(out)
        return {'out': x_up + res, 'x_interp': x_up,
                'global_residual': res}


class _MemResidualBlock(nn.Module):
    """Pre-activation residual block, BN variant
    (network_memnet.py:25): BN-ReLU-conv-BN-ReLU-conv + identity."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        h = Conv(self.features, 3, use_bias=False,
                 dtype=self.dtype)(nn.relu(h))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(h)
        h = Conv(self.features, 3, use_bias=False,
                 dtype=self.dtype)(nn.relu(h))
        return x + h


class _MemChain(nn.Module):
    """One pass over the memory block's R DISTINCT residual blocks.
    Factored out so the R^2 recursion can remat at pass granularity."""
    features: int
    num_resblocks: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_resblocks):
            x = _MemResidualBlock(self.features, dtype=self.dtype)(
                x, train)
        return x


class _MemoryBlock(nn.Module):
    """MemNet memory block (network_memnet.py:45): R DISTINCT
    pre-activation residual blocks; the forward pushes the state
    through the whole R-block chain R times, collecting the chain
    output after each pass (R^2 block applications — upstream's exact
    recursion quirk), then gates concat(short_outs + long_outs) with
    BN-ReLU-1x1conv.

    remat_passes: checkpoint each chain pass — without it the R^2
    applications at HR size keep every conv/BN intermediate alive for
    backward (~36 GB at batch 16 for the default 6x6 net) and XLA
    spills to HBM (the 26-patches/s row in docs/THROUGHPUT.md); with
    it only pass boundaries are stored. Identical math. Like DBPN's
    remat_blocks, the remat lift canonicalizes the param-tree order,
    so the order-based torch port requires remat_passes=False
    (diagnosis/torch_port.py docstring)."""
    features: int
    num_resblocks: int
    n_memories: int          # number of long-term memory inputs
    dtype: Dtype = jnp.float32
    remat_passes: bool = True

    @nn.compact
    def __call__(self, x, long_term, train: bool = False):
        Chain = (nn.remat(_MemChain, prevent_cse=False,
                          static_argnums=(2,))
                 if self.remat_passes else _MemChain)
        chain = Chain(self.features, self.num_resblocks,
                      dtype=self.dtype)
        outs = []
        h = x
        for _ in range(self.num_resblocks):
            h = chain(h, train)
            outs.append(h)
        gate_in = jnp.concatenate(outs + long_term, axis=-1)
        g = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(gate_in)
        gate = nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype)(nn.relu(g))
        return gate


class MemNet(nn.Module):
    """Memory network, BN variant with gated dense recursion and
    internal bicubic upscale (reference: network_memnet.py:80;
    architecture verified by weight-ported differential test,
    tests/test_parity_torch.py)."""
    in_chans: int = 1
    upscale: int = 2
    num_memory_blocks: int = 6
    num_residual_blocks: int = 6
    features: int = 64
    dtype: Dtype = jnp.float32
    remat_passes: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_up = bicubic_up(x, self.upscale)
        y = nchw_to_nhwc(x_up)
        f = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        feat = Conv(self.features, 3, use_bias=False,
                    dtype=self.dtype)(nn.relu(f))
        long_term = [feat]
        h = feat
        for i in range(self.num_memory_blocks):
            h = _MemoryBlock(self.features, self.num_residual_blocks,
                             n_memories=i + 1, dtype=self.dtype,
                             remat_passes=self.remat_passes,
                             name=f'memblock{i}')(h, long_term, train)
            long_term.append(h)
        r = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(h)
        out = nn.Conv(self.in_chans, (1, 1), use_bias=False,
                      dtype=self.dtype)(nn.relu(r))
        res = nhwc_to_nchw(out)
        return {'out': x_up + res, 'x_interp': x_up,
                'global_residual': res}
