"""Serving: AOT-compiled inference endpoints.

The reference has no serving story (research trainer only — SURVEY
top-level facts); for production deployment this module exports a
trained experiment as a pre-compiled uint8->uint8 function:

  * fixed input shape, AOT-lowered + compiled (no first-request jit
    stall);
  * uint8 in / uint8 out at the device boundary (4x less PCIe/ICI
    traffic than f32);
  * optional x8 TTA and tiled modes (train/test_modes.py);
  * batching helper that pads the tail batch so one executable serves
    any request size.
"""
import time
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from srcaco2_tpu import constants


class SRServer:
    """Compiled super-resolution endpoint for one experiment."""

    def __init__(self, exp_path: str, batch_size: int = 8,
                 lr_hw: Optional[Tuple[int, int]] = None,
                 test_mode: int = 0):
        from srcaco2_tpu.inference.super_res import load_exp
        self.model, self.params, self.args = load_exp(exp_path)
        self.scale = int(self.args['scale'])
        self.batch_size = batch_size
        self.test_mode = test_mode
        nt = self.args['netG']['net_type']
        self.net_type = nt
        if lr_hw is None:
            s = 512 // self.scale
            lr_hw = (s, s)
        self.lr_hw = lr_hw
        self._fn = self._compile()

    def _compile(self) -> Callable:
        from srcaco2_tpu.ops.resize import resize2d
        from srcaco2_tpu.train import test_modes as TM
        scale = self.scale
        nt = self.net_type
        netG = self.args['netG']
        model = self.model
        mode = self.test_mode

        def raw_fwd(l_im):
            if nt in constants.PRE_UPSAMPLED_INPUT_NETS or \
                    (nt == constants.CSRCNN and
                     netG.get('csrcnn_net_type') !=
                     constants.NET_TYPE_PYRAMID):
                h, w = l_im.shape[-2:]
                x = resize2d(l_im, (h * scale, w * scale))
                x = jnp.round(jnp.clip(x, 0, 1) * 255.0) / 255.0
            else:
                x = l_im
            return model.apply({'params': self.params}, x,
                               train=False)['out']

        def serve(lr_u8):
            l_im = lr_u8.astype(jnp.float32) / 255.0
            out = TM.test_mode(raw_fwd, l_im, mode=mode, sf=scale)
            return jnp.clip(jnp.round(jnp.clip(out, 0, 1) * 255.0),
                            0, 255).astype(jnp.uint8)

        shape = (self.batch_size, self.args['n_channels'],
                 self.lr_hw[0], self.lr_hw[1])
        lowered = jax.jit(serve).lower(
            jax.ShapeDtypeStruct(shape, jnp.uint8))
        t0 = time.perf_counter()
        compiled = lowered.compile()
        self.compile_seconds = time.perf_counter() - t0
        return compiled

    def __call__(self, lr_u8: np.ndarray) -> np.ndarray:
        """lr_u8: (N, C, h, w) uint8, any N — tail-padded to the
        compiled batch size internally."""
        n = lr_u8.shape[0]
        bs = self.batch_size
        outs = []
        for i in range(0, n, bs):
            chunk = lr_u8[i:i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, 0)], 0)
            out = np.asarray(self._fn(jnp.asarray(chunk)))
            outs.append(out[:bs - pad] if pad else out)
        return np.concatenate(outs, 0)

    def throughput(self, iters: int = 10) -> float:
        """Measured images/sec at the compiled batch size."""
        x = jnp.zeros((self.batch_size, self.args['n_channels'],
                       *self.lr_hw), jnp.uint8)
        self._fn(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = self._fn(x)
        out.block_until_ready()
        return self.batch_size * iters / (time.perf_counter() - t0)
