"""Test configuration: force an 8-device virtual CPU platform so
multi-device sharding is exercised without TPU hardware.

Note: the environment's sitecustomize imports jax and registers the TPU
plugin at interpreter startup, so setting env vars alone is too late —
we also override jax.config before any backend is created.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.device_count() == 8, jax.devices()
