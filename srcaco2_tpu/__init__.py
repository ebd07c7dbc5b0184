"""SR-CACO-2 TPU: a TPU-native (JAX/XLA/Pallas) super-resolution framework
for the SR-CACO-2 confocal-microscopy benchmark.

Brand-new implementation of the capabilities of the reference PyTorch
framework (sbelharbi/sr-caco-2), designed TPU-first: functional models
(flax.linen), jitted train/eval steps, device-resident data pipeline,
`jax.sharding.Mesh` data parallelism over ICI, Pallas kernels for the hot
attention ops.
"""
__version__ = '0.1.0'
