"""Reproducibility: seeding and deterministic PRNG streams.

The reference reseeds torch/numpy/random globally per train step and per
eval batch (dlib/utils/utils_reproducibility.py:91; utils_trainer.py:359).
In JAX randomness is explicit: we derive per-step / per-sample keys with
`jax.random.fold_in` from a root seed, which gives the same property —
bitwise-reproducible augmentation independent of execution order — without
global state. Host-side numpy randomness (patch sampling on host) uses
per-sample `np.random.Generator(PCG64(seed))` streams.
"""
import os
import random
from typing import Optional

import numpy as np
import jax


def get_seed(default: int = 0) -> int:
    return int(os.environ.get('MYSEED', default))


def set_seed(seed: int, verbose: bool = False):
    """Seed host-side RNGs (python + numpy). Device randomness is keyed
    explicitly; see `root_key`."""
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    if verbose:
        print(f'[seed] host RNGs seeded with {seed}')


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def step_key(root: jax.Array, step) -> jax.Array:
    """Per-train-step key (reference analog: set_seed(myseed + step))."""
    return jax.random.fold_in(root, step)


def sample_key(root: jax.Array, sample_index) -> jax.Array:
    """Per-sample key (reference analog: LR simulation seeded by sample
    index, dataset_dpsr.py:735)."""
    return jax.random.fold_in(root, sample_index)


def host_rng(seed: int, *stream: int) -> np.random.Generator:
    """Independent counter-based host RNG stream."""
    ss = np.random.SeedSequence([seed % (2 ** 32)] + [s % (2 ** 32)
                                                      for s in stream])
    return np.random.Generator(np.random.PCG64(ss))
