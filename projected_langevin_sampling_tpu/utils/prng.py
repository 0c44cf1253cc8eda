"""PRNG plumbing for the TPU-native PLS framework.

The PyTorch reference threads reproducibility through global seeds
(``src/utils.py:8-22``) and per-call ``torch.Generator`` objects
(``src/samplers.py:23-26``). JAX is functionally pure: randomness is an
explicit ``jax.random`` key argument. This module centralises the
conveniences for turning optional integer seeds into keys so the public
API can accept either a key or a seed, mirroring the reference's
``seed: int | None`` signatures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

KeyArray = jax.Array


def as_key(seed_or_key: int | KeyArray | None, default_seed: int = 0) -> KeyArray:
    """Coerce an optional integer seed or an existing key into a PRNG key."""
    if seed_or_key is None:
        return jax.random.key(default_seed)
    if isinstance(seed_or_key, int):
        return jax.random.key(seed_or_key)
    return seed_or_key


def split_like(key: KeyArray, n: int) -> list[KeyArray]:
    """Split ``key`` into ``n`` subkeys (returned as a list)."""
    return list(jax.random.split(key, n))


def normal(
    key: KeyArray,
    shape: tuple[int, ...],
    dtype=jnp.float32,
    mean: float = 0.0,
    stdev: float = 1.0,
) -> jax.Array:
    """Gaussian draws with explicit mean/stdev, matching the reference's
    ``torch.normal(mean, std, size)`` call shape (``basis/base.py:38-63``)."""
    return mean + stdev * jax.random.normal(key, shape, dtype=dtype)


def set_seed(seed: int = 42) -> KeyArray:
    """Seed the HOST-side RNGs (numpy, random, PYTHONHASHSEED) and return a
    JAX key for the device-side stream. The reference's ``set_seed``
    (``src/utils.py:8-22``) also seeds torch's global PRNG; JAX has no global
    PRNG — thread the returned key instead."""
    import os
    import random

    import numpy as np

    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.key(seed)


def sample_point(key: KeyArray | int | None, x: jax.Array) -> jax.Array:
    """Pick one random row of x, keeping the leading axis (size 1) — the
    reference's ``sample_point`` (``src/samplers.py:47-62``), used to centre
    the kNN training subsample."""
    key = as_key(key)
    idx = jax.random.randint(key, (), 0, x.shape[0])
    return jax.lax.dynamic_slice_in_dim(x, idx, 1, axis=0)
