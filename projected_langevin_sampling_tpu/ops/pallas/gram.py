"""Pallas TPU kernel: tiled ARD-RBF gram construction.

k(x1, x2) = outputscale * exp(-0.5 * ||x1/l - x2/l||^2), built per
(N1_t, N2_t) tile from one MXU matmul (the squared-distance expansion) with
the exp fused on the VPU — the gram never exists as separate distance +
exp buffers in HBM. Used by the basis builders for large N x M grams
(reference gram sites: ``basis/orthonormal.py:36-41``,
``basis/inducing_point.py:38-50``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gram_kernel(x1_ref, x2_ref, out_ref, *, outputscale: float):
    x1 = x1_ref[:]  # (T1, D), already lengthscale-scaled
    x2 = x2_ref[:]  # (T2, D)
    n1 = jnp.sum(jnp.square(x1), axis=1, keepdims=True)  # (T1, 1)
    n2 = jnp.sum(jnp.square(x2), axis=1, keepdims=True)  # (T2, 1)
    cross = jax.lax.dot_general(
        x1, x2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T1, T2)
    d2 = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)
    out_ref[:] = outputscale * jnp.exp(-0.5 * d2)


@functools.partial(
    jax.jit, static_argnames=("outputscale", "tile", "interpret")
)
def pallas_ard_gram(
    x1_scaled: Array,  # (N1, D) inputs ALREADY divided by lengthscales
    x2_scaled: Array,  # (N2, D)
    outputscale: float,
    tile: int = 256,
    interpret: bool = False,
) -> Array:
    n1, d = x1_scaled.shape
    n2 = x2_scaled.shape[0]
    n1_pad, n2_pad = _round_up(n1, tile), _round_up(n2, tile)
    x1p = jnp.pad(x1_scaled.astype(jnp.float32), ((0, n1_pad - n1), (0, 0)))
    x2p = jnp.pad(x2_scaled.astype(jnp.float32), ((0, n2_pad - n2), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_gram_kernel, outputscale=outputscale),
        grid=(n1_pad // tile, n2_pad // tile),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n1_pad, n2_pad), jnp.float32),
        interpret=interpret,
    )(x1p, x2p)
    return out[:n1, :n2]
