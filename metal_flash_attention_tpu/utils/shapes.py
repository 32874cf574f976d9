"""Shape and padding helpers for TPU tile alignment.

The reference handles arbitrary problem sizes by shifting edge blocks
into bounds and masking garbage lanes (`GEMMKernel+Source.swift:55-76`,
`AttentionKernel+Softmax.swift:228-260`).  On TPU we instead pad arrays
to (sublane, lane) tile multiples on the host side — XLA fuses the pads
— and mask padded rows/columns inside the kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pad_to(x: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Zero-pad ``x`` up to ``shape`` (trailing padding on every dim)."""
    if tuple(x.shape) == tuple(shape):
        return x
    pads = [(0, t - s) for s, t in zip(x.shape, shape)]
    assert all(p[1] >= 0 for p in pads), (x.shape, shape)
    return jnp.pad(x, pads)
