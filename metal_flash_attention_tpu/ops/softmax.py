"""Standalone softmax kernels on a materialized attention matrix.

TPU-native equivalents of the reference's archived pre-fusion kernels
(`Documentation/Archive/Softmax.swift:8-47` — in-place scaled softmax
over an N x N attention matrix; `Documentation/Archive/
DerivativeSoftmax.swift:10-40` — fused dP GEMM + dS elementwise).
The reference keeps them as documentation of the evolution toward the
fused design; here they are live utility ops: the unfused fallback for
attention variants the fused kernels do not cover (arbitrary score
post-processing, attention-matrix introspection) and the golden
building block the fused kernels are tested against.

Both are single Pallas programs gridded over row strips; the row
reductions and the exp2 trick match the fused kernels bit-for-bit
(same MASK/underflow discipline).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from metal_flash_attention_tpu.ops.flash_attention import LOG2E
from metal_flash_attention_tpu.utils.shapes import pad_to, round_up


@functools.partial(jax.jit, static_argnames=("scale", "block_rows",
                                             "interpret"))
def scaled_softmax(
    s: jax.Array,
    *,
    scale: Optional[float] = None,
    block_rows: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Row-wise softmax(s * scale) over the last axis.

    ``s``: [..., rows, cols].  ``scale`` defaults to 1/sqrt(cols) like
    the archived kernel's 1/sqrt(D) fold (Archive/Softmax.swift:8-47).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, rows, cols = s.shape
    if scale is None:
        scale = 1.0 / math.sqrt(cols)
    scale_log2e = scale * LOG2E

    s2 = s.reshape((-1, rows, cols))
    batch = s2.shape[0]
    r_pad = round_up(rows, min(block_rows, round_up(rows, 8)))
    c_pad = round_up(cols, 128)
    block_rows = min(block_rows, r_pad)
    sp = pad_to(s2, (batch, r_pad, c_pad))

    def kernel(s_ref, o_ref):
        x = s_ref[0].astype(jnp.float32) * scale_log2e
        if c_pad != cols:
            col = jax.lax.broadcasted_iota(
                jnp.int32, (block_rows, c_pad), 1)
            x = jnp.where(col < cols, x, -jnp.inf)
        m = jnp.max(x, axis=-1, keepdims=True)
        p = jnp.exp2(x - m)
        if c_pad != cols:
            p = jnp.where(col < cols, p, 0.0)
        o_ref[0] = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(
            o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(batch, r_pad // block_rows),
        in_specs=[pl.BlockSpec((1, block_rows, c_pad),
                               lambda b, i: (b, i, 0))],
        out_specs=pl.BlockSpec((1, block_rows, c_pad),
                               lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, r_pad, c_pad), s.dtype),
        interpret=interpret,
    )(sp)
    return out[:, :rows, :cols].reshape(s.shape)


@functools.partial(jax.jit, static_argnames=("scale", "block_rows",
                                             "interpret"))
def derivative_softmax(
    p: jax.Array,
    dp: jax.Array,
    *,
    scale: float = 1.0,
    block_rows: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """dS = P * (dP - rowsum(P * dP)) * scale.

    The softmax Jacobian-vector product over a materialized attention
    matrix (Archive/DerivativeSoftmax.swift:10-40).  The row term
    rowsum(P * dP) equals the fused kernels' D residual when
    dP = dO V^T.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, rows, cols = p.shape
    p2 = p.reshape((-1, rows, cols))
    dp2 = dp.reshape((-1, rows, cols))
    batch = p2.shape[0]
    r_pad = round_up(rows, min(block_rows, round_up(rows, 8)))
    c_pad = round_up(cols, 128)
    block_rows = min(block_rows, r_pad)
    pp = pad_to(p2, (batch, r_pad, c_pad))
    dpp = pad_to(dp2, (batch, r_pad, c_pad))

    def kernel(p_ref, dp_ref, o_ref):
        pv = p_ref[0].astype(jnp.float32)
        dpv = dp_ref[0].astype(jnp.float32)
        d = jnp.sum(pv * dpv, axis=-1, keepdims=True)
        o_ref[0] = (pv * (dpv - d) * scale).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(batch, r_pad // block_rows),
        in_specs=[
            pl.BlockSpec((1, block_rows, c_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_rows, c_pad), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, c_pad),
                               lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, r_pad, c_pad), p.dtype),
        interpret=interpret,
    )(pp, dpp)
    return out[:, :rows, :cols].reshape(p.shape)
