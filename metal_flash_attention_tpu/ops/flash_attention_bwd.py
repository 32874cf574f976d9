"""Atomic-free two-kernel flash-attention backward (Pallas / TPU).

TPU-native re-design of the reference's backward family
(`Attention/AttentionKernelType.swift:10-23`, `README.md:39-46`):

- ``backwardQuery``: grid parallel over *query rows*; recomputes
  S = Q K^T and P = exp2(S·scale − L), then
  dS = P (dP − D) and dQ += dS K
  (`AttentionKernel+Source.swift:419-463`).
- ``backwardKeyValue``: grid parallel over *key columns*; the reference
  recomputes the transposed world S^T = K Q^T
  (`AttentionKernel+Source.swift:465-518`).  On TPU we instead compute
  S = Q K^T in natural orientation and express dV = P^T dO and
  dK = dS^T Q as contractions over the row dimension
  (`dot_general` with dimension 0 contraction) — the MXU treats both
  orientations identically, so the reference's whole transposed-operand
  machinery collapses into dimension numbers.

No atomics or scatter-adds anywhere: each kernel owns its output tiles
exclusively, the only inter-kernel dataflow is L and D through HBM —
exactly the reference's design, which is *more* idiomatic on TPU where
cross-core accumulation would serialize.

Work model parity: fwd (2D+5)N², dQ (3D+5)N², dK/dV (4D+5)N², total
9D+15 (`README.md:41-46`).

D = rowsum(dO ⊙ O) is precomputed once on the host side (XLA fuses it)
and shared by both kernels, like the reference's D operand written by
backwardQuery and consumed by backwardKeyValue
(`AttentionKernel+Softmax.swift:32-221`).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_tpu.ops.flash_attention import (
    GATE_MAGNITUDE,
    LOG2E,
    MASK_VALUE,
    MIN_LANES,
    RESIDUAL_SUBLANES,
    _block_visible,
    flash_attention_forward,
)
from metal_flash_attention_tpu.descriptors.parameters import (
    select_block_sizes,
)
from metal_flash_attention_tpu.utils.shapes import round_up, pad_to


def _struct_mask(
    i, j, *, block_q, block_kv, causal, window_size, offset, kv_len,
):
    """Structural (iota-derived) boolean mask: padding/causal/window.
    The loaded external mask is applied arithmetically instead (see the
    forward kernel's gate; an i1 vector sourced from memory trips a
    Mosaic relayout error when mixed with iota booleans)."""
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 0) + i * block_q
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 1) + j * block_kv
    m = cols < kv_len
    if causal:
        m &= cols <= rows + offset
    if window_size is not None:
        m &= cols > rows + offset - window_size
    return m


def _make_dq_kernel(
    *, block_q, block_kv, num_kv_blocks, q_len, kv_len, scale,
    causal, window_size, has_mask, has_bias, needs_struct_mask,
    emit_dbias, out_dtype, precision=None,
):
    scale_log2e = scale * LOG2E
    offset = kv_len - q_len

    def kernel(*refs):
        it = iter(refs)
        q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref = (next(it) for _ in range(6))
        mask_ref = next(it) if has_mask else None
        bias_ref = next(it) if has_bias else None
        dq_ref = next(it)
        dbias_ref = next(it) if emit_dbias else None
        dq_acc = next(it)

        i = pl.program_id(2)
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _init():
            dq_acc[...] = jnp.zeros_like(dq_acc)

        should_run = _block_visible(
            i, j, block_q=block_q, block_kv=block_kv, causal=causal,
            window_size=window_size, offset=offset, kv_len=kv_len,
        )

        @pl.when(should_run)
        def _run():
            q = q_ref[0, 0]
            k = k_ref[0, 0]
            v = v_ref[0, 0]
            do = do_ref[0, 0].astype(jnp.float32)
            lse2 = lse_ref[0, 0, 0] * LOG2E        # [bq] natural -> base2
            # Fully-masked rows carry L = -inf; exp2(s - (-inf)) would
            # poison the whole tile.  Their entries are already zeroed
            # by the element mask, so neutralize the residual.
            lse2 = jnp.where(jnp.isfinite(lse2), lse2, 0.0)
            d_term = d_ref[0, 0, 0]                # [bq]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) * scale_log2e
            if has_bias:
                s += bias_ref[0, 0].astype(jnp.float32) * LOG2E
            if needs_struct_mask:
                em = _struct_mask(
                    i, j, block_q=block_q, block_kv=block_kv,
                    causal=causal, window_size=window_size, offset=offset,
                    kv_len=kv_len,
                )
                s = jnp.where(em, s, MASK_VALUE)
            if has_mask:
                gate = jnp.minimum(
                    jnp.abs(mask_ref[0, 0].astype(jnp.float32)), 1.0)
                s = s + (gate - 1.0) * GATE_MAGNITUDE
            # P = softmax probabilities recomputed from the L residual.
            p = jnp.exp2(s - lse2[:, None])        # [bq, bkv]
            dp = jax.lax.dot_general(
                do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            ds = p * (dp - d_term[:, None])        # natural units
            if emit_dbias:
                dbias_ref[0, 0] = ds.astype(dbias_ref.dtype)
            dq_acc[...] += jax.lax.dot_general(
                (ds * scale).astype(k.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )

        if emit_dbias:
            @pl.when(jnp.logical_not(should_run))
            def _zero_dbias():
                dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

        @pl.when(j == num_kv_blocks - 1)
        def _store():
            dq_ref[0, 0] = dq_acc[...].astype(out_dtype)

    return kernel


def _make_dkv_kernel(
    *, block_q, block_kv, num_q_blocks, q_len, kv_len, scale,
    causal, window_size, has_mask, has_bias, needs_struct_mask,
    out_dtype, precision=None,
):
    scale_log2e = scale * LOG2E
    offset = kv_len - q_len

    def kernel(*refs):
        it = iter(refs)
        q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref = (next(it) for _ in range(6))
        mask_ref = next(it) if has_mask else None
        bias_ref = next(it) if has_bias else None
        dk_ref = next(it)
        dv_ref = next(it)
        dk_acc = next(it)
        dv_acc = next(it)

        j = pl.program_id(2)   # kv block — the parallel dimension
        i = pl.program_id(3)   # q block — the traversal loop

        @pl.when(i == 0)
        def _init():
            dk_acc[...] = jnp.zeros_like(dk_acc)
            dv_acc[...] = jnp.zeros_like(dv_acc)

        visible = _block_visible(
            i, j, block_q=block_q, block_kv=block_kv, causal=causal,
            window_size=window_size, offset=offset, kv_len=kv_len,
        )
        should_run = jnp.logical_and(visible, i * block_q < q_len)

        @pl.when(should_run)
        def _run():
            q = q_ref[0, 0]
            k = k_ref[0, 0]
            v = v_ref[0, 0]
            do = do_ref[0, 0].astype(jnp.float32)
            lse2 = lse_ref[0, 0, 0] * LOG2E
            lse2 = jnp.where(jnp.isfinite(lse2), lse2, 0.0)
            d_term = d_ref[0, 0, 0]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) * scale_log2e
            if has_bias:
                s += bias_ref[0, 0].astype(jnp.float32) * LOG2E
            if needs_struct_mask:
                em = _struct_mask(
                    i, j, block_q=block_q, block_kv=block_kv,
                    causal=causal, window_size=window_size, offset=offset,
                    kv_len=kv_len,
                )
                s = jnp.where(em, s, MASK_VALUE)
            if has_mask:
                gate = jnp.minimum(
                    jnp.abs(mask_ref[0, 0].astype(jnp.float32)), 1.0)
                s = s + (gate - 1.0) * GATE_MAGNITUDE
            p = jnp.exp2(s - lse2[:, None])        # [bq, bkv]
            # dV += P^T dO: contraction over the row dimension replaces
            # the reference's explicit S^T world.
            dv_acc[...] += jax.lax.dot_general(
                p.astype(do_ref.dtype), do_ref[0, 0],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            dp = jax.lax.dot_general(
                do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            ds = (p * (dp - d_term[:, None]) * scale)
            dk_acc[...] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )

        @pl.when(i == num_q_blocks - 1)
        def _store():
            dk_ref[0, 0] = dk_acc[...].astype(out_dtype)
            dv_ref[0, 0] = dv_acc[...].astype(out_dtype)

    return kernel


def flash_attention_backward(
    q, k, v, do, o, lse,
    *,
    causal=False, window_size=None, mask=None, bias=None, scale=None,
    block_q=None, block_kv=None, interpret=None, compute_dbias=False,
):
    """Run both backward kernels; returns (dq, dk, dv[, dbias]).

    dK/dV are computed per *query* head and reduced over GQA groups
    afterwards (an XLA reduction, not an atomic — the TPU analog of the
    reference's per-head grid dispatch).
    """
    batch, q_heads, q_len, head_dim = q.shape
    _, kv_heads, kv_len, _ = k.shape
    group = q_heads // kv_heads
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if block_q is None or block_kv is None:
        # Both backward kernels share one (block_q, block_kv) pair so
        # they can share residual padding; take the dQ-kernel row.
        tq, tkv = select_block_sizes("backward_query", head_dim, q.dtype)
        block_q = block_q or tq
        block_kv = block_kv or tkv

    d_pad = round_up(head_dim, MIN_LANES)
    block_q = max(min(block_q, round_up(q_len, MIN_LANES)), MIN_LANES)
    block_kv = max(min(block_kv, round_up(kv_len, MIN_LANES)), MIN_LANES)
    r_pad = round_up(q_len, block_q)
    c_pad = round_up(kv_len, block_kv)
    num_q_blocks = r_pad // block_q
    num_kv_blocks = c_pad // block_kv

    precision = (jax.lax.Precision.HIGHEST
                 if jnp.dtype(q.dtype) == jnp.dtype(jnp.float32) else None)

    # D = rowsum(dO * O): shared residual of both kernels
    # (reference's D operand, AttentionKernel+Softmax.swift:32-221).
    d_term = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    qp = pad_to(q, (batch, q_heads, r_pad, d_pad))
    kp = pad_to(k, (batch, kv_heads, c_pad, d_pad))
    vp = pad_to(v, (batch, kv_heads, c_pad, d_pad))
    dop = pad_to(do, (batch, q_heads, r_pad, d_pad))
    # Residuals in the sublane-duplicated layout (see RESIDUAL_SUBLANES).
    lsep = jnp.broadcast_to(
        pad_to(lse.astype(jnp.float32), (batch, q_heads, r_pad))
        [:, :, None, :],
        (batch, q_heads, RESIDUAL_SUBLANES, r_pad))
    dp_ = jnp.broadcast_to(
        pad_to(d_term, (batch, q_heads, r_pad))[:, :, None, :],
        (batch, q_heads, RESIDUAL_SUBLANES, r_pad))

    has_mask = mask is not None
    has_bias = bias is not None
    needs_struct_mask = causal or window_size is not None or c_pad != kv_len

    def _aux_spec(a):
        bdim = 0 if a.shape[0] == 1 else None
        hdim = 0 if a.shape[1] == 1 else None
        return pl.BlockSpec(
            (1, 1, block_q, block_kv),
            lambda b, h, i, j, bd=bdim, hd=hdim: (
                bd if bd is not None else b,
                hd if hd is not None else h, i, j),
        )

    mp = bp = None
    if has_mask:
        mp = pad_to(mask.astype(jnp.int8), mask.shape[:2] + (r_pad, c_pad))
    if has_bias:
        bp = pad_to(bias, bias.shape[:2] + (r_pad, c_pad))

    # ---- backwardQuery: grid over rows --------------------------------
    dq_specs = [
        pl.BlockSpec((1, 1, block_q, d_pad), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_kv, d_pad),
                     lambda b, h, i, j, g=group: (b, h // g, j, 0)),
        pl.BlockSpec((1, 1, block_kv, d_pad),
                     lambda b, h, i, j, g=group: (b, h // g, j, 0)),
        pl.BlockSpec((1, 1, block_q, d_pad), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, RESIDUAL_SUBLANES, block_q),
                     lambda b, h, i, j: (b, h, 0, i)),
        pl.BlockSpec((1, 1, RESIDUAL_SUBLANES, block_q),
                     lambda b, h, i, j: (b, h, 0, i)),
    ]
    dq_inputs = [qp, kp, vp, dop, lsep, dp_]
    if has_mask:
        dq_specs.append(_aux_spec(mp)); dq_inputs.append(mp)
    if has_bias:
        dq_specs.append(_aux_spec(bp)); dq_inputs.append(bp)

    emit_dbias = compute_dbias and has_bias
    dq_out_specs = [
        pl.BlockSpec((1, 1, block_q, d_pad), lambda b, h, i, j: (b, h, i, 0)),
    ]
    dq_out_shapes = [
        jax.ShapeDtypeStruct((batch, q_heads, r_pad, d_pad), q.dtype),
    ]
    if emit_dbias:
        dq_out_specs.append(
            pl.BlockSpec((1, 1, block_q, block_kv),
                         lambda b, h, i, j: (b, h, i, j)))
        dq_out_shapes.append(
            jax.ShapeDtypeStruct((batch, q_heads, r_pad, c_pad),
                                 jnp.float32))

    dq_kernel = _make_dq_kernel(
        block_q=block_q, block_kv=block_kv, num_kv_blocks=num_kv_blocks,
        q_len=q_len, kv_len=kv_len, scale=scale, causal=causal,
        window_size=window_size, has_mask=has_mask, has_bias=has_bias,
        needs_struct_mask=needs_struct_mask, emit_dbias=emit_dbias,
        out_dtype=q.dtype, precision=precision,
    )
    dq_out = pl.pallas_call(
        dq_kernel,
        grid=(batch, q_heads, num_q_blocks, num_kv_blocks),
        in_specs=dq_specs,
        out_specs=dq_out_specs,
        out_shape=dq_out_shapes,
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*dq_inputs)
    dq = dq_out[0][:, :, :q_len, :head_dim]
    dbias = None
    if emit_dbias:
        dbias_full = dq_out[1][:, :, :q_len, :kv_len]
        # Reduce over broadcasted batch/head dims of the bias input.
        red = []
        if bias.shape[0] == 1:
            red.append(0)
        if bias.shape[1] == 1:
            red.append(1)
        dbias = (jnp.sum(dbias_full, axis=tuple(red), keepdims=True)
                 if red else dbias_full).astype(bias.dtype)

    # ---- backwardKeyValue: grid over columns --------------------------
    dkv_specs = [
        pl.BlockSpec((1, 1, block_q, d_pad), lambda b, h, j, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_kv, d_pad),
                     lambda b, h, j, i, g=group: (b, h // g, j, 0)),
        pl.BlockSpec((1, 1, block_kv, d_pad),
                     lambda b, h, j, i, g=group: (b, h // g, j, 0)),
        pl.BlockSpec((1, 1, block_q, d_pad), lambda b, h, j, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, RESIDUAL_SUBLANES, block_q),
                     lambda b, h, j, i: (b, h, 0, i)),
        pl.BlockSpec((1, 1, RESIDUAL_SUBLANES, block_q),
                     lambda b, h, j, i: (b, h, 0, i)),
    ]
    dkv_inputs = [qp, kp, vp, dop, lsep, dp_]

    def _aux_spec_t(a):
        bdim = 0 if a.shape[0] == 1 else None
        hdim = 0 if a.shape[1] == 1 else None
        return pl.BlockSpec(
            (1, 1, block_q, block_kv),
            lambda b, h, j, i, bd=bdim, hd=hdim: (
                bd if bd is not None else b,
                hd if hd is not None else h, i, j),
        )

    if has_mask:
        dkv_specs.append(_aux_spec_t(mp)); dkv_inputs.append(mp)
    if has_bias:
        dkv_specs.append(_aux_spec_t(bp)); dkv_inputs.append(bp)

    dkv_kernel = _make_dkv_kernel(
        block_q=block_q, block_kv=block_kv, num_q_blocks=num_q_blocks,
        q_len=q_len, kv_len=kv_len, scale=scale, causal=causal,
        window_size=window_size, has_mask=has_mask, has_bias=has_bias,
        needs_struct_mask=needs_struct_mask, out_dtype=jnp.float32,
        precision=precision,
    )
    dk_full, dv_full = pl.pallas_call(
        dkv_kernel,
        grid=(batch, q_heads, num_kv_blocks, num_q_blocks),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda b, h, j, i: (b, h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, q_heads, c_pad, d_pad),
                                 jnp.float32),
            jax.ShapeDtypeStruct((batch, q_heads, c_pad, d_pad),
                                 jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*dkv_inputs)

    if group > 1:
        dk_full = dk_full.reshape(
            batch, kv_heads, group, c_pad, d_pad).sum(axis=2)
        dv_full = dv_full.reshape(
            batch, kv_heads, group, c_pad, d_pad).sum(axis=2)
    dk = dk_full[:, :, :kv_len, :head_dim].astype(k.dtype)
    dv = dv_full[:, :, :kv_len, :head_dim].astype(v.dtype)

    if compute_dbias:
        return dq, dk, dv, dbias
    return dq, dk, dv


# --------------------------------------------------------------------------
# custom_vjp wiring
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_attention_vjp(
    q, k, v, mask, bias,
    causal, window_size, scale, block_q, block_kv, interpret,
):
    return flash_attention_forward(
        q, k, v, causal=causal, window_size=window_size, mask=mask,
        bias=bias, scale=scale, block_q=block_q, block_kv=block_kv,
        interpret=interpret,
    )


def _vjp_fwd(q, k, v, mask, bias,
             causal, window_size, scale, block_q, block_kv, interpret):
    o, lse = flash_attention_forward(
        q, k, v, causal=causal, window_size=window_size, mask=mask,
        bias=bias, scale=scale, block_q=block_q, block_kv=block_kv,
        interpret=interpret,
    )
    return (o, lse), (q, k, v, mask, bias, o, lse)


def _vjp_bwd(causal, window_size, scale, block_q, block_kv, interpret,
             residuals, cotangents):
    q, k, v, mask, bias, o, lse = residuals
    do, _dlse = cotangents
    out = flash_attention_backward(
        q, k, v, do, o, lse,
        causal=causal, window_size=window_size, mask=mask, bias=bias,
        scale=scale, block_q=block_q, block_kv=block_kv,
        interpret=interpret, compute_dbias=bias is not None,
    )
    if bias is not None:
        dq, dk, dv, dbias = out
    else:
        dq, dk, dv = out
        dbias = None
    dmask = None
    if mask is not None:
        # Boolean/integer mask is non-differentiable.
        dmask = jnp.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask, dbias


_flash_attention_vjp.defvjp(_vjp_fwd, _vjp_bwd)
