"""Ring attention: KV shards rotate around the context axis via
`ppermute` while each chip computes fused attention on the block in
front of it.

This is the long-context tier (BASELINE config 5: 128K context,
KV-sharded across hosts).  The per-step combine is the reference's
associative online-softmax merge
(`AttentionKernel+Softmax.swift:524-581`, identified as the ring-step
merge in SURVEY.md §5) with the (m, l) pair folded into the logsumexp
residual L that the local kernel already emits:

    lse' = logaddexp(lse, lse_i)
    O'   = O  * exp(lse  - lse')  +  O_i * exp(lse_i - lse')

Communication is point-to-point neighbor `ppermute` riding ICI, one
KV shard per step, overlapped by XLA with the per-step kernel compute.
Causal masking is resolved at *chunk* granularity: a KV chunk strictly
before my Q chunk is attended in full (no mask evaluation at all), the
diagonal chunk runs the local causal kernel, and future chunks are
skipped entirely — the reference's block-skip
(`AttentionKernel+Source.swift:365-381`) at inter-chip scale.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from metal_flash_attention_tpu.ops.flash_attention import (
    flash_attention_forward,
)
from metal_flash_attention_tpu.ops.flash_attention_bwd import (
    flash_attention_backward,
)
from metal_flash_attention_tpu.parallel.mesh import (
    CONTEXT_AXIS,
    DATA_AXIS,
    HEAD_AXIS,
)


def _merge(o, lse, o_i, lse_i):
    """Associative online-softmax merge of two normalized partials."""
    lse_new = jnp.logaddexp(lse, lse_i)
    safe = jnp.where(jnp.isfinite(lse_new), lse_new, 0.0)
    w_old = jnp.where(jnp.isfinite(lse), jnp.exp(lse - safe), 0.0)
    w_new = jnp.where(jnp.isfinite(lse_i), jnp.exp(lse_i - safe), 0.0)
    o_out = o * w_old[..., None] + o_i * w_new[..., None]
    return o_out, lse_new


def _ring_attention_local(
    q, k_local, v_local, *, axis_name, n, causal, scale, block_q, block_kv,
):
    """Per-shard body (runs under shard_map on the context axis).
    ``n`` is the static ring size (mesh axis extent)."""
    my = jax.lax.axis_index(axis_name)

    b, hq, r_loc, d = q.shape
    o = jnp.zeros((b, hq, r_loc, d), jnp.float32)
    lse = jnp.full((b, hq, r_loc), -jnp.inf, jnp.float32)

    def full_attn(args):
        q_, k_, v_ = args
        o_i, lse_i = flash_attention_forward(
            q_, k_, v_, scale=scale, block_q=block_q, block_kv=block_kv)
        return o_i.astype(jnp.float32), lse_i

    def diag_attn(args):
        q_, k_, v_ = args
        o_i, lse_i = flash_attention_forward(
            q_, k_, v_, causal=True, scale=scale,
            block_q=block_q, block_kv=block_kv)
        return o_i.astype(jnp.float32), lse_i

    def skip(args):
        q_, _, _ = args
        return (jnp.zeros(q_.shape, jnp.float32),
                jnp.full(q_.shape[:-1], -jnp.inf, jnp.float32))

    k_blk, v_blk = k_local, v_local
    for step in range(n):
        src = (my - step) % n
        if causal:
            # Chunk-level causal dispatch (traced predicate, static
            # kernels): future chunk -> skip, diagonal -> causal
            # kernel, past -> unmasked kernel.
            o_i, lse_i = jax.lax.cond(
                src > my, skip,
                lambda a: jax.lax.cond(src == my, diag_attn, full_attn, a),
                (q, k_blk, v_blk))
        else:
            o_i, lse_i = full_attn((q, k_blk, v_blk))
        o, lse = _merge(o, lse, o_i, lse_i)
        if step < n - 1:
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
    return o.astype(q.dtype), lse


def _ring_attention_bwd_local(
    q, k_local, v_local, do, o, lse,
    *, axis_name, n, causal, scale, block_q, block_kv,
):
    """Ring backward: K/V shards rotate exactly as in the forward, and
    the dK/dV accumulators *travel with them* — after the last step one
    extra `ppermute` delivers each shard's gradient home.  Per step the
    local two-kernel backward recomputes P from the *global* L residual,
    so each chunk pair's contribution is the exact partial derivative
    (the same property that makes the reference's L-based recompute
    work intra-kernel, `AttentionKernel+Source.swift:419-518`)."""
    my = jax.lax.axis_index(axis_name)
    dq = jnp.zeros(q.shape, jnp.float32)
    dk_rot = jnp.zeros(k_local.shape, jnp.float32)
    dv_rot = jnp.zeros(v_local.shape, jnp.float32)

    def bwd_chunk(args, chunk_causal):
        q_, k_, v_ = args
        return flash_attention_backward(
            q_, k_, v_, do, o, lse, causal=chunk_causal, scale=scale,
            block_q=block_q, block_kv=block_kv)

    def full(args):
        dq_, dk_, dv_ = bwd_chunk(args, False)
        return (dq_.astype(jnp.float32), dk_.astype(jnp.float32),
                dv_.astype(jnp.float32))

    def diag(args):
        dq_, dk_, dv_ = bwd_chunk(args, True)
        return (dq_.astype(jnp.float32), dk_.astype(jnp.float32),
                dv_.astype(jnp.float32))

    def skip(args):
        q_, k_, v_ = args
        return (jnp.zeros(q_.shape, jnp.float32),
                jnp.zeros(k_.shape, jnp.float32),
                jnp.zeros(v_.shape, jnp.float32))

    k_blk, v_blk = k_local, v_local
    for step in range(n):
        src = (my - step) % n
        if causal:
            dq_p, dk_p, dv_p = jax.lax.cond(
                src > my, skip,
                lambda a: jax.lax.cond(src == my, diag, full, a),
                (q, k_blk, v_blk))
        else:
            dq_p, dk_p, dv_p = full((q, k_blk, v_blk))
        dq += dq_p
        dk_rot += dk_p
        dv_rot += dv_p
        if step < n - 1:
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            dk_rot = jax.lax.ppermute(dk_rot, axis_name, perm)
            dv_rot = jax.lax.ppermute(dv_rot, axis_name, perm)
    # After n-1 rotations each chip holds the gradient for chunk
    # (my + 1) % n; one more hop delivers it home.
    perm = [(i, (i + 1) % n) for i in range(n)]
    dk = jax.lax.ppermute(dk_rot, axis_name, perm)
    dv = jax.lax.ppermute(dv_rot, axis_name, perm)
    return dq.astype(q.dtype), dk.astype(k_local.dtype), \
        dv.astype(v_local.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _ring_attn(q, k, v, axis_name, n, causal, scale, block_q, block_kv):
    return _ring_attention_local(
        q, k, v, axis_name=axis_name, n=n, causal=causal, scale=scale,
        block_q=block_q, block_kv=block_kv)


def _ring_attn_fwd(q, k, v, axis_name, n, causal, scale, block_q,
                   block_kv):
    o, lse = _ring_attention_local(
        q, k, v, axis_name=axis_name, n=n, causal=causal, scale=scale,
        block_q=block_q, block_kv=block_kv)
    return (o, lse), (q, k, v, o, lse)


def _ring_attn_bwd(axis_name, n, causal, scale, block_q, block_kv,
                   residuals, cotangents):
    q, k, v, o, lse = residuals
    do, _dlse = cotangents
    return _ring_attention_bwd_local(
        q, k, v, do.astype(q.dtype), o, lse,
        axis_name=axis_name, n=n, causal=causal, scale=scale,
        block_q=block_q, block_kv=block_kv)


_ring_attn.defvjp(_ring_attn_fwd, _ring_attn_bwd)


def ring_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    return_residuals: bool = False,
):
    """Build a jitted ring-attention callable over ``mesh``'s context
    axis (optionally composed with data/head axes).  Differentiable:
    the backward ring rotates dK/dV accumulators with the KV shards.

    q, k, v: [batch, heads, seq, d] with seq sharded over the context
    axis (seq must divide evenly).  Heads/data shard as usual — the
    ring only runs along CONTEXT_AXIS.
    """
    spec = P(DATA_AXIS, HEAD_AXIS, CONTEXT_AXIS, None)
    lse_spec = P(DATA_AXIS, HEAD_AXIS, CONTEXT_AXIS)

    def local(q, k, v):
        o, lse = _ring_attn(
            q, k, v, CONTEXT_AXIS, mesh.shape[CONTEXT_AXIS],
            causal, scale, block_q, block_kv)
        return (o, lse) if return_residuals else o

    out_specs = (spec, lse_spec) if return_residuals else spec
    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=out_specs, check_vma=False,
    ))
