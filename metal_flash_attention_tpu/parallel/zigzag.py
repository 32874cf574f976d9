"""Zigzag (load-balanced) causal ring attention.

Plain causal ring attention over contiguous shards is imbalanced: the
chip holding the first Q chunk attends one KV chunk while the last
chip attends all of them — wall-clock is the maximum, so half the ring
idles.  The zigzag layout splits the sequence into 2n chunks and gives
chip i the PAIR (i, 2n-1-i); under causal attention every chip then
owns exactly (i+1) + (2n-i) = 2n+1 visible chunk-pairs — identical by
construction — and every ring step does the same two full-rate
chunk-pair products:

    step s>0, src = (my - s) mod n:
      src < my:  [q_lo; q_hi] x k_lo   (one fused call, both full)
      src > my:  q_hi x [k_lo; k_hi]   (one fused call, both full)
    step 0 (src == my):
      diag(q_lo, k_lo), diag(q_hi, k_hi), full(q_hi, k_lo)

The per-chunk partials merge with the associative online-softmax
combine (the reference's (m, l, O) merge lifted inter-chip, SURVEY.md
§5); the backward rotates dK/dV accumulators with the KV shards like
parallel/ring_attention.py, with every chunk-pair gradient recomputed
from the *global* L residual.

Callers lay out the sequence with :func:`zigzag_shard` before
sharding, and undo it with :func:`zigzag_unshard`.
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


def zigzag_order(n_chips: int) -> list[int]:
    """Chunk order such that a contiguous split over chips gives chip
    i the chunks (i, 2n-1-i)."""
    order = []
    for i in range(n_chips):
        order.extend([i, 2 * n_chips - 1 - i])
    return order


def zigzag_shard(x: jax.Array, n_chips: int, axis: int = 2) -> jax.Array:
    """Permute the sequence axis into zigzag chunk order (apply before
    placing the array on a context-sharded mesh)."""
    seq = x.shape[axis]
    assert seq % (2 * n_chips) == 0, (seq, n_chips)
    chunk = seq // (2 * n_chips)
    chunks = jnp.split(x, 2 * n_chips, axis=axis)
    return jnp.concatenate([chunks[c] for c in zigzag_order(n_chips)],
                           axis=axis)


def zigzag_unshard(x: jax.Array, n_chips: int, axis: int = 2) -> jax.Array:
    """Inverse of :func:`zigzag_shard`."""
    order = zigzag_order(n_chips)
    inverse = [0] * len(order)
    for pos, c in enumerate(order):
        inverse[c] = pos
    chunks = jnp.split(x, 2 * n_chips, axis=axis)
    return jnp.concatenate([chunks[p] for p in inverse], axis=axis)


def _merge(o, lse, o_i, lse_i):
    lse_new = jnp.logaddexp(lse, lse_i)
    safe = jnp.where(jnp.isfinite(lse_new), lse_new, 0.0)
    w_old = jnp.where(jnp.isfinite(lse), jnp.exp(lse - safe), 0.0)
    w_new = jnp.where(jnp.isfinite(lse_i), jnp.exp(lse_i - safe), 0.0)
    return o * w_old[..., None] + o_i * w_new[..., None], lse_new


def _zigzag_fwd_local(q, k_local, v_local, *, axis_name, n, scale,
                      block_q, block_kv):
    """Per-shard forward.  Local arrays hold [chunk_lo; chunk_hi]."""
    my = jax.lax.axis_index(axis_name)
    b, h, two_chunk, d = q.shape
    chunk = two_chunk // 2
    q_lo, q_hi = q[:, :, :chunk], q[:, :, chunk:]

    def attend(q_, k_, v_, causal):
        o_, lse_ = flash_attention_forward(
            q_, k_, v_, causal=causal, scale=scale,
            block_q=block_q, block_kv=block_kv)
        return o_.astype(jnp.float32), lse_

    # Step 0: both diagonals + the intra-shard lower block.
    o_lo, lse_lo = attend(q_lo, k_local[:, :, :chunk],
                          v_local[:, :, :chunk], True)
    o_hi, lse_hi = attend(q_hi, k_local[:, :, chunk:],
                          v_local[:, :, chunk:], True)
    o_hi2, lse_hi2 = attend(q_hi, k_local[:, :, :chunk],
                            v_local[:, :, :chunk], False)
    o_hi, lse_hi = _merge(o_hi, lse_hi, o_hi2, lse_hi2)

    k_blk, v_blk = k_local, v_local
    for s in range(1, n):
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

        def low_branch(args):
            # src < my: whole local q attends k_lo of src, full.
            q_lo_, q_hi_, k_, v_ = args
            q_cat = jnp.concatenate([q_lo_, q_hi_], axis=2)
            o_, lse_ = attend(q_cat, k_[:, :, :chunk],
                              v_[:, :, :chunk], False)
            return (o_[:, :, :chunk], lse_[:, :, :chunk],
                    o_[:, :, chunk:], lse_[:, :, chunk:])

        def high_branch(args):
            # src > my: only q_hi attends, against both src chunks.
            q_lo_, q_hi_, k_, v_ = args
            o_, lse_ = attend(q_hi_, k_, v_, False)
            zo = jnp.zeros(q_lo_.shape, jnp.float32)
            zl = jnp.full(q_lo_.shape[:3], -jnp.inf, jnp.float32)
            return (zo, zl, o_, lse_)

        po_lo, plse_lo, po_hi, plse_hi = jax.lax.cond(
            my >= s, low_branch, high_branch, (q_lo, q_hi, k_blk, v_blk))
        o_lo, lse_lo = _merge(o_lo, lse_lo, po_lo, plse_lo)
        o_hi, lse_hi = _merge(o_hi, lse_hi, po_hi, plse_hi)

    o = jnp.concatenate([o_lo, o_hi], axis=2).astype(q.dtype)
    lse = jnp.concatenate([lse_lo, lse_hi], axis=2)
    return o, lse


def _zigzag_bwd_local(q, k_local, v_local, do, o, lse, *, axis_name, n,
                      scale, block_q, block_kv):
    """Per-shard backward: dK/dV accumulators rotate with the shards;
    every chunk-pair contribution is recomputed from the global L."""
    my = jax.lax.axis_index(axis_name)
    chunk = q.shape[2] // 2
    q_lo, q_hi = q[:, :, :chunk], q[:, :, chunk:]
    do_lo, do_hi = do[:, :, :chunk], do[:, :, chunk:]
    o_lo, o_hi = o[:, :, :chunk], o[:, :, chunk:]
    lse_lo, lse_hi = lse[:, :, :chunk], lse[:, :, chunk:]

    def bwd(q_, k_, v_, do_, o_, lse_, causal):
        dq_, dk_, dv_ = flash_attention_backward(
            q_, k_, v_, do_, o_, lse_, causal=causal, scale=scale,
            block_q=block_q, block_kv=block_kv)
        return (dq_.astype(jnp.float32), dk_.astype(jnp.float32),
                dv_.astype(jnp.float32))

    # Step 0 (intra-shard).
    dq_lo, dk_lo, dv_lo = bwd(q_lo, k_local[:, :, :chunk],
                              v_local[:, :, :chunk], do_lo, o_lo,
                              lse_lo, True)
    dq_hi, dk_hi, dv_hi = bwd(q_hi, k_local[:, :, chunk:],
                              v_local[:, :, chunk:], do_hi, o_hi,
                              lse_hi, True)
    dq2, dk2, dv2 = bwd(q_hi, k_local[:, :, :chunk],
                        v_local[:, :, :chunk], do_hi, o_hi, lse_hi,
                        False)
    dq_hi += dq2
    dk_lo += dk2
    dv_lo += dv2
    dk_rot = jnp.concatenate([dk_lo, dk_hi], axis=2)
    dv_rot = jnp.concatenate([dv_lo, dv_hi], axis=2)

    k_blk, v_blk = k_local, v_local
    for s in range(1, n):
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        dk_rot = jax.lax.ppermute(dk_rot, axis_name, perm)
        dv_rot = jax.lax.ppermute(dv_rot, axis_name, perm)

        def low_branch(args):
            q_lo_, q_hi_, k_, v_ = args
            q_cat = jnp.concatenate([q_lo_, q_hi_], axis=2)
            do_cat = jnp.concatenate([do_lo, do_hi], axis=2)
            o_cat = jnp.concatenate([o_lo, o_hi], axis=2)
            lse_cat = jnp.concatenate([lse_lo, lse_hi], axis=2)
            dq_, dk_, dv_ = bwd(q_cat, k_[:, :, :chunk],
                                v_[:, :, :chunk], do_cat, o_cat,
                                lse_cat, False)
            zk = jnp.zeros((dk_.shape[0], dk_.shape[1], chunk,
                            dk_.shape[3]), jnp.float32)
            return (dq_[:, :, :chunk], dq_[:, :, chunk:],
                    jnp.concatenate([dk_, zk], axis=2),
                    jnp.concatenate([dv_, zk], axis=2))

        def high_branch(args):
            q_lo_, q_hi_, k_, v_ = args
            dq_, dk_, dv_ = bwd(q_hi_, k_, v_, do_hi, o_hi, lse_hi,
                                False)
            zq = jnp.zeros(q_lo_.shape, jnp.float32)
            return (zq, dq_, dk_, dv_)

        pdq_lo, pdq_hi, pdk, pdv = jax.lax.cond(
            my >= s, low_branch, high_branch, (q_lo, q_hi, k_blk, v_blk))
        dq_lo += pdq_lo
        dq_hi += pdq_hi
        dk_rot += pdk
        dv_rot += pdv

    # One closing hop delivers each shard's KV gradient home.
    perm = [(i, (i + 1) % n) for i in range(n)]
    dk = jax.lax.ppermute(dk_rot, axis_name, perm)
    dv = jax.lax.ppermute(dv_rot, axis_name, perm)
    dq = jnp.concatenate([dq_lo, dq_hi], axis=2)
    return (dq.astype(q.dtype), dk.astype(k_local.dtype),
            dv.astype(v_local.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _zigzag_attn(q, k, v, axis_name, n, scale, block_q, block_kv):
    return _zigzag_fwd_local(q, k, v, axis_name=axis_name, n=n,
                             scale=scale, block_q=block_q,
                             block_kv=block_kv)


def _zigzag_fwd(q, k, v, axis_name, n, scale, block_q, block_kv):
    o, lse = _zigzag_fwd_local(q, k, v, axis_name=axis_name, n=n,
                               scale=scale, block_q=block_q,
                               block_kv=block_kv)
    return (o, lse), (q, k, v, o, lse)


def _zigzag_bwd(axis_name, n, scale, block_q, block_kv, residuals,
                cotangents):
    q, k, v, o, lse = residuals
    do, _dlse = cotangents
    return _zigzag_bwd_local(
        q, k, v, do.astype(q.dtype), o, lse, axis_name=axis_name, n=n,
        scale=scale, block_q=block_q, block_kv=block_kv)


_zigzag_attn.defvjp(_zigzag_fwd, _zigzag_bwd)


def zigzag_ring_attention(
    mesh: Mesh,
    *,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    return_residuals: bool = False,
):
    """Load-balanced causal ring attention over ``mesh``'s context axis.

    Inputs must be in zigzag order (:func:`zigzag_shard` on the seq
    axis) and sharded P(data, heads, context); the output comes back in
    zigzag order (undo with :func:`zigzag_unshard`).  Differentiable.
    """
    spec = P(DATA_AXIS, HEAD_AXIS, CONTEXT_AXIS, None)
    lse_spec = P(DATA_AXIS, HEAD_AXIS, CONTEXT_AXIS)

    def local(q, k, v):
        o, lse = _zigzag_attn(
            q, k, v, CONTEXT_AXIS, mesh.shape[CONTEXT_AXIS],
            scale, block_q, block_kv)
        return (o, lse) if return_residuals else o

    out_specs = (spec, lse_spec) if return_residuals else spec
    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=out_specs, check_vma=False,
    ))
