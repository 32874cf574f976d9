"""Head/data-parallel sharded attention over a device mesh.

The zero-communication tier of distribution: batch shards over the
data axis, query heads (with co-located GQA KV heads) over the heads
axis.  Each device runs the local fused kernel; no collectives are
needed during attention itself — communication happens later in the
output projection (`jax.lax.psum` there, not here).

Also provides context-parallel attention ("approach 2"): each device
computes partial attention over its KV shard and the partials are
merged with the online-softmax combine across chips (pmax + psum) —
the reference's in-kernel (m, l, O) merge
(`AttentionKernel+Softmax.swift:524-581`) lifted to the mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from metal_flash_attention_tpu.ops.flash_attention import (
    flash_attention_forward,
)
from metal_flash_attention_tpu.parallel.mesh import (
    CONTEXT_AXIS,
    DATA_AXIS,
    HEAD_AXIS,
)


def sharded_flash_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    window_size: Optional[int] = None,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
):
    """Head+data-parallel fused attention.

    Returns a jitted callable (q, k, v) -> o with
    q: [batch, q_heads, n, d] sharded P(data, heads);
    k/v: [batch, kv_heads, n, d] sharded P(data, heads) (GQA co-located).
    """
    spec = P(DATA_AXIS, HEAD_AXIS, None, None)

    def local(q, k, v):
        o, _ = flash_attention_forward(
            q, k, v, causal=causal, window_size=window_size, scale=scale,
            block_q=block_q, block_kv=block_kv,
        )
        return o

    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    ))


def _merge_partials(o_local, lse_local, axis_name):
    """Cross-chip online-softmax combine: merge per-shard partial
    attention (o_i, lse_i) into the exact global result.

    o = sum_i o_i * exp(lse_i - lse_total);  lse_total = log sum_i e^lse_i.
    This is the associative (m, l, O) merge with (m, l) folded into the
    logsumexp.
    """
    m_global = jax.lax.pmax(lse_local, axis_name=axis_name)
    # Guard fully-masked shards (lse = -inf).
    m_safe = jnp.where(jnp.isfinite(m_global), m_global, 0.0)
    w = jnp.exp(jnp.where(jnp.isfinite(lse_local),
                          lse_local - m_safe, -jnp.inf))
    l_global = jax.lax.psum(w, axis_name=axis_name)
    o_global = jax.lax.psum(o_local * w[..., None], axis_name=axis_name)
    safe_l = jnp.where(l_global == 0.0, 1.0, l_global)
    return o_global / safe_l[..., None]


def context_parallel_attention(
    mesh: Mesh,
    *,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
):
    """KV-sequence-sharded attention with cross-chip softmax combine.

    q replicated over the context axis; k/v sharded on their sequence
    dim.  Each chip computes partial attention over its KV shard; the
    partials are merged with pmax+psum.  Communication per query
    position is O(d_head + 1) — independent of context length.
    """
    q_spec = P(DATA_AXIS, HEAD_AXIS, None, None)
    kv_spec = P(DATA_AXIS, HEAD_AXIS, CONTEXT_AXIS, None)

    def local(q, k_shard, v_shard):
        o_i, lse_i = flash_attention_forward(
            q, k_shard, v_shard, scale=scale,
            block_q=block_q, block_kv=block_kv,
        )
        return _merge_partials(
            o_i.astype(jnp.float32), lse_i, CONTEXT_AXIS).astype(q.dtype)

    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(q_spec, kv_spec, kv_spec),
        out_specs=q_spec, check_vma=False,
    ))


def context_parallel_decode(
    mesh: Mesh,
    *,
    scale: Optional[float] = None,
    block_kv: int = 2048,
):
    """Decode attention over a context-sharded KV cache.

    The serving-scale tier of BASELINE config 5: each chip holds a
    contiguous slice of every sequence's KV cache; one decode step runs
    `ops.flash_decode` on the local slice (with the live length clipped
    into the slice) and merges partials with the cross-chip
    online-softmax combine.  Communication per token is O(heads * d) —
    independent of context length.

    Returns a jitted callable (q [b, qh, d], k/v [b, kvh, S, d] sharded
    on S, kv_lens [b]) -> o [b, qh, d].
    """
    from metal_flash_attention_tpu.ops.flash_decode import flash_decode

    q_spec = P(DATA_AXIS, HEAD_AXIS, None)
    kv_spec = P(DATA_AXIS, HEAD_AXIS, CONTEXT_AXIS, None)
    len_spec = P(DATA_AXIS)

    def local(q, k_shard, v_shard, kv_lens):
        shard = jax.lax.axis_index(CONTEXT_AXIS)
        s_local = k_shard.shape[2]
        start = shard * s_local
        # Live length within this shard's slice.
        local_lens = jnp.clip(kv_lens - start, 0, s_local).astype(jnp.int32)
        o_i, lse_i = flash_decode(
            q, k_shard, v_shard, kv_lens=local_lens, scale=scale,
            block_kv=min(block_kv, s_local), return_residuals=True)
        return _merge_partials(
            o_i.astype(jnp.float32), lse_i, CONTEXT_AXIS).astype(q.dtype)

    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(q_spec, kv_spec, kv_spec, len_spec),
        out_specs=q_spec, check_vma=False,
    ))


def shard_paged_cache_pages(cache, n_dev: int):
    """Host-side prep for :func:`context_parallel_paged_decode`: split
    a global :class:`PagedKVCache` so device ``d`` holds global pages
    ``{g : g % n_dev == d}`` (local id ``g // n_dev``).

    Per-sequence table rows keep their original page ORDER filtered to
    each device, so the (single) partial tail page stays LAST in its
    device's walk — the only ordering the masked kernel needs; full
    pages are order-invariant under the online softmax.  Returns
    ``(k_stack, v_stack, tables, lens)`` with a leading device axis to
    shard over the context mesh axis.
    """
    import numpy as np

    kp = np.asarray(cache.k_pages)
    vp = np.asarray(cache.v_pages)
    tbl = np.asarray(cache.page_table)
    lens = np.asarray(cache.lengths)
    num_pages, kvh, page, d = kp.shape
    b, mp = tbl.shape
    p_local = -(-num_pages // n_dev)
    k_stack = np.zeros((n_dev, p_local, kvh, page, d), kp.dtype)
    v_stack = np.zeros_like(k_stack)
    for g in range(num_pages):
        k_stack[g % n_dev, g // n_dev] = kp[g]
        v_stack[g % n_dev, g // n_dev] = vp[g]
    tables = np.zeros((n_dev, b, mp), np.int32)
    lens_out = np.zeros((n_dev, b), np.int32)
    for i in range(b):
        n_live = -(-int(lens[i]) // page)
        tail_tokens = int(lens[i]) - (n_live - 1) * page \
            if n_live else 0
        for dev in range(n_dev):
            row = [g for g in tbl[i][:n_live] if g % n_dev == dev]
            tables[dev, i, :len(row)] = [g // n_dev for g in row]
            t = 0
            for j, g in enumerate(tbl[i][:n_live]):
                if g % n_dev != dev:
                    continue
                t += tail_tokens if j == n_live - 1 else page
            lens_out[dev, i] = t
    return k_stack, v_stack, tables, lens_out


def context_parallel_paged_decode(mesh: Mesh):
    """Paged decode over page POOLS sharded across the context axis —
    long-context serving on a mesh: each chip owns an equal slice of
    the page pool, walks only its local pages for its local token
    count, and one online-softmax combine (`_merge_partials`) merges
    the per-chip partials.  Communication per token is O(heads * d),
    independent of context length — the paged counterpart of
    :func:`context_parallel_decode`, keeping vLLM-style block tables
    while scaling context over ICI.

    Decode attends every cached token, and the online softmax is
    column-order invariant, so pages may scatter across chips freely;
    only each sequence's partial tail page must sit last in its
    device's walk (see :func:`shard_paged_cache_pages`).

    Returns a jitted callable ``(q [b, qh, d] replicated,
    k_stack/v_stack [n_dev, P_local, kvh, page, d],
    tables [n_dev, b, max_pages], lens [n_dev, b]) -> o [b, qh, d]``.
    """
    from metal_flash_attention_tpu.ops.paged_attention import (
        PagedKVCache,
        paged_decode,
    )

    q_spec = P(None, None, None)
    pool_spec = P(CONTEXT_AXIS, None, None, None, None)
    tbl_spec = P(CONTEXT_AXIS, None, None)
    len_spec = P(CONTEXT_AXIS, None)

    def local(q, kp, vp, tbl, lens):
        cache = PagedKVCache(kp[0], vp[0], tbl[0], lens[0])
        o_i, lse_i = paged_decode(q, cache, return_residuals=True)
        return _merge_partials(
            o_i.astype(jnp.float32), lse_i, CONTEXT_AXIS
        ).astype(q.dtype)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(q_spec, pool_spec, pool_spec, tbl_spec, len_spec),
        out_specs=q_spec, check_vma=False,
    ))
