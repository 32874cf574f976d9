"""Paged decode attention: block-table KV pool."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.utils.tolerances import fp32_kernel_tol

from metal_flash_attention_tpu.ops.paged_attention import (
    PagedKVCache,
    init_paged_cache,
    paged_append,
    paged_decode,
)
from tests.test_decode import golden_decode


def build_paged(rng, *, batch, kv_heads, d, page_size, lengths,
                max_pages, shuffle=True):
    """Build a paged cache holding random data, plus the equivalent
    dense [batch, kv_heads, S, d] arrays for the golden model."""
    num_pages = batch * max_pages + 3
    k_pool = rng.standard_normal(
        (num_pages, kv_heads, page_size, d)).astype(np.float32)
    v_pool = rng.standard_normal(
        (num_pages, kv_heads, page_size, d)).astype(np.float32)
    # Assign pages non-contiguously (shuffled) to exercise the
    # indirection; page 0 is kept as the "null" page.
    perm = np.arange(1, num_pages)
    if shuffle:
        np.random.default_rng(7).shuffle(perm)
    table = np.zeros((batch, max_pages), np.int32)
    s_max = max_pages * page_size
    k_dense = np.zeros((batch, kv_heads, s_max, d), np.float32)
    v_dense = np.zeros((batch, kv_heads, s_max, d), np.float32)
    next_page = 0
    for b in range(batch):
        n_pages = -(-lengths[b] // page_size)
        for p in range(n_pages):
            pid = perm[next_page]; next_page += 1
            table[b, p] = pid
            lo, hi = p * page_size, (p + 1) * page_size
            k_dense[b, :, lo:hi] = k_pool[pid].transpose(0, 1, 2)
            v_dense[b, :, lo:hi] = v_pool[pid]
    cache = PagedKVCache(
        k_pages=jnp.asarray(k_pool), v_pages=jnp.asarray(v_pool),
        page_table=jnp.asarray(table),
        lengths=jnp.asarray(lengths, jnp.int32))
    return cache, jnp.asarray(k_dense), jnp.asarray(v_dense)


@pytest.mark.parametrize("q_heads,kv_heads,d", [(4, 4, 64), (8, 2, 128)])
def test_paged_decode_matches_golden(rng, q_heads, kv_heads, d):
    batch, page_size, max_pages = 2, 128, 4
    lengths = [300, 512]
    cache, kd, vd = build_paged(
        rng, batch=batch, kv_heads=kv_heads, d=d, page_size=page_size,
        lengths=lengths, max_pages=max_pages)
    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.float32)
    o = paged_decode(q, cache)
    o_ref = golden_decode(q, kd, vd, kv_lens=cache.lengths)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


def test_paged_decode_ragged_and_partial_page(rng):
    batch, kv_heads, d, page_size, max_pages = 3, 2, 64, 128, 4
    lengths = [1, 129, 500]   # partial pages everywhere
    cache, kd, vd = build_paged(
        rng, batch=batch, kv_heads=kv_heads, d=d, page_size=page_size,
        lengths=lengths, max_pages=max_pages)
    q = jnp.asarray(rng.standard_normal((batch, 2, d)), jnp.float32)
    o = paged_decode(q, cache)
    o_ref = golden_decode(q, kd, vd, kv_lens=cache.lengths)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


def test_paged_residuals_merge_with_dense(rng):
    """Paged partials merge with a dense segment by the lse combine —
    the quantized-prefix + tail serving pattern over pages."""
    batch, h, d, page_size, max_pages = 1, 2, 64, 128, 2
    cache, kd, vd = build_paged(
        rng, batch=batch, kv_heads=h, d=d, page_size=page_size,
        lengths=[256], max_pages=max_pages)
    q = jnp.asarray(rng.standard_normal((batch, h, d)), jnp.float32)
    tail_k = jnp.asarray(rng.standard_normal((batch, h, 64, d)), jnp.float32)
    tail_v = jnp.asarray(rng.standard_normal((batch, h, 64, d)), jnp.float32)

    from metal_flash_attention_tpu.ops.flash_decode import flash_decode
    o1, lse1 = paged_decode(q, cache, return_residuals=True)
    o2, lse2 = flash_decode(q, tail_k, tail_v, return_residuals=True,
                            block_kv=128)
    lse = jnp.logaddexp(lse1, lse2)
    o = (o1 * jnp.exp(lse1 - lse)[..., None]
         + o2 * jnp.exp(lse2 - lse)[..., None])

    k_all = jnp.concatenate([kd, tail_k], axis=2)
    v_all = jnp.concatenate([vd, tail_v], axis=2)
    o_ref = golden_decode(q, k_all, v_all)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


def test_paged_append_then_decode(rng):
    batch, kv_heads, q_heads, d, page_size = 2, 2, 4, 64, 128
    cache = init_paged_cache(
        num_pages=8, kv_heads=kv_heads, page_size=page_size,
        head_dim=d, batch=batch, max_pages=2, dtype=jnp.float32)
    # Assign disjoint pages: seq0 -> pages 1,2; seq1 -> pages 3,4.
    cache = cache._replace(
        page_table=jnp.asarray([[1, 2], [3, 4]], jnp.int32))
    ks = rng.standard_normal((3, batch, kv_heads, d)).astype(np.float32)
    vs = rng.standard_normal((3, batch, kv_heads, d)).astype(np.float32)
    for t in range(3):
        cache = paged_append(cache, jnp.asarray(ks[t]), jnp.asarray(vs[t]))
    assert cache.lengths.tolist() == [3, 3]
    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.float32)
    o = paged_decode(q, cache)
    k_dense = jnp.asarray(ks).transpose(1, 2, 0, 3)  # [b, h, 3, d]
    v_dense = jnp.asarray(vs).transpose(1, 2, 0, 3)
    o_ref = golden_decode(q, k_dense, v_dense)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


def test_allocator_drives_paged_decode(rng):
    """End-to-end: the (native) page allocator hands out pages, the
    kernel walks them."""
    from metal_flash_attention_tpu.native.page_allocator import (
        make_page_allocator,
    )

    batch, kv_heads, q_heads, d, page_size = 2, 2, 2, 64, 128
    alloc = make_page_allocator(num_pages=16, page_size=page_size)
    max_pages = 4
    cache = init_paged_cache(
        num_pages=16, kv_heads=kv_heads, page_size=page_size,
        head_dim=d, batch=batch, max_pages=max_pages, dtype=jnp.float32)

    lengths = [200, 385]
    table = np.zeros((batch, max_pages), np.int32)
    k_dense = np.zeros((batch, kv_heads, max_pages * page_size, d),
                       np.float32)
    v_dense = np.zeros_like(k_dense)
    k_pages = np.asarray(cache.k_pages).copy()
    v_pages = np.asarray(cache.v_pages).copy()
    for b, n in enumerate(lengths):
        pages = alloc.reserve(seq=b, num_tokens=n)
        data_k = rng.standard_normal(
            (kv_heads, len(pages) * page_size, d)).astype(np.float32)
        data_v = rng.standard_normal(
            (kv_heads, len(pages) * page_size, d)).astype(np.float32)
        for pi, page in enumerate(pages):
            table[b, pi] = page
            # Pools are pre-padded to 128 lanes; write the logical d.
            k_pages[page, :, :, :d] = \
                data_k[:, pi * page_size:(pi + 1) * page_size]
            v_pages[page, :, :, :d] = \
                data_v[:, pi * page_size:(pi + 1) * page_size]
        k_dense[b, :, :data_k.shape[1]] = data_k
        v_dense[b, :, :data_v.shape[1]] = data_v
    cache = cache._replace(
        k_pages=jnp.asarray(k_pages), v_pages=jnp.asarray(v_pages),
        page_table=jnp.asarray(table),
        lengths=jnp.asarray(lengths, jnp.int32))

    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.float32)
    o = paged_decode(q, cache)
    o_ref = golden_decode(q, jnp.asarray(k_dense), jnp.asarray(v_dense),
                          kv_lens=cache.lengths)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()
    # Release returns capacity.
    alloc.release(0)
    alloc.release(1)
    assert alloc.free_pages == 15

@pytest.mark.parametrize("precision", ["INT8", "FP8_E4M3", "FP8_E5M2",
                                       "NF4"])
def test_paged_decode_quantized_kv(rng, precision):
    """Quantized pages (per-page scales) vs the float golden: must sit
    inside the quantized-KV tolerance tier (NF4: the 4-bit tier)."""
    from metal_flash_attention_tpu.descriptors.precision import (
        OperandPrecision,
    )
    from metal_flash_attention_tpu.ops.paged_attention import (
        quantize_paged,
    )
    from metal_flash_attention_tpu.utils.tolerances import QUANTIZED_KV_TOL

    batch, q_heads, kv_heads, d = 2, 8, 2, 128
    page_size, max_pages = 128, 4
    lengths = [300, 512]
    cache, kd, vd = build_paged(
        rng, batch=batch, kv_heads=kv_heads, d=d, page_size=page_size,
        lengths=lengths, max_pages=max_pages)
    qcache = quantize_paged(cache, OperandPrecision[precision])
    assert qcache.page_size == page_size
    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.float32)
    o = paged_decode(q, qcache)
    o_ref = golden_decode(q, kd, vd, kv_lens=cache.lengths)
    tol = 2e-1 if precision == "NF4" else QUANTIZED_KV_TOL.o
    assert float(jnp.max(jnp.abs(o - o_ref))) < tol


def test_paged_quantized_roundtrip_tighter_than_tier(rng):
    """Per-page scales should beat per-cache scales: INT8 error well
    under the tier on well-conditioned data."""
    from metal_flash_attention_tpu.descriptors.precision import (
        OperandPrecision,
    )
    from metal_flash_attention_tpu.ops.paged_attention import (
        quantize_paged,
    )

    batch, kv_heads, d, page_size, max_pages = 1, 2, 64, 128, 2
    cache, kd, vd = build_paged(
        rng, batch=batch, kv_heads=kv_heads, d=d, page_size=page_size,
        lengths=[256], max_pages=max_pages)
    qcache = quantize_paged(cache, OperandPrecision.INT8)
    q = jnp.asarray(rng.standard_normal((batch, 2, d)), jnp.float32)
    o = paged_decode(q, qcache)
    o_ref = golden_decode(q, kd, vd, kv_lens=cache.lengths)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 2e-2


def test_paged_decode_sliding_window(rng):
    """kv_starts: paged sliding-window decode (Gemma local layers over
    a paged pool) vs a golden with the pre-window prefix masked."""
    batch, kv_heads, d, page_size, max_pages = 3, 2, 64, 128, 4
    lengths = [512, 300, 64]
    window = 160
    cache, kd, vd = build_paged(
        rng, batch=batch, kv_heads=kv_heads, d=d, page_size=page_size,
        lengths=lengths, max_pages=max_pages)
    starts = jnp.maximum(cache.lengths - window, 0)
    q = jnp.asarray(rng.standard_normal((batch, 4, d)), jnp.float32)
    o = paged_decode(q, cache, kv_starts=starts)

    s = kd.shape[2]
    pos = jnp.arange(s)[None, None, :]
    live = jnp.logical_and(pos >= starts[:, None, None],
                           pos < cache.lengths[:, None, None])
    km = jnp.where(live[..., None], kd, 0.0)
    # golden with pre-window masked: recompute logits mask directly
    group = q.shape[1] // kv_heads
    kf = jnp.repeat(kd.astype(jnp.float32), group, axis=1)
    vf = jnp.repeat(vd.astype(jnp.float32), group, axis=1)
    logits = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), kf)
    logits /= jnp.sqrt(jnp.float32(d))
    logits = jnp.where(live, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    o_ref = jnp.einsum("bhs,bhsd->bhd", p, vf)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


def test_paged_decode_sliding_window_quantized(rng):
    from metal_flash_attention_tpu.descriptors.precision import (
        OperandPrecision,
    )
    from metal_flash_attention_tpu.ops.paged_attention import (
        quantize_paged,
    )

    batch, kv_heads, d, page_size, max_pages = 2, 2, 128, 128, 4
    lengths = [512, 450]
    cache, kd, vd = build_paged(
        rng, batch=batch, kv_heads=kv_heads, d=d, page_size=page_size,
        lengths=lengths, max_pages=max_pages)
    starts = jnp.asarray([384, 0], jnp.int32)
    q = jnp.asarray(rng.standard_normal((batch, 4, d)), jnp.float32)
    o = paged_decode(q, quantize_paged(cache, OperandPrecision.INT8),
                     kv_starts=starts)

    s = kd.shape[2]
    pos = jnp.arange(s)[None, None, :]
    live = jnp.logical_and(pos >= starts[:, None, None],
                           pos < cache.lengths[:, None, None])
    group = q.shape[1] // kv_heads
    kf = jnp.repeat(kd.astype(jnp.float32), group, axis=1)
    vf = jnp.repeat(vd.astype(jnp.float32), group, axis=1)
    logits = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), kf)
    logits /= jnp.sqrt(jnp.float32(d))
    logits = jnp.where(live, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    o_ref = jnp.einsum("bhs,bhsd->bhd", p, vf)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 5e-2


def test_paged_prefill_matches_causal_golden(rng):
    """Multi-token paged attention (chunked prefill / spec-decode
    verify): last q_chunk tokens, causal, vs the dense golden."""
    from metal_flash_attention_tpu.ops.paged_attention import (
        paged_prefill,
    )

    batch, kv_heads, q_heads, d = 2, 2, 4, 64
    page_size, max_pages, q_chunk = 128, 4, 16
    lengths = [300, 512]
    cache, kd, vd = build_paged(
        rng, batch=batch, kv_heads=kv_heads, d=d, page_size=page_size,
        lengths=lengths, max_pages=max_pages)
    q = jnp.asarray(rng.standard_normal((batch, q_heads, q_chunk, d)),
                    jnp.float32)
    o = paged_prefill(q, cache)

    group = q_heads // kv_heads
    s = kd.shape[2]
    kf = jnp.repeat(kd.astype(jnp.float32), group, axis=1)
    vf = jnp.repeat(vd.astype(jnp.float32), group, axis=1)
    logits = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32), kf)
    logits /= jnp.sqrt(jnp.float32(d))
    pos = jnp.arange(s)[None, None, None, :]
    qpos = (jnp.asarray(lengths, jnp.int32)[:, None, None, None]
            - q_chunk + jnp.arange(q_chunk)[None, None, :, None])
    live = pos <= qpos
    logits = jnp.where(live, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    o_ref = jnp.einsum("bhts,bhsd->bhtd", p, vf)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


def test_paged_prefill_quantized_and_residuals(rng):
    from metal_flash_attention_tpu.descriptors.precision import (
        OperandPrecision,
    )
    from metal_flash_attention_tpu.ops.paged_attention import (
        paged_prefill,
        quantize_paged,
    )

    batch, kv_heads, q_heads, d = 1, 2, 4, 128
    page_size, max_pages, q_chunk = 128, 4, 8
    lengths = [450]
    cache, kd, vd = build_paged(
        rng, batch=batch, kv_heads=kv_heads, d=d, page_size=page_size,
        lengths=lengths, max_pages=max_pages)
    q = jnp.asarray(rng.standard_normal((batch, q_heads, q_chunk, d)),
                    jnp.float32)
    o, lse = paged_prefill(q, quantize_paged(cache, OperandPrecision.INT8),
                           return_residuals=True)
    assert o.shape == q.shape and lse.shape == (batch, q_heads, q_chunk)

    group = q_heads // kv_heads
    s = kd.shape[2]
    kf = jnp.repeat(kd.astype(jnp.float32), group, axis=1)
    vf = jnp.repeat(vd.astype(jnp.float32), group, axis=1)
    logits = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32), kf)
    logits /= jnp.sqrt(jnp.float32(d))
    pos = jnp.arange(s)[None, None, None, :]
    qpos = (jnp.asarray(lengths, jnp.int32)[:, None, None, None]
            - q_chunk + jnp.arange(q_chunk)[None, None, :, None])
    logits = jnp.where(pos <= qpos, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    o_ref = jnp.einsum("bhts,bhsd->bhtd", p, vf)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 5e-2
    lse_ref = jax.nn.logsumexp(logits, axis=-1)
    assert float(jnp.max(jnp.abs(lse - lse_ref))) < 5e-2
