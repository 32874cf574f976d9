"""Packed-sequence (segment-id) attention.

Production training packs several documents into one sequence; the
segment-id compare happens in-kernel with O(N) inputs instead of an
O(N^2) external mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_forward,
)
from metal_flash_attention_tpu.ops.reference import attention_reference
from metal_flash_attention_tpu.utils.tolerances import (
    fp32_kernel_tol,
    max_abs_err,
)


def make_segments(rng, n, n_docs):
    """Random contiguous document boundaries."""
    cuts = np.sort(rng.choice(np.arange(1, n), n_docs - 1, replace=False))
    ids = np.zeros(n, np.int32)
    for c in cuts:
        ids[c:] += 1
    return ids


def seg_mask(q_ids, kv_ids):
    return q_ids[:, None] == kv_ids[None, :]


@pytest.mark.parametrize("n,d,n_docs", [(256, 64, 3), (300, 96, 5),
                                        (64, 32, 2)])
def test_segments_forward(rng, n, d, n_docs):
    ids = make_segments(rng, n, n_docs)
    q = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)
    segs = jnp.asarray(ids)[None]
    o, lse = flash_attention_forward(
        q, k, v, q_segment_ids=segs, kv_segment_ids=segs)
    m = jnp.asarray(seg_mask(ids, ids))
    outs = [attention_reference(q[0, h], k[0, h], v[0, h], mask=m)
            for h in range(2)]
    o_ref = jnp.stack(outs)[None]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_segments_with_causal(rng):
    n, d = 256, 64
    ids = make_segments(rng, n, 4)
    q = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    segs = jnp.asarray(ids)[None]
    o, _ = flash_attention_forward(
        q, k, v, causal=True, q_segment_ids=segs, kv_segment_ids=segs)
    m = jnp.asarray(seg_mask(ids, ids))
    o_ref = attention_reference(
        q[0, 0], k[0, 0], v[0, 0], causal=True, mask=m)
    assert max_abs_err(o[0, 0], o_ref) < fp32_kernel_tol()


def test_segments_cross_attention_empty_rows(rng):
    """A q token whose segment never appears in kv: O = 0, L = -inf."""
    nq, nk, d = 64, 128, 32
    q_ids = np.zeros(nq, np.int32)
    q_ids[10] = 99   # orphan segment
    kv_ids = np.zeros(nk, np.int32)
    q = jnp.asarray(rng.standard_normal((1, 1, nq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, nk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, nk, d)), jnp.float32)
    o, lse = flash_attention_forward(
        q, k, v, q_segment_ids=jnp.asarray(q_ids)[None],
        kv_segment_ids=jnp.asarray(kv_ids)[None])
    assert np.allclose(np.asarray(o)[0, 0, 10], 0.0)
    assert np.isneginf(np.asarray(lse)[0, 0, 10])
    m = jnp.asarray(seg_mask(q_ids, kv_ids))
    o_ref = attention_reference(q[0, 0], k[0, 0], v[0, 0], mask=m)
    keep = np.arange(nq) != 10
    assert max_abs_err(o[0, 0, keep], o_ref[keep]) < fp32_kernel_tol()


def test_segments_gradients(rng):
    n, d = 200, 64
    ids = make_segments(rng, n, 3)
    segs = jnp.asarray(ids)[None]
    q = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)

    g = jax.grad(lambda q, k, v: jnp.sum(flash_attention(
        q, k, v, causal=True, q_segment_ids=segs, kv_segment_ids=segs)
        * do), (0, 1, 2))(q, k, v)

    m = jnp.asarray(seg_mask(ids, ids))

    def ref_loss(q, k, v):
        outs = [attention_reference(q[0, h], k[0, h], v[0, h],
                                    causal=True, mask=m)
                for h in range(2)]
        return jnp.sum(jnp.stack(outs)[None] * do)

    g_ref = jax.grad(ref_loss, (0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, g_ref):
        assert max_abs_err(a, b) < 5 * fp32_kernel_tol(), name


def test_segments_batch_varies(rng):
    n, d = 128, 64
    ids0 = make_segments(rng, n, 2)
    ids1 = make_segments(rng, n, 4)
    segs = jnp.asarray(np.stack([ids0, ids1]))
    q = jnp.asarray(rng.standard_normal((2, 1, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 1, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 1, n, d)), jnp.float32)
    o, _ = flash_attention_forward(
        q, k, v, q_segment_ids=segs, kv_segment_ids=segs)
    for b, ids in enumerate([ids0, ids1]):
        m = jnp.asarray(seg_mask(ids, ids))
        o_ref = attention_reference(q[b, 0], k[b, 0], v[b, 0], mask=m)
        assert max_abs_err(o[b, 0], o_ref) < fp32_kernel_tol()
