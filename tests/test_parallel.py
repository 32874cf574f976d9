"""Distribution layer tests on the virtual 8-device CPU mesh.

Multi-chip behavior the reference could never test (`SURVEY.md §4`
"multi-node testing: none"): head/data-parallel shard_map attention,
context parallelism with cross-chip softmax combine, and ring
attention, all validated bit-for-bit (within tolerance) against the
single-device golden.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.ops.reference import attention_reference
from metal_flash_attention_tpu.parallel.mesh import make_mesh
from metal_flash_attention_tpu.parallel.ring_attention import ring_attention
from metal_flash_attention_tpu.parallel.sharded_attention import (
    context_parallel_attention,
    sharded_flash_attention,
)
from metal_flash_attention_tpu.utils.tolerances import max_abs_err

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def golden(q, k, v, **kw):
    fn = jax.vmap(jax.vmap(lambda a, b, c: attention_reference(a, b, c, **kw)))
    return fn(q, k, v)


def make_inputs(rng, b, h, n, d, hkv=None):
    hkv = hkv or h
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, n, d)), jnp.float32)
    return q, k, v


def test_head_parallel(rng):
    mesh = make_mesh(data=2, heads=4, context=1)
    q, k, v = make_inputs(rng, 2, 8, 128, 64)
    fn = sharded_flash_attention(mesh, causal=True)
    o = fn(q, k, v)
    o_ref = golden(q, k, v, causal=True)
    assert max_abs_err(o, o_ref) < 3e-5


def test_head_parallel_gqa(rng):
    mesh = make_mesh(data=1, heads=4, context=1)
    q, k, v = make_inputs(rng, 1, 8, 128, 64, hkv=4)
    fn = sharded_flash_attention(mesh)
    o = fn(q, k, v)
    o_ref = golden(q, jnp.repeat(k, 2, 1), jnp.repeat(v, 2, 1))
    assert max_abs_err(o, o_ref) < 3e-5


def test_context_parallel(rng):
    mesh = make_mesh(data=1, heads=2, context=4)
    q, k, v = make_inputs(rng, 1, 2, 512, 64)
    fn = context_parallel_attention(mesh)
    o = fn(q, k, v)
    o_ref = golden(q, k, v)
    assert max_abs_err(o, o_ref) < 5e-5


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention(rng, causal):
    mesh = make_mesh(data=1, heads=2, context=4)
    q, k, v = make_inputs(rng, 1, 2, 512, 64)
    fn = ring_attention(mesh, causal=causal)
    o = fn(q, k, v)
    o_ref = golden(q, k, v, causal=causal)
    assert max_abs_err(o, o_ref) < 5e-5


def test_ring_attention_full_mesh(rng):
    # All 8 devices on the context axis — the 128K-context topology in
    # miniature.
    mesh = make_mesh(data=1, heads=1, context=8)
    q, k, v = make_inputs(rng, 1, 1, 1024, 64)
    fn = ring_attention(mesh, causal=True)
    o = fn(q, k, v)
    o_ref = golden(q, k, v, causal=True)
    assert max_abs_err(o, o_ref) < 5e-5


def test_ring_matches_lse(rng):
    mesh = make_mesh(data=1, heads=1, context=4)
    q, k, v = make_inputs(rng, 1, 1, 256, 64)
    fn = ring_attention(mesh, return_residuals=True)
    o, lse = fn(q, k, v)
    _, lse_ref = jax.vmap(jax.vmap(
        lambda a, b, c: attention_reference(a, b, c, return_residuals=True)
    ))(q, k, v)
    assert max_abs_err(lse, lse_ref) < 1e-4


def test_ring_attention_backward(rng):
    """Differentiable ring: dK/dV accumulators rotate with the shards
    and land home after the closing ppermute."""
    mesh = make_mesh(data=1, heads=2, context=4)
    q, k, v = make_inputs(rng, 1, 2, 256, 64)
    do = jnp.asarray(
        np.random.default_rng(1).standard_normal(q.shape), jnp.float32)

    fn = ring_attention(mesh, causal=True)
    g = jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v) * do),
                 (0, 1, 2))(q, k, v)

    def ref_loss(q, k, v):
        return jnp.sum(golden(q, k, v, causal=True) * do)

    g_ref = jax.grad(ref_loss, (0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, g_ref):
        assert max_abs_err(a, b) < 1e-4, name


def test_context_parallel_decode(rng):
    from metal_flash_attention_tpu.parallel.sharded_attention import (
        context_parallel_decode,
    )

    mesh = make_mesh(data=2, heads=1, context=4)
    b, h, s, d = 2, 4, 512, 64
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    kv_lens = jnp.asarray([100, 450], jnp.int32)

    fn = context_parallel_decode(mesh, block_kv=128)
    o = fn(q, k, v, kv_lens)

    # golden decode with lengths
    logits = jnp.einsum("bhd,bhsd->bhs", q, k) / jnp.sqrt(jnp.float32(d))
    msk = jnp.arange(s)[None, None, :] < kv_lens[:, None, None]
    p = jax.nn.softmax(jnp.where(msk, logits, -jnp.inf), -1)
    o_ref = jnp.einsum("bhs,bhsd->bhd", p, v)
    assert max_abs_err(o, o_ref) < 5e-5


class TestZigzag:
    def test_order_roundtrip(self, rng):
        from metal_flash_attention_tpu.parallel.zigzag import (
            zigzag_shard,
            zigzag_unshard,
        )
        x = jnp.asarray(rng.standard_normal((1, 2, 64, 8)), jnp.float32)
        y = zigzag_unshard(zigzag_shard(x, 4), 4)
        assert float(jnp.max(jnp.abs(x - y))) == 0.0

    def test_forward_matches_causal_golden(self, rng):
        from metal_flash_attention_tpu.parallel.zigzag import (
            zigzag_ring_attention,
            zigzag_shard,
            zigzag_unshard,
        )
        cp = 4
        mesh = make_mesh(data=1, heads=2, context=cp)
        q, k, v = make_inputs(rng, 1, 2, 512, 64)
        fn = zigzag_ring_attention(mesh)
        o_z = fn(zigzag_shard(q, cp), zigzag_shard(k, cp),
                 zigzag_shard(v, cp))
        o = zigzag_unshard(o_z, cp)
        o_ref = golden(q, k, v, causal=True)
        assert max_abs_err(o, o_ref) < 5e-5

    def test_backward_matches_causal_golden(self, rng):
        from metal_flash_attention_tpu.parallel.zigzag import (
            zigzag_ring_attention,
            zigzag_shard,
            zigzag_unshard,
        )
        cp = 4
        mesh = make_mesh(data=1, heads=1, context=cp)
        q, k, v = make_inputs(rng, 1, 1, 256, 64)
        do = jnp.asarray(
            np.random.default_rng(3).standard_normal(q.shape), jnp.float32)
        fn = zigzag_ring_attention(mesh)

        def loss(q, k, v):
            o = zigzag_unshard(fn(zigzag_shard(q, cp), zigzag_shard(k, cp),
                                  zigzag_shard(v, cp)), cp)
            return jnp.sum(o * do)

        g = jax.grad(loss, (0, 1, 2))(q, k, v)

        def ref_loss(q, k, v):
            return jnp.sum(golden(q, k, v, causal=True) * do)

        g_ref = jax.grad(ref_loss, (0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", g, g_ref):
            assert max_abs_err(a, b) < 1e-4, name

    def test_full_mesh_context8(self, rng):
        from metal_flash_attention_tpu.parallel.zigzag import (
            zigzag_ring_attention,
            zigzag_shard,
            zigzag_unshard,
        )
        cp = 8
        mesh = make_mesh(data=1, heads=1, context=cp)
        q, k, v = make_inputs(rng, 1, 1, 1024, 64)
        fn = zigzag_ring_attention(mesh)
        o = zigzag_unshard(fn(zigzag_shard(q, cp), zigzag_shard(k, cp),
                              zigzag_shard(v, cp)), cp)
        o_ref = golden(q, k, v, causal=True)
        assert max_abs_err(o, o_ref) < 5e-5


def test_context_parallel_paged_decode_matches_global():
    """Paged CP decode: pools scattered page-wise over 4 devices
    reproduce the single-pool paged_decode result (partials merged by
    the cross-chip online-softmax combine)."""
    import numpy as np

    from metal_flash_attention_tpu.ops.paged_attention import (
        PagedKVCache,
        paged_decode,
    )
    from metal_flash_attention_tpu.parallel.mesh import make_mesh
    from metal_flash_attention_tpu.parallel.sharded_attention import (
        context_parallel_paged_decode,
        shard_paged_cache_pages,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    rng = np.random.default_rng(0)
    b, qh, kvh, page, d, mp = 2, 4, 2, 16, 128, 6
    num_pages = b * mp + 1
    kp = jnp.asarray(rng.standard_normal(
        (num_pages, kvh, page, d)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal(
        (num_pages, kvh, page, d)), jnp.bfloat16)
    # shuffled page assignment, ragged lengths (one partial tail each)
    perm = rng.permutation(num_pages - 1) + 1
    tbl = jnp.asarray(perm[:b * mp].reshape(b, mp), jnp.int32)
    lens = jnp.asarray([57, 90], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, qh, d)), jnp.bfloat16)
    cache = PagedKVCache(kp, vp, tbl, lens)
    ref = paged_decode(q, cache)

    mesh = make_mesh(context=4, devices=jax.devices()[:4])
    ks, vs, tbls, lls = shard_paged_cache_pages(cache, 4)
    fn = context_parallel_paged_decode(mesh)
    o = fn(q, jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(tbls),
           jnp.asarray(lls))
    # token distribution must be exhaustive and disjoint
    assert lls.sum(axis=0).tolist() == lens.tolist()
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 3e-2, err
