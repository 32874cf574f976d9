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
