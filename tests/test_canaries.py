"""Out-of-bounds canary tests.

The reference over-allocates every input buffer with trailing random
garbage so OOB reads corrupt results deterministically
(`Tests/Utilities/MTLContext+Buffers.swift:10-18`) and pre-poisons
output O[0] with NaN to catch never-written outputs
(`SquareAttentionTest.swift:286-287`).  The TPU analogs:

- decode caches carry live regions (kv_lens) inside a larger buffer —
  the dead tail is filled with large finite garbage and must not leak
  into results (finite, not NaN: 0 * NaN = NaN would poison even a
  correctly-masked matmul, and real stale cache contents are finite);
- externally-masked K/V rows get garbage and must be exactly gated;
- donated/poisoned output buffers must be fully overwritten.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.ops.flash_attention import (
    flash_attention_forward,
)
from metal_flash_attention_tpu.ops.flash_decode import flash_decode
from metal_flash_attention_tpu.ops.reference import attention_reference

GARBAGE = 1.0e6


def test_decode_ignores_dead_cache_tail(rng):
    batch, heads, s, d = 2, 4, 512, 64
    q = jnp.asarray(rng.standard_normal((batch, heads, d)), jnp.float32)
    k = rng.standard_normal((batch, heads, s, d)).astype(np.float32)
    v = rng.standard_normal((batch, heads, s, d)).astype(np.float32)
    kv_lens = jnp.asarray([100, 300], jnp.int32)
    k_g, v_g = k.copy(), v.copy()
    for b, n in enumerate([100, 300]):
        k_g[b, :, n:] = GARBAGE * (1 + rng.random((heads, s - n, d)))
        v_g[b, :, n:] = -GARBAGE * (1 + rng.random((heads, s - n, d)))
    o_clean = flash_decode(q, jnp.asarray(k), jnp.asarray(v),
                           kv_lens=kv_lens, block_kv=128)
    o_garbage = flash_decode(q, jnp.asarray(k_g), jnp.asarray(v_g),
                             kv_lens=kv_lens, block_kv=128)
    assert bool(jnp.all(jnp.isfinite(o_garbage)))
    assert float(jnp.max(jnp.abs(o_clean - o_garbage))) == 0.0


def test_forward_mask_gates_garbage_exactly(rng):
    n, d = 200, 64
    q = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    k = rng.standard_normal((1, 1, n, d)).astype(np.float32)
    v = rng.standard_normal((1, 1, n, d)).astype(np.float32)
    mask = np.ones((1, 1, n, n), bool)
    mask[:, :, :, 150:] = False  # columns 150+ masked for every row
    k_g, v_g = k.copy(), v.copy()
    k_g[:, :, 150:] = GARBAGE
    v_g[:, :, 150:] = -GARBAGE
    o, _ = flash_attention_forward(
        q, jnp.asarray(k_g), jnp.asarray(v_g), mask=jnp.asarray(mask))
    o_ref = attention_reference(
        q[0, 0], jnp.asarray(k[0, 0]), jnp.asarray(v[0, 0]),
        mask=jnp.asarray(mask[0, 0]))
    assert bool(jnp.all(jnp.isfinite(o)))
    assert float(jnp.max(jnp.abs(o[0, 0] - o_ref))) < 2e-5


def test_window_gates_out_of_window_garbage(rng):
    n, d, w = 256, 64, 64
    q = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    k = rng.standard_normal((1, 1, n, d)).astype(np.float32)
    v = rng.standard_normal((1, 1, n, d)).astype(np.float32)
    # Garbage in the region no row can see under (causal, window=64):
    # columns more than w behind the earliest row that could attend.
    k_g, v_g = k.copy(), v.copy()
    k_g[:, :, :64] = GARBAGE
    v_g[:, :, :64] = GARBAGE
    o, _ = flash_attention_forward(
        q, jnp.asarray(k_g), jnp.asarray(v_g), causal=True,
        window_size=w)
    assert bool(jnp.all(jnp.isfinite(o)))
    # Rows >= 128 can only see columns > 64: garbage must not reach
    # them at all.  (Rows that CAN see the garbage are not compared —
    # 1e6-scale logits make the softmax ill-conditioned in any
    # implementation, which is exactly why gating must be exact.)
    o2, _ = flash_attention_forward(
        q, jnp.asarray(k), jnp.asarray(v), causal=True, window_size=w)
    assert float(jnp.max(jnp.abs(o[0, 0, 160:] - o2[0, 0, 160:]))) == 0.0


def test_outputs_fully_written(rng):
    """Every output row must be written (reference: NaN-poisoned O[0],
    SquareAttentionTest.swift:286-287).  Donation lets the kernel
    reuse buffers, so run the smallest odd shape where partial-write
    bugs would hide."""
    n, d = 9, 3
    q = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    o, lse = flash_attention_forward(q, k, v)
    assert o.shape == (1, 1, n, d)
    assert bool(jnp.all(jnp.isfinite(o)))
    assert bool(jnp.all(jnp.isfinite(lse)))
    o_ref = attention_reference(q[0, 0], k[0, 0], v[0, 0])
    assert float(jnp.max(jnp.abs(o[0, 0] - o_ref))) < 2e-5
