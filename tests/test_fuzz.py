"""Randomized adversarial trials over the full feature cross-product.

The analog of the reference's `RectangularAttentionTest.swift:7-473`:
random non-power-of-two shapes biased small by cubing uniform variates
(`:8-22`), random feature combinations per trial, random precisions —
every trial checked against the golden model.  Where the reference
randomizes per-operand transposes (its kernels have physical-layout
code paths), our kernels canonicalize layout, so the fuzz axis budget
goes to masks/bias/window/GQA instead, which is where our edge cases
live.
"""

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
    max_abs_err,
    tolerances_for,
)


def cubed_uniform(r, lo, hi):
    return int(lo + r.uniform(0, 1) ** 3 * (hi - lo))


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_forward(trial):
    r = np.random.default_rng(100 + trial)
    q_len = cubed_uniform(r, 1, 600)
    kv_len = cubed_uniform(r, 1, 600)
    d = cubed_uniform(r, 1, 200)
    group = int(r.choice([1, 2, 4]))
    kv_heads = int(r.choice([1, 2]))
    q_heads = kv_heads * group
    batch = int(r.choice([1, 2]))
    causal = bool(r.integers(2))
    window = (int(r.integers(1, max(kv_len, 2)))
              if (causal and r.integers(2)) else None)
    use_mask = bool(r.integers(2)) and not causal
    use_bias = bool(r.integers(2))
    dtype = jnp.float32 if r.integers(2) else jnp.bfloat16

    q = jnp.asarray(r.standard_normal((batch, q_heads, q_len, d)), dtype)
    k = jnp.asarray(r.standard_normal((batch, kv_heads, kv_len, d)), dtype)
    v = jnp.asarray(r.standard_normal((batch, kv_heads, kv_len, d)), dtype)
    mask = bias = None
    if use_mask:
        mask = jnp.asarray(r.random((1, 1, q_len, kv_len)) > 0.2)
    if use_bias:
        bias = jnp.asarray(
            r.standard_normal((1, 1, q_len, kv_len)), jnp.float32)

    o, lse = flash_attention_forward(
        q, k, v, causal=causal, window_size=window, mask=mask, bias=bias)

    kk = jnp.repeat(k, group, axis=1).astype(jnp.float32)
    vv = jnp.repeat(v, group, axis=1).astype(jnp.float32)
    outs = []
    for b in range(batch):
        for h in range(q_heads):
            outs.append(attention_reference(
                q[b, h].astype(jnp.float32), kk[b, h], vv[b, h],
                causal=causal, window_size=window,
                mask=None if mask is None else mask[0, 0],
                bias=None if bias is None else bias[0, 0]))
    o_ref = jnp.stack(outs).reshape(batch, q_heads, q_len, d)

    tol = tolerances_for(dtype)
    cfg = (trial, q_len, kv_len, d, group, causal, window, use_mask,
           use_bias, dtype.__name__)
    # Fully-masked rows produce O = 0 in the kernel; the golden
    # produces whatever softmax(-inf row) normalizes to — exclude them
    # like the reference's reduced checks for tiny C
    # (RectangularAttentionTest.swift:451-464).
    finite_rows = jnp.isfinite(lse)[..., None]
    err = jnp.max(jnp.abs(jnp.where(
        finite_rows, o.astype(jnp.float32) - o_ref, 0.0)))
    assert float(err) < tol.o, cfg


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_gradients(trial):
    r = np.random.default_rng(200 + trial)
    n = cubed_uniform(r, 8, 300)
    d = int(r.choice([32, 64, 96, 128]))
    causal = bool(r.integers(2))
    q = jnp.asarray(r.standard_normal((1, 2, n, d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((1, 2, n, d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((1, 2, n, d)), jnp.float32)
    do = jnp.asarray(r.standard_normal((1, 2, n, d)), jnp.float32)

    g = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, causal=causal) * do), (0, 1, 2))(q, k, v)

    def ref_loss(q, k, v):
        outs = [attention_reference(q[0, h], k[0, h], v[0, h],
                                    causal=causal) for h in range(2)]
        return jnp.sum(jnp.stack(outs)[None] * do)

    g_ref = jax.grad(ref_loss, (0, 1, 2))(q, k, v)
    # fp32 on TPU is multi-pass bf16 emulation (~2e-4 at these sizes,
    # matching fp32_kernel_tol); CPU fp32 is exact.
    base = 1e-4 if jax.default_backend() == "cpu" else 4e-4
    for name, a, b in zip("qkv", g, g_ref):
        assert max_abs_err(a, b) < base * max(1, n // 64), (
            trial, n, d, causal, name)


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_dynamic_traversal(trial):
    """Same fuzz as test_fuzz_forward but forced onto the dynamic
    kernel (long-context causal/window path), random block sizes."""
    import metal_flash_attention_tpu.ops.flash_attention as _famod
    famod = __import__("metal_flash_attention_tpu.ops.flash_attention",
                       fromlist=["_FORCE_DYNAMIC"])

    r = np.random.default_rng(900 + trial)
    q_len = cubed_uniform(r, 1, 600)
    kv_len = cubed_uniform(r, 1, 600)
    d = cubed_uniform(r, 8, 200)
    group = int(r.choice([1, 2, 4]))
    kv_heads = int(r.choice([1, 2]))
    q_heads = kv_heads * group
    batch = int(r.choice([1, 2]))
    causal = True
    window = (int(r.integers(1, max(kv_len, 2)))
              if r.integers(2) else None)
    dtype = jnp.float32 if r.integers(2) else jnp.bfloat16
    bq = int(r.choice([128, 256]))
    bkv = int(r.choice([128, 256]))

    q = jnp.asarray(r.standard_normal((batch, q_heads, q_len, d)), dtype)
    k = jnp.asarray(r.standard_normal((batch, kv_heads, kv_len, d)), dtype)
    v = jnp.asarray(r.standard_normal((batch, kv_heads, kv_len, d)), dtype)

    famod._FORCE_DYNAMIC = True
    try:
        o, lse = flash_attention_forward(
            q, k, v, causal=causal, window_size=window,
            block_q=bq, block_kv=bkv)
    finally:
        famod._FORCE_DYNAMIC = None

    kk = jnp.repeat(k, group, axis=1).astype(jnp.float32)
    vv = jnp.repeat(v, group, axis=1).astype(jnp.float32)
    outs = []
    for b in range(batch):
        for h in range(q_heads):
            outs.append(attention_reference(
                q[b, h].astype(jnp.float32), kk[b, h], vv[b, h],
                causal=causal, window_size=window))
    o_ref = jnp.stack(outs).reshape(batch, q_heads, q_len, d)

    tol = tolerances_for(dtype)
    cfg = (trial, q_len, kv_len, d, group, window, bq, bkv,
           dtype.__name__)
    finite_rows = jnp.isfinite(lse)[..., None]
    err = jnp.max(jnp.abs(jnp.where(
        finite_rows, o.astype(jnp.float32) - o_ref, 0.0)))
    assert float(err) < tol.o, cfg


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_windowed_decode(trial):
    """Random kv_lens/kv_starts decode vs a masked golden."""
    from metal_flash_attention_tpu.ops.flash_decode import flash_decode

    r = np.random.default_rng(1700 + trial)
    batch = int(r.integers(1, 5))
    kv_heads = int(r.choice([1, 2]))
    group = int(r.choice([1, 2, 8]))
    q_heads = kv_heads * group
    d = int(r.choice([64, 128]))
    s = int(r.integers(64, 900))
    block_kv = int(r.choice([128, 256]))
    lens = r.integers(1, s + 1, batch)
    window = int(r.integers(1, s))
    starts = np.maximum(lens - window, 0)

    q = jnp.asarray(r.standard_normal((batch, q_heads, d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((batch, kv_heads, s, d)),
                    jnp.float32)
    v = jnp.asarray(r.standard_normal((batch, kv_heads, s, d)),
                    jnp.float32)
    o = flash_decode(q, k, v, kv_lens=jnp.asarray(lens, jnp.int32),
                     kv_starts=jnp.asarray(starts, jnp.int32),
                     block_kv=block_kv)

    cols = np.arange(s)
    live = ((cols[None] < lens[:, None]) & (cols[None] >= starts[:, None]))
    kk = jnp.repeat(k, group, axis=1)
    vv = jnp.repeat(v, group, axis=1)
    sc = jnp.einsum("bhd,bhsd->bhs", q, kk) / np.sqrt(d)
    sc = jnp.where(jnp.asarray(live)[:, None], sc, -jnp.inf)
    o_ref = jnp.einsum("bhs,bhsd->bhd", jax.nn.softmax(sc, -1), vv)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 5e-5, (
        trial, batch, q_heads, d, s, block_kv, lens, starts)


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_transposed_input_layouts(trial):
    """The migration path for the reference's per-operand transposes
    (AttentionDescriptor.swift:71; fuzzed by
    RectangularAttentionTest.swift:28-32): operands born in seq-major
    [B, N, H, D] or head-dim-major [B, H, D, N] layouts reach the
    kernel through `jnp.swapaxes` and must match the canonical run
    bit-exactly (the relayout cost is measured separately by
    tests/test_performance.py::test_transposed_layout_cost)."""
    r = np.random.default_rng(500 + trial)
    q_len = cubed_uniform(r, 8, 500)
    kv_len = cubed_uniform(r, 8, 500)
    d = int(r.choice([32, 64, 80, 128]))
    heads, batch = 2, 2
    causal = bool(r.integers(2))
    dtype = jnp.float32 if r.integers(2) else jnp.bfloat16

    def make(nrows):
        # Born seq-major (axis order B, N, H, D) or D-major.
        seq_major = bool(r.integers(2))
        if seq_major:
            raw = jnp.asarray(
                r.standard_normal((batch, nrows, heads, d)), dtype)
            return jnp.swapaxes(raw, 1, 2)
        raw = jnp.asarray(
            r.standard_normal((batch, heads, d, nrows)), dtype)
        return jnp.swapaxes(raw, 2, 3)

    q, k, v = make(q_len), make(kv_len), make(kv_len)
    o_alt = flash_attention(q, k, v, causal=causal)
    # Canonical contiguous copies of the same values.
    qc, kc, vc = (jnp.asarray(np.ascontiguousarray(np.asarray(x)))
                  for x in (q, k, v))
    o_canon = flash_attention(qc, kc, vc, causal=causal)
    assert max_abs_err(o_alt, o_canon) == 0.0
