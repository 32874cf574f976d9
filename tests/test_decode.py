"""Decode attention: single-token queries against long KV caches.

Golden-model strategy per SURVEY.md §4 — the kernel output is checked
against the naive reference on every configuration, including the
quantized-KV tiers and continuous-batching variable lengths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.utils.tolerances import fp32_kernel_tol

from metal_flash_attention_tpu.descriptors.precision import OperandPrecision
from metal_flash_attention_tpu.ops.flash_decode import (
    decode_step,
    flash_decode,
)
from metal_flash_attention_tpu.ops.quantization import dequantize, quantize


def golden_decode(q, k, v, kv_lens=None):
    """Naive decode: softmax(q K^T / sqrt(d)) V with GQA + lengths."""
    batch, q_heads, d = q.shape
    _, kv_heads, s, _ = k.shape
    group = q_heads // kv_heads
    kf = jnp.repeat(k.astype(jnp.float32), group, axis=1)
    vf = jnp.repeat(v.astype(jnp.float32), group, axis=1)
    logits = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), kf)
    logits /= jnp.sqrt(jnp.float32(d))
    if kv_lens is not None:
        mask = jnp.arange(s)[None, None, :] < kv_lens[:, None, None]
        logits = jnp.where(mask, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", p, vf)


@pytest.mark.parametrize("q_heads,kv_heads,d", [(8, 8, 64), (8, 2, 128),
                                                (16, 2, 256), (4, 4, 96)])
def test_decode_matches_golden(rng, q_heads, kv_heads, d):
    batch, s = 2, 512
    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    o = flash_decode(q, k, v, block_kv=256)
    o_ref = golden_decode(q, k, v)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


def test_decode_variable_lengths(rng):
    batch, q_heads, kv_heads, s, d = 4, 8, 2, 640, 64
    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    kv_lens = jnp.asarray([1, 130, 500, 640], jnp.int32)
    o = flash_decode(q, k, v, kv_lens=kv_lens, block_kv=256)
    o_ref = golden_decode(q, k, v, kv_lens=kv_lens)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


def test_decode_odd_seq_padding(rng):
    batch, q_heads, kv_heads, s, d = 1, 4, 4, 777, 64
    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    o = flash_decode(q, k, v, block_kv=256)
    o_ref = golden_decode(q, k, v)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


def test_decode_residuals_merge(rng):
    """lse residuals allow exact cross-shard merging (the ring /
    context-parallel combine)."""
    batch, q_heads, s, d = 1, 4, 512, 64
    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((batch, q_heads, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, q_heads, s, d)), jnp.float32)
    o1, lse1 = flash_decode(q, k[:, :, :256], v[:, :, :256],
                            return_residuals=True, block_kv=256)
    o2, lse2 = flash_decode(q, k[:, :, 256:], v[:, :, 256:],
                            return_residuals=True, block_kv=256)
    lse = jnp.logaddexp(lse1, lse2)
    o = (o1 * jnp.exp(lse1 - lse)[..., None]
         + o2 * jnp.exp(lse2 - lse)[..., None])
    o_ref = golden_decode(q, k, v)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


@pytest.mark.parametrize("precision", [
    OperandPrecision.INT8, OperandPrecision.FP8_E4M3,
    OperandPrecision.FP8_E5M2,
])
def test_decode_quantized_kv(rng, precision):
    batch, q_heads, kv_heads, s, d = 2, 8, 2, 512, 128
    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    kq = quantize(k, precision)
    vq = quantize(v, precision)
    o = flash_decode(q, kq, vq, block_kv=256)
    # Golden path: host-side dequantization (isolates the in-kernel
    # dequant), so the only error left is bf16 compute.
    o_ref = golden_decode(q, dequantize(kq), dequantize(vq))
    assert float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref))) < 5e-2
    # And the quantization error itself stays within the mixed tier
    # against the unquantized cache.
    o_full = golden_decode(q, k, v)
    tol = 0.25 if precision is OperandPrecision.FP8_E5M2 else 0.15
    assert float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_full))) < tol


def test_decode_step_appends_and_attends(rng):
    batch, q_heads, kv_heads, max_s, d = 2, 4, 2, 256, 64
    k_cache = jnp.zeros((batch, kv_heads, max_s, d), jnp.float32)
    v_cache = jnp.zeros((batch, kv_heads, max_s, d), jnp.float32)
    kv_lens = jnp.asarray([0, 0], jnp.int32)
    # Prefill 3 tokens one by one, then check against golden over the
    # accumulated cache.
    ks = rng.standard_normal((3, batch, kv_heads, d)).astype(np.float32)
    vs = rng.standard_normal((3, batch, kv_heads, d)).astype(np.float32)
    qs = rng.standard_normal((3, batch, q_heads, d)).astype(np.float32)
    for t in range(3):
        o, k_cache, v_cache, kv_lens = decode_step(
            jnp.asarray(qs[t]), k_cache, v_cache,
            jnp.asarray(ks[t]), jnp.asarray(vs[t]), kv_lens,
            block_kv=128, interpret=True)
    assert kv_lens.tolist() == [3, 3]
    o_ref = golden_decode(
        jnp.asarray(qs[2]), k_cache, v_cache, kv_lens=kv_lens)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()
    # Cache rows beyond the live length remain zero.
    assert float(jnp.max(jnp.abs(k_cache[:, :, 3:]))) == 0.0


def test_decode_nf4_via_prefill(rng):
    batch, q_heads, kv_heads, s, d = 1, 4, 4, 256, 128
    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    kq = quantize(k, OperandPrecision.NF4)
    vq = quantize(v, OperandPrecision.NF4)
    kv_lens = jnp.asarray([200], jnp.int32)
    o = flash_decode(q, kq, vq, kv_lens=kv_lens)
    o_ref = golden_decode(q, dequantize(kq), dequantize(vq),
                          kv_lens=kv_lens)
    assert o.shape == (batch, q_heads, d)
    assert float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref))) < 5e-2


def test_decode_nf4_paired_window_and_lens(rng):
    """NF4 full-lane paired path (D=128) with kv_starts + variable
    lens: the paired column permutation (even|odd token groups) must
    mask both the live-length tail and the pre-window head exactly."""
    batch, qh, kvh, s, d = 2, 8, 2, 512, 128
    q = jnp.asarray(rng.standard_normal((batch, qh, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.float32)
    kq, vq = quantize(k, OperandPrecision.NF4), quantize(
        v, OperandPrecision.NF4)
    kv_lens = jnp.asarray([511, 300], jnp.int32)   # odd length too
    window = 200
    kv_starts = jnp.maximum(kv_lens - window, 0)
    o = flash_decode(q, kq, vq, kv_lens=kv_lens, kv_starts=kv_starts,
                     block_kv=256)
    kd, vd = dequantize(kq), dequantize(vq)
    # Golden: mask both ends on the dequantized cache.
    mask = jnp.logical_and(
        jnp.arange(s)[None, None, :] < kv_lens[:, None, None],
        jnp.arange(s)[None, None, :] >= kv_starts[:, None, None])
    group = qh // kvh
    kf = jnp.repeat(kd, group, axis=1)
    vf = jnp.repeat(vd, group, axis=1)
    logits = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), kf)
    logits = logits / jnp.sqrt(jnp.float32(d))
    logits = jnp.where(mask, logits, -jnp.inf)
    o_ref = jnp.einsum("bhs,bhsd->bhd", jax.nn.softmax(logits, -1), vf)
    assert float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref))) < 5e-2


def test_decode_sliding_window_starts(rng):
    """kv_starts masks positions before the window (Gemma-2 local
    layers at decode time)."""
    batch, qh, kvh, s, d = 3, 4, 2, 640, 64
    q = jnp.asarray(rng.standard_normal((batch, qh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.float32)
    kv_lens = jnp.asarray([640, 500, 130], jnp.int32)
    window = 256
    kv_starts = jnp.maximum(kv_lens - window, 0)
    o = flash_decode(q, k, v, kv_lens=kv_lens, kv_starts=kv_starts,
                     block_kv=256)

    # Golden: zero out everything outside [start, len).
    cols = jnp.arange(s)
    live = ((cols[None, :] < kv_lens[:, None])
            & (cols[None, :] >= kv_starts[:, None]))
    kk = jnp.repeat(k, qh // kvh, axis=1)
    vv = jnp.repeat(v, qh // kvh, axis=1)
    sc = jnp.einsum("bhd,bhsd->bhs", q, kk) / np.sqrt(d)
    sc = jnp.where(live[:, None, :], sc, -jnp.inf)
    o_ref = jnp.einsum("bhs,bhsd->bhd", jax.nn.softmax(sc, axis=-1), vv)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


def test_decode_logit_softcap(rng):
    batch, qh, kvh, s, d, cap = 2, 4, 2, 300, 64, 20.0
    q = jnp.asarray(rng.standard_normal((batch, qh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.float32)
    o = flash_decode(q, k, v, logit_softcap=cap, block_kv=256)

    kk = jnp.repeat(k, qh // kvh, axis=1)
    vv = jnp.repeat(v, qh // kvh, axis=1)
    sc = jnp.einsum("bhd,bhsd->bhs", q, kk) / np.sqrt(d)
    sc = cap * jnp.tanh(sc / cap)
    o_ref = jnp.einsum("bhs,bhsd->bhd", jax.nn.softmax(sc, axis=-1), vv)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()


def test_decode_nf4_direct_d64(rng):
    """NF4 direct in-kernel unpack (payload lane-exact at D=64)."""
    batch, q_heads, kv_heads, s, d = 2, 8, 2, 640, 64
    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    kq = quantize(k, OperandPrecision.NF4)
    vq = quantize(v, OperandPrecision.NF4)
    kv_lens = jnp.asarray([500, 640], jnp.int32)
    o = flash_decode(q, kq, vq, kv_lens=kv_lens, block_kv=256)
    o_ref = golden_decode(q, dequantize(kq), dequantize(vq),
                          kv_lens=kv_lens)
    assert float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref))) < 5e-2


def test_decode_nf4_fallback_padded_head_dim(rng):
    """D=192 pads to 256 lanes -> split-half layout needs the prefill
    kernel's Q shuffle; the prefill fallback handles it."""
    batch, q_heads, kv_heads, s, d = 1, 2, 2, 128, 192
    q = jnp.asarray(rng.standard_normal((batch, q_heads, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, kv_heads, s, d)), jnp.float32)
    kq = quantize(k, OperandPrecision.NF4)
    vq = quantize(v, OperandPrecision.NF4)
    o = flash_decode(q, kq, vq)
    o_ref = golden_decode(q, dequantize(kq), dequantize(vq))
    assert float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref))) < 5e-2


def test_sink_decode_matches_masked_reference():
    """Attention-sink decode == full attention under the A-shaped
    mask (first `sink` positions + last `window`), and == full
    attention outright when the prefix fits in sink + window."""
    import numpy as np

    from metal_flash_attention_tpu.models.serving import sink_decode

    rng = np.random.default_rng(97)
    b, qh, kvh, S, d = 2, 4, 2, 96, 64
    q = jnp.asarray(rng.standard_normal((b, qh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kvh, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kvh, S, d)), jnp.float32)
    lens = jnp.asarray([90, 40], jnp.int32)
    sink, window = 4, 32

    o = sink_decode(q, k, v, lens, window=window, sink=sink)

    # jnp reference with the explicit A-shaped mask.
    group = qh // kvh
    kr = jnp.repeat(k, group, axis=1)
    vr = jnp.repeat(v, group, axis=1)
    s = jnp.einsum("bhd,bhsd->bhs", q, kr) / np.sqrt(d)
    pos = jnp.arange(S)[None, :]
    allowed = (pos < sink) | (pos >= (lens[:, None] - window))
    allowed &= pos < lens[:, None]
    s = jnp.where(allowed[:, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhs,bhsd->bhd", p, vr)
    err = float(jnp.max(jnp.abs(o - ref)))
    assert err < 2e-4, err
    # Row 1 (len 40 > sink+window=36) actually drops middle tokens;
    # row 0 too.  A short prefix equals FULL attention:
    lens2 = jnp.asarray([30, 20], jnp.int32)
    o2 = sink_decode(q, k, v, lens2, window=window, sink=sink)
    s2 = jnp.einsum("bhd,bhsd->bhs", q, kr) / np.sqrt(d)
    s2 = jnp.where((pos < lens2[:, None])[:, None, :], s2, -jnp.inf)
    ref2 = jnp.einsum("bhs,bhsd->bhd", jax.nn.softmax(s2, -1), vr)
    err2 = float(jnp.max(jnp.abs(o2 - ref2)))
    assert err2 < 2e-4, err2


def test_decode_windowed_span_grid(rng):
    """max_span: the span-limited grid (blocks offset per-row to the
    window start) matches the full-grid kv_starts path exactly —
    misaligned starts, rows whose live span is shorter than the
    window, and a row starting at 0."""
    batch, qh, kvh, s, d = 4, 4, 2, 1024, 64
    q = jnp.asarray(rng.standard_normal((batch, qh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.float32)
    window = 300
    kv_lens = jnp.asarray([1024, 777, 301, 130], jnp.int32)
    kv_starts = jnp.maximum(kv_lens - window, 0)
    o = flash_decode(q, k, v, kv_lens=kv_lens, kv_starts=kv_starts,
                     max_span=window, block_kv=256)
    o_full_grid = flash_decode(q, k, v, kv_lens=kv_lens,
                               kv_starts=kv_starts, block_kv=256)
    assert float(jnp.max(jnp.abs(o - o_full_grid))) < fp32_kernel_tol()

    cols = jnp.arange(s)
    live = ((cols[None, :] < kv_lens[:, None])
            & (cols[None, :] >= kv_starts[:, None]))
    kk = jnp.repeat(k, qh // kvh, axis=1)
    vv = jnp.repeat(v, qh // kvh, axis=1)
    sc = jnp.einsum("bhd,bhsd->bhs", q, kk) / np.sqrt(d)
    sc = jnp.where(live[:, None, :], sc, -jnp.inf)
    o_ref = jnp.einsum("bhs,bhsd->bhd", jax.nn.softmax(sc, axis=-1), vv)
    assert float(jnp.max(jnp.abs(o - o_ref))) < fp32_kernel_tol()
