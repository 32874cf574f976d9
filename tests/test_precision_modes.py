"""Precision-policy modes: low-precision intermediates + O dtype control.

Reference parity:
- `lowPrecisionIntermediates` (AttentionDescriptor+Precisions.swift:
  34-101) stores L in FP16 and D in BF16 with a measured error bound;
  here both residuals store bf16 (no fp16 TPU datapath) behind
  ``low_precision_intermediates=True``, mixed tolerance tier.
- The FP32-outputs regime (AttentionDescriptor+Precisions.swift:
  103-164): O may be stored wider than the inputs via ``out_dtype``;
  the fp32 accumulator makes this free.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.descriptors.attention_descriptor import (
    AttentionDescriptor,
)
from metal_flash_attention_tpu.descriptors.precision import OperandPrecision
from metal_flash_attention_tpu.dispatch import build_attention
from metal_flash_attention_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_forward,
)
from metal_flash_attention_tpu.ops.flash_attention_bwd import (
    flash_attention_backward,
)
from metal_flash_attention_tpu.utils.tolerances import (
    MIXED_TOL,
    max_abs_err,
)


def _qkv(rng, r, c, d, dtype, bh=(1, 1)):
    b, h = bh
    q = jnp.asarray(rng.standard_normal((b, h, r, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, h, c, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, h, c, d)), dtype)
    return q, k, v


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_lpi_forward_residual_dtype_and_accuracy(rng, dtype):
    q, k, v = _qkv(rng, 256, 384, 64, dtype)
    o32, lse32 = flash_attention_forward(q, k, v)
    o, lse = flash_attention_forward(
        q, k, v, low_precision_intermediates=True)
    assert lse.dtype == jnp.bfloat16
    assert o.dtype == q.dtype
    # O is unaffected by the residual store (same accumulation path).
    assert max_abs_err(o, o32) == 0.0
    # L only loses store precision: half-ulp bf16 rounding of the fp32
    # L.  (The reference's 7e-3 L tier assumes fp16 storage; bf16 has
    # 3 fewer mantissa bits, so the bound scales with |L| * 2^-9.)
    bound = 2.0 ** -8 * (1.0 + float(jnp.max(jnp.abs(
        lse32.astype(jnp.float32)))))
    assert max_abs_err(lse, lse32) <= bound


def test_lpi_backward_matches_full_precision(rng):
    q, k, v = _qkv(rng, 256, 256, 64, jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((1, 1, 256, 64)), jnp.bfloat16)
    o, lse = flash_attention_forward(q, k, v, causal=True,
                                     low_precision_intermediates=True)
    dq, dk, dv = flash_attention_backward(
        q, k, v, do, o, lse, causal=True,
        low_precision_intermediates=True)
    o2, lse2 = flash_attention_forward(q, k, v, causal=True)
    dq2, dk2, dv2 = flash_attention_backward(q, k, v, do, o2, lse2,
                                             causal=True)
    # bf16 L/D storage must stay within the mixed-precision grad tier
    # of the fp32-residual run (reference bound: same tier).
    for a, b_ in ((dq, dq2), (dk, dk2), (dv, dv2)):
        assert max_abs_err(a, b_) < MIXED_TOL.grads


def test_lpi_end_to_end_grad(rng):
    q, k, v = _qkv(rng, 256, 256, 128, jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((1, 1, 256, 128)), jnp.bfloat16)

    def grads(**fn_kwargs):
        _, vjp = jax.vjp(
            lambda q, k, v: flash_attention(q, k, v, causal=True,
                                            **fn_kwargs), q, k, v)
        return vjp(do)

    g_lpi = grads(low_precision_intermediates=True)
    g_ref = grads()
    for a, b_ in zip(g_lpi, g_ref):
        assert max_abs_err(a, b_) < MIXED_TOL.grads


def test_out_dtype_fp32_from_bf16(rng):
    q, k, v = _qkv(rng, 256, 384, 64, jnp.bfloat16)
    o = flash_attention(q, k, v, out_dtype=jnp.float32)
    assert o.dtype == jnp.float32
    o_bf = flash_attention(q, k, v)
    # The wide store must be at least as accurate: casting it back to
    # bf16 reproduces the narrow store exactly (same accumulator).
    assert max_abs_err(o.astype(jnp.bfloat16), o_bf) == 0.0
    # And it genuinely carries sub-bf16 information.
    assert float(jnp.max(jnp.abs(o - o.astype(jnp.bfloat16)
                                 .astype(jnp.float32)))) > 0.0


def test_out_dtype_fp32_grad_path(rng):
    q, k, v = _qkv(rng, 128, 128, 64, jnp.bfloat16)

    def f(q, k, v):
        o = flash_attention(q, k, v, out_dtype=jnp.float32)
        return jnp.sum(o ** 2)

    dq, dk, dv = jax.grad(f, (0, 1, 2))(q, k, v)
    def f2(q, k, v):
        o = flash_attention(q, k, v).astype(jnp.float32)
        return jnp.sum(o ** 2)
    dq2, dk2, dv2 = jax.grad(f2, (0, 1, 2))(q, k, v)
    for a, b_ in ((dq, dq2), (dk, dk2), (dv, dv2)):
        assert a.dtype == q.dtype
        assert max_abs_err(a, b_) < MIXED_TOL.grads


def test_out_dtype_fp16_inputs():
    rng = np.random.default_rng(7)
    q, k, v = _qkv(rng, 128, 128, 64, jnp.float16)
    o = flash_attention(q, k, v, out_dtype=jnp.float32)
    assert o.dtype == jnp.float32


def test_out_dtype_fp16_store(rng):
    """An f16 output request must never reach the kernel's out_shape
    (Mosaic rejects f16): the kernel stores bf16 and the cast happens
    outside.  Checked from bf16 AND fp16 inputs."""
    q, k, v = _qkv(rng, 128, 128, 64, jnp.bfloat16)
    o = flash_attention(q, k, v, out_dtype=jnp.float16)
    assert o.dtype == jnp.float16
    o_ref = flash_attention(q, k, v)
    assert max_abs_err(o.astype(jnp.float32),
                       o_ref.astype(jnp.float32)) < 1e-2
    q16, k16, v16 = _qkv(rng, 128, 128, 64, jnp.float16)
    o2 = flash_attention(q16, k16, v16, out_dtype=jnp.float16)
    assert o2.dtype == jnp.float16


def test_descriptor_wiring(rng):
    q, k, v = _qkv(rng, 128, 128, 64, jnp.bfloat16)
    desc = AttentionDescriptor(
        batch=1, q_heads=1, kv_heads=1, q_len=128, kv_len=128,
        head_dim=64, input_precision=OperandPrecision.BF16,
        output_precision=OperandPrecision.FP32,
        low_precision_intermediates=True)
    fn = build_attention(desc)
    o, lse = fn(q, k, v, return_residuals=True)
    assert o.dtype == jnp.float32
    assert lse.dtype == jnp.bfloat16
