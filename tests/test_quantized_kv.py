"""Quantized KV-cache attention: FP8-E4M3/E5M2, INT8, NF4.

Contract per BASELINE.md: quantized-KV attention must match the
full-precision run within the stated delta (the reference ships these
paths untested — `SURVEY.md §4` "known staleness"; we test all four).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.descriptors.precision import OperandPrecision
from metal_flash_attention_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_forward,
)
from metal_flash_attention_tpu.ops.quantization import (
    QuantizedTensor,
    dequantize,
    quantize,
)
from metal_flash_attention_tpu.ops.reference import attention_reference
from metal_flash_attention_tpu.utils.tolerances import max_abs_err

QUANT_PRECISIONS = [
    OperandPrecision.INT8,
    OperandPrecision.FP8_E4M3,
    OperandPrecision.FP8_E5M2,
    OperandPrecision.NF4,
]

# Max |O_quant - O_fp32| given unit-normal inputs; NF4 is 4-bit.
TOL = {
    OperandPrecision.INT8: 3e-2,
    OperandPrecision.FP8_E4M3: 4e-2,
    OperandPrecision.FP8_E5M2: 8e-2,
    OperandPrecision.NF4: 2e-1,
}


@pytest.mark.parametrize("precision", QUANT_PRECISIONS)
def test_quantize_roundtrip(rng, precision):
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 64)), jnp.float32)
    t = quantize(x, precision)
    x_hat = dequantize(t)
    assert x_hat.shape == x.shape
    rel = float(jnp.max(jnp.abs(x_hat - x)) / jnp.max(jnp.abs(x)))
    budget = {"int8": 2e-2, "fp8_e4m3": 4e-2, "fp8_e5m2": 8e-2,
              "nf4": 2e-1}[precision.value]
    assert rel < budget, (precision, rel)


@pytest.mark.parametrize("precision", QUANT_PRECISIONS)
def test_quantized_kv_forward(rng, precision):
    b, h, n, d = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    kq, vq = quantize(k, precision), quantize(v, precision)

    o, lse = flash_attention_forward(q, kq, vq)
    # Golden: run the exact dequantized KV through the naive model so
    # only the *kernel's* dequant path is under test...
    fn = jax.vmap(jax.vmap(
        lambda a, b_, c: attention_reference(a, b_, c)))
    o_exact = fn(q, dequantize(kq).astype(jnp.float32),
                 dequantize(vq).astype(jnp.float32))
    assert max_abs_err(o, o_exact) < 1e-3, precision

    # ...and separately check the end-to-end quantization error budget
    # vs the full-precision run (the BASELINE delta contract).
    o_fp = fn(q, k, v)
    assert max_abs_err(o, o_fp) < TOL[precision], precision


@pytest.mark.parametrize("precision",
                         [OperandPrecision.INT8, OperandPrecision.FP8_E4M3])
def test_quantized_kv_causal_gqa_decode(rng, precision):
    """GQA decode: 1 query token against a long quantized cache."""
    b, hq, hkv, c, d = 2, 8, 2, 777, 64
    q = jnp.asarray(rng.standard_normal((b, hq, 1, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hkv, c, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, c, d)), jnp.float32)
    kq, vq = quantize(k, precision), quantize(v, precision)

    o = flash_attention(q, kq, vq, causal=True)
    fn = jax.vmap(jax.vmap(
        lambda a, b_, c_: attention_reference(a, b_, c_, causal=True)))
    rep = lambda x: jnp.repeat(x, hq // hkv, axis=1)
    o_ref = fn(q, rep(dequantize(kq)).astype(jnp.float32),
               rep(dequantize(vq)).astype(jnp.float32))
    assert max_abs_err(o, o_ref) < 2e-2


def test_quantized_nf4_odd_head_dim_rejected(rng):
    x = jnp.asarray(rng.standard_normal((1, 1, 8, 7)), jnp.float32)
    with pytest.raises(AssertionError):
        quantize(x, OperandPrecision.NF4)
