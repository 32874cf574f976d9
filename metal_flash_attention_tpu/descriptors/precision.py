"""Operand precision enum and policy.

TPU-native analog of `GEMM/GEMMOperandPrecision.swift:20-96`: seven
precisions — FP32 / FP16 / BF16 full-precision plus FP8-E4M3 / FP8-E5M2
/ INT8 / NF4 quantized storage.  Differences from the reference, by
design (SURVEY.md §7.4):

- The reference's "FP8" is a *linear* scheme with zero-point 128, not a
  true FP8 bit layout (`Utilities/QuantizationUtilities.swift:11-13`).
  TPU has native `float8_e4m3fn` / `float8_e5m2` dtypes, so we use the
  real bit layouts; the tolerance contract (match FP16 logits within
  the stated delta) is preserved by the tests.
- On TPU, "register precision" (`registerName`,
  `GEMMOperandPrecision.swift:48-59`) maps to the compute dtype handed
  to the MXU; quantized operands dequantize to bf16/fp32 in-kernel.
- BF16 is native on all TPU generations, so the reference's
  pre-Apple-9 BF16->FP32 promotion heuristic
  (`GEMMDescriptor.swift:192-208`) has no TPU analog.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class OperandPrecision(enum.Enum):
    FP32 = "fp32"
    FP16 = "fp16"
    BF16 = "bf16"
    FP8_E4M3 = "fp8_e4m3"
    FP8_E5M2 = "fp8_e5m2"
    INT8 = "int8"
    NF4 = "nf4"

    @property
    def storage_dtype(self):
        """Dtype of the operand as stored in HBM (reference:
        `memoryName`, GEMMOperandPrecision.swift:32-45)."""
        return {
            OperandPrecision.FP32: jnp.float32,
            OperandPrecision.FP16: jnp.float16,
            OperandPrecision.BF16: jnp.bfloat16,
            OperandPrecision.FP8_E4M3: jnp.float8_e4m3fn,
            OperandPrecision.FP8_E5M2: jnp.float8_e5m2,
            OperandPrecision.INT8: jnp.int8,
            # NF4 is nibble-packed two-per-byte into uint8
            # (QuantizationUtilities.swift:65-91).
            OperandPrecision.NF4: jnp.uint8,
        }[self]

    @property
    def compute_dtype(self):
        """Dtype fed to the MXU after in-kernel dequantization
        (reference: `registerName`, GEMMOperandPrecision.swift:48-59 —
        quantized operands compute in half; on TPU we use bf16)."""
        if self is OperandPrecision.FP32:
            return jnp.float32
        if self is OperandPrecision.FP16:
            return jnp.float16
        return jnp.bfloat16

    @property
    def bits(self) -> int:
        """Storage bits per element (reference: `size`,
        GEMMOperandPrecision.swift:62-75)."""
        return {
            OperandPrecision.FP32: 32,
            OperandPrecision.FP16: 16,
            OperandPrecision.BF16: 16,
            OperandPrecision.FP8_E4M3: 8,
            OperandPrecision.FP8_E5M2: 8,
            OperandPrecision.INT8: 8,
            OperandPrecision.NF4: 4,
        }[self]

    @property
    def requires_scale(self) -> bool:
        """Whether a per-head dequantization scale accompanies the
        operand (reference: GEMMOperandPrecision.swift:78-95)."""
        return self in (
            OperandPrecision.FP8_E4M3, OperandPrecision.FP8_E5M2,
            OperandPrecision.INT8, OperandPrecision.NF4,
        )

    @property
    def is_quantized(self) -> bool:
        return self.requires_scale

    @classmethod
    def from_dtype(cls, dtype) -> "OperandPrecision":
        dt = jnp.dtype(dtype)
        table = {
            jnp.dtype(jnp.float32): cls.FP32,
            jnp.dtype(jnp.float16): cls.FP16,
            jnp.dtype(jnp.bfloat16): cls.BF16,
            jnp.dtype(jnp.float8_e4m3fn): cls.FP8_E4M3,
            jnp.dtype(jnp.float8_e5m2): cls.FP8_E5M2,
            jnp.dtype(jnp.int8): cls.INT8,
        }
        return table[dt]
