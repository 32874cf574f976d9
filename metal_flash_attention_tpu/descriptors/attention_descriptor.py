"""Problem-level attention descriptor and kernel-config resolution.

TPU-native analog of `Attention/AttentionDescriptor/
AttentionDescriptor.swift:10-76` (the problem descriptor: matrix
dimensions, precision toggles, causal / mask / bias / window / quantized
KV flags, per-operand transposes) and its `kernelDescriptor(type:)`
resolution (`:82-187`) that consults the parameter tables and the
precision policy (`AttentionDescriptor+Precisions.swift`).

On TPU the "kernel descriptor" resolves to a :class:`KernelConfig`
(block sizes + compute dtypes) that parameterizes one of three Pallas
programs — forward, backwardQuery, backwardKeyValue
(`AttentionKernelType.swift:10-23`).  Transposes are not part of the
TPU kernel space: `dot_general` dimension numbers absorb them at zero
cost, so the descriptor canonicalizes all operands to [B, H, N, D].
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from metal_flash_attention_tpu.descriptors.parameters import (
    _TABLES,
    clamp_to_vmem,
    select_block_sizes,
    tpu_generation,
)
from metal_flash_attention_tpu.descriptors.precision import OperandPrecision


class AttentionKernelType(enum.Enum):
    """The three-kernel family (AttentionKernelType.swift:10-23)."""
    FORWARD = "forward"                      # computes O, L
    BACKWARD_QUERY = "backward_query"        # computes dQ; needs L, D
    BACKWARD_KEY_VALUE = "backward_key_value"  # computes dK, dV; needs L, D


@dataclass(frozen=True)
class KernelConfig:
    """Resolved per-kernel configuration (reference:
    AttentionKernelDescriptor.swift:8-80)."""
    kernel_type: AttentionKernelType
    block_q: int
    block_kv: int
    head_dim: int
    compute_dtype: object
    accumulator_dtype: object = jnp.float32


@dataclass(frozen=True)
class AttentionDescriptor:
    """Problem description; hashable, serves as the kernel-cache key
    (the reference's canonical `GEMMKey`-style identity,
    GEMMDescriptor.swift:49-90)."""
    batch: int = 1
    q_heads: int = 1
    kv_heads: int = 1
    q_len: int = 1
    kv_len: int = 1
    head_dim: int = 64
    # Precision toggles (AttentionDescriptor.swift:11-27).
    input_precision: OperandPrecision = OperandPrecision.FP32
    # Storage precision of O; None -> same as inputs.  FP32 outputs
    # from bf16 inputs are free (fp32 accumulator, only the final
    # store widens) — the reference's !lowPrecisionOutputs regime
    # (AttentionDescriptor+Precisions.swift:103-164).
    output_precision: Optional[OperandPrecision] = None
    # Store the L/D softmax residuals in bf16 instead of fp32 — the
    # reference's lowPrecisionIntermediates (AttentionDescriptor+
    # Precisions.swift:34-101; L=FP16/D=BF16 there, both bf16 here as
    # TPU kernels have no fp16 datapath).  Statistics still
    # accumulate fp32; only the HBM store narrows.
    low_precision_intermediates: bool = False
    kv_precision: Optional[OperandPrecision] = None  # quantized KV cache
    # Masking family (AttentionDescriptor.swift:31-57; fork operands
    # mask @10, attnBias @11, attnMask2 @12, AttentionOperand.swift).
    causal: bool = False
    has_mask: bool = False
    has_mask2: bool = False
    has_bias: bool = False
    # Packed-sequence segment ids (no reference analog; production
    # training feature, O(N) replacement for an O(N^2) mask).
    has_segments: bool = False
    window_size: Optional[int] = None
    # Softmax scale; None -> 1/sqrt(head_dim).
    scale: Optional[float] = None
    # Gemma-2-style cap * tanh(s / cap) on attention logits.
    logit_softcap: Optional[float] = None

    @property
    def resolved_scale(self) -> float:
        return (self.scale if self.scale is not None
                else 1.0 / math.sqrt(self.head_dim))

    @property
    def quantized_kv(self) -> bool:
        return self.kv_precision is not None and self.kv_precision.is_quantized

    def kernel_config(
        self,
        kernel_type: AttentionKernelType,
        *,
        generation: Optional[str] = None,
        block_q: Optional[int] = None,
        block_kv: Optional[int] = None,
    ) -> KernelConfig:
        """Resolve block dimensions from the parameter tables
        (reference: AttentionDescriptor.swift:82-187).

        Causal/windowed problems resolve the `_causal` table variant
        (narrower KV blocks near the diagonal), and the problem's
        q_len reaches the autotune-winner lookup — the same resolution
        the kernels perform when called directly, so the facade and
        the kwargs API always agree on block geometry."""
        compute = self.input_precision.compute_dtype
        table = kernel_type.value
        bq = bkv = None
        if self.causal or self.window_size is not None:
            causal_table = f"{table}_causal"
            if causal_table in _TABLES:
                table = causal_table
            else:
                # Backward kernels have no static causal rows; a
                # causal-sweep autotune winner still lives under the
                # suffixed key (mirrors flash_attention_bwd dispatch).
                from metal_flash_attention_tpu.runtime.autotune import (
                    lookup_tuned_blocks,
                )
                tuned = lookup_tuned_blocks(causal_table, self.head_dim,
                                            compute, self.q_len)
                if tuned is not None:
                    # Stale or foreign-device cache entries can carry
                    # an over-budget pair (the r03 chip session
                    # persisted (1024, 2048) from a dQ-only sweep and
                    # the dKV kernel OOM'd scoped VMEM) — re-validate
                    # like the other two tuned-lookup call sites
                    # (ADVICE r3 low).
                    bq, bkv = clamp_to_vmem(causal_table, tuned[0],
                                            tuned[1], self.head_dim,
                                            compute)
        if bq is None:
            bq, bkv = select_block_sizes(
                table, self.head_dim, compute,
                generation=generation or tpu_generation(),
                seq_len=self.q_len,
            )
        return KernelConfig(
            kernel_type=kernel_type,
            block_q=block_q or bq,
            block_kv=block_kv or bkv,
            head_dim=self.head_dim,
            compute_dtype=compute,
        )
