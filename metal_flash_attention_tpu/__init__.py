"""metal_flash_attention_tpu — a TPU-native flash-attention engine.

A brand-new JAX / Pallas / pjit framework with the capabilities of the
`imperatormk/metal-flash-attention` reference (a Metal runtime kernel
generator for FlashAttention and GEMM on Apple silicon), re-designed
TPU-first:

- Fused forward attention: QK^T -> online softmax (m, l) -> PV, emitting
  the logsumexp L residual (reference: Sources/FlashAttention/Attention/
  AttentionKernel/AttentionKernel+Source.swift:346-417).
- Atomic-free two-kernel backward: a dQ kernel parallel over query rows
  and a dK/dV kernel parallel over key columns, 9D+15 work model
  (reference: AttentionKernelType.swift:10-23, README.md:39-46).
- Descriptor -> heuristics -> kernel-config resolution with block-size
  tables keyed by head-dim range / dtype / TPU generation, plus an
  autotuner (reference: AttentionDescriptor+Parameters.swift:77-285,
  GEMMDescriptor+PipelineCache.swift:75-119).
- Precision policy engine: FP32/BF16/FP16 compute plus FP8-E4M3/E5M2/
  INT8/NF4 quantized KV with in-kernel dequantization (reference:
  GEMMOperandPrecision.swift:20-96, AttentionKernel+OuterProduct.swift).
- Masking family: causal, sliding window (with block skip), external
  boolean mask, additive bias (reference: AttentionKernel+Softmax.swift).
- Tiled GEMM kernels with transpose support and C-accumulation
  (reference: GEMM/GEMMKernel/*.swift).
- Distribution the reference never had: head/data-parallel sharding via
  shard_map over a Mesh, and ring attention over `ppermute` that lifts
  the associative online-softmax merge from the in-kernel traversal loop
  to inter-chip KV rotation.
"""

__version__ = "0.2.0"

from metal_flash_attention_tpu.ops.flash_attention import flash_attention
from metal_flash_attention_tpu.ops.flash_decode import flash_decode
from metal_flash_attention_tpu.ops.gemm import batched_gemm, gemm
from metal_flash_attention_tpu.ops.quantization import (
    QuantizedMatrix,
    QuantizedTensor,
    quantize,
    quantize_matrix,
)
from metal_flash_attention_tpu.compat import dot_product_attention
from metal_flash_attention_tpu.ops.reference import attention_reference
from metal_flash_attention_tpu.descriptors.attention_descriptor import (
    AttentionDescriptor,
)
from metal_flash_attention_tpu.descriptors.precision import OperandPrecision

__all__ = [
    "flash_attention",
    "flash_decode",
    "dot_product_attention",
    "gemm",
    "batched_gemm",
    "quantize",
    "quantize_matrix",
    "QuantizedTensor",
    "QuantizedMatrix",
    "OperandPrecision",
    "attention_reference",
    "AttentionDescriptor",
    "__version__",
]
