"""Compute ops: fused attention (prefill fwd/bwd, decode), GEMM,
softmax, and KV-cache quantization."""

from metal_flash_attention_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_forward,
)
from metal_flash_attention_tpu.ops.flash_attention_bwd import (
    flash_attention_backward,
)
from metal_flash_attention_tpu.ops.flash_decode import (
    decode_step,
    flash_decode,
)
from metal_flash_attention_tpu.ops.gemm import batched_gemm, gemm
from metal_flash_attention_tpu.ops.paged_attention import (
    PagedKVCache,
    QuantizedPagedKVCache,
    init_paged_cache,
    paged_append,
    paged_decode,
    paged_prefill,
    quantize_paged,
)
from metal_flash_attention_tpu.ops.quantization import (
    QuantizedMatrix,
    QuantizedTensor,
    dequantize,
    dequantize_matrix,
    quantize,
    quantize_matrix,
)
from metal_flash_attention_tpu.ops.reference import attention_reference
from metal_flash_attention_tpu.ops.softmax import (
    derivative_softmax,
    scaled_softmax,
)

__all__ = [
    "flash_attention",
    "flash_attention_forward",
    "flash_attention_backward",
    "flash_decode",
    "decode_step",
    "paged_decode",
    "paged_prefill",
    "paged_append",
    "init_paged_cache",
    "PagedKVCache",
    "QuantizedPagedKVCache",
    "quantize_paged",
    "gemm",
    "batched_gemm",
    "quantize",
    "dequantize",
    "quantize_matrix",
    "dequantize_matrix",
    "QuantizedTensor",
    "QuantizedMatrix",
    "attention_reference",
    "scaled_softmax",
    "derivative_softmax",
]
