"""Runtime layer: device context, kernel-config caching, autotuning.

The TPU analog of the reference's L0 device runtime + L4 pipeline
caching (`Utilities/MTLContext.swift`, `GEMM/GEMMDescriptor/
GEMMDescriptor+PipelineCache.swift`, `Documentation/CppReference/GEMM/
GEMMShaderCache.{hpp,cpp}`).  Where the reference caches compiled Metal
pipelines, on TPU the compiled artifact is the XLA executable held by
`jax.jit`'s cache; this layer caches what sits *above* it — resolved
kernel configurations and measured autotune winners — and persists them
across processes the way the reference's checked-in parameter tables
do.
"""

from metal_flash_attention_tpu.runtime.context import DeviceContext
from metal_flash_attention_tpu.runtime.cache import KernelConfigCache
from metal_flash_attention_tpu.runtime.autotune import autotune_attention

__all__ = ["DeviceContext", "KernelConfigCache", "autotune_attention"]
