"""Distribution layer: mesh construction, head/data-parallel sharded
attention (shard_map), context parallelism, and ring attention.

The reference is a single-device library (`SURVEY.md §2.5`); this layer
is the TPU-native extension that lifts its associative online-softmax
merge ((m,l,O) combine, `AttentionKernel+Softmax.swift:524-581`) from
the in-kernel traversal loop to inter-chip KV rotation.
"""

from metal_flash_attention_tpu.parallel.mesh import (
    CONTEXT_AXIS,
    DATA_AXIS,
    HEAD_AXIS,
    make_mesh,
)
from metal_flash_attention_tpu.parallel.ring_attention import ring_attention
from metal_flash_attention_tpu.parallel.sharded_attention import (
    context_parallel_attention,
    context_parallel_decode,
    sharded_flash_attention,
)

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "HEAD_AXIS",
    "CONTEXT_AXIS",
    "ring_attention",
    "sharded_flash_attention",
    "context_parallel_attention",
    "context_parallel_decode",
]

from metal_flash_attention_tpu.parallel.zigzag import (
    zigzag_ring_attention,
    zigzag_shard,
    zigzag_unshard,
)

__all__ += [
    "zigzag_ring_attention",
    "zigzag_shard",
    "zigzag_unshard",
]

from metal_flash_attention_tpu.parallel.pipeline import (
    STAGE_AXIS,
    make_pipeline_mesh,
    pipeline,
    stack_stage_params,
    stage_param_sharding,
)

__all__ += [
    "pipeline",
    "make_pipeline_mesh",
    "stack_stage_params",
    "stage_param_sharding",
    "STAGE_AXIS",
]
