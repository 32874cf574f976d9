"""Descriptor-driven dispatch facade (the reference's L5 layer).

The reference has no formal facade — its tests demonstrate the
contract: build an `AttentionDescriptor`, resolve kernel descriptors,
compile, bind buffers 0-9 (+10 mask, 11 bias, 12 mask2, 20/21 scales,
30 batched params), dispatch a (seq-blocks x heads x batch) grid
(`SquareAttentionTest.swift:306-380`, SURVEY.md §1 L5).  This module
is that contract as an API: descriptor in, configured callable out,
with the two-level caching the reference implements for GEMM
(`GEMMDescriptor+PipelineCache.swift:10-20`) — level 1 is this
module's config resolution, level 2 is `jax.jit`'s executable cache.
"""

from __future__ import annotations

from typing import Callable

import jax

from metal_flash_attention_tpu.descriptors.attention_descriptor import (
    AttentionDescriptor,
    AttentionKernelType,
)
from metal_flash_attention_tpu.ops.flash_attention import flash_attention

# Level-1 cache: descriptor -> configured callable (the analog of the
# reference's pipelineCache keyed on the problem descriptor).
_DISPATCH_CACHE: dict[AttentionDescriptor, Callable] = {}


def build_attention(descriptor: AttentionDescriptor) -> Callable:
    """Resolve a descriptor to a ready-to-dispatch attention callable.

    The callable signature is (q, k, v, mask=None, bias=None,
    mask2=None) with shapes matching the descriptor.  Quantized-KV
    descriptors expect `QuantizedTensor` K/V.  Configured block sizes
    come from the parameter tables / autotune cache at build time and
    are baked in, so repeated dispatch never re-resolves.
    """
    cached = _DISPATCH_CACHE.get(descriptor)
    if cached is not None:
        return cached

    cfg = descriptor.kernel_config(AttentionKernelType.FORWARD)

    def dispatch(q, k, v, mask=None, bias=None, mask2=None,
                 q_segment_ids=None, kv_segment_ids=None,
                 return_residuals: bool = False):
        assert q.shape == (descriptor.batch, descriptor.q_heads,
                           descriptor.q_len, descriptor.head_dim), (
            f"q shape {q.shape} does not match descriptor {descriptor}")
        assert descriptor.has_mask == (mask is not None)
        assert descriptor.has_mask2 == (mask2 is not None)
        assert descriptor.has_bias == (bias is not None)
        assert descriptor.has_segments == (q_segment_ids is not None)
        out_dtype = (descriptor.output_precision.storage_dtype
                     if descriptor.output_precision is not None else None)
        return flash_attention(
            q, k, v, mask, bias, mask2, q_segment_ids, kv_segment_ids,
            causal=descriptor.causal,
            window_size=descriptor.window_size,
            scale=descriptor.scale,
            block_q=cfg.block_q,
            block_kv=cfg.block_kv,
            return_residuals=return_residuals,
            low_precision_intermediates=(
                descriptor.low_precision_intermediates),
            out_dtype=out_dtype,
        )

    _DISPATCH_CACHE[descriptor] = dispatch
    return dispatch


def clear_dispatch_cache() -> None:
    _DISPATCH_CACHE.clear()


def cache_info() -> dict:
    """Introspection (the reference's C++ cache logs hits/misses,
    GEMMShaderCache.cpp:14-17)."""
    return {
        "dispatch_entries": len(_DISPATCH_CACHE),
        "jit_cache_size": flash_attention._cache_size(),
    }
