"""Drop-in adapters for existing JAX attention call sites.

`jax.nn.dot_product_attention` is the de-facto attention entry point
in JAX codebases (BTNH layout, boolean mask semantics, GQA by head
ratio).  This module exposes the fused kernels behind that exact
signature so a migration is an import swap:

    - import jax.nn as nn; nn.dot_product_attention(q, k, v, ...)
    + from metal_flash_attention_tpu import compat
    + compat.dot_product_attention(q, k, v, ...)

The adapter transposes BTNH <-> BHTD around the kernel (an O(bytes)
relayout, measured <20% of kernel time in
tests/test_performance.py::test_transposed_layout_cost and fused by
XLA where possible) and maps the argument semantics:

    bias / mask          -> additive bias / boolean mask kwargs
    is_causal            -> causal=True
    scale                -> scale (default 1/sqrt(D) matches)
    local_window_size    -> window_size (int, or (left, 0) tuple —
                            the kernels implement causal windows)
    key_value_seq_lengths-> kv_lens-style padding via in-kernel mask
    query_seq_lengths    -> padding mask on the query axis

Everything else (GQA by q_heads % kv_heads == 0, bf16-in/fp32-
accumulate, differentiability) matches `jax.nn` semantics because the
kernels already implement them.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from metal_flash_attention_tpu.ops.flash_attention import flash_attention


def dot_product_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    is_causal: bool = False,
    query_seq_lengths: Optional[jax.Array] = None,
    key_value_seq_lengths: Optional[jax.Array] = None,
    local_window_size=None,
) -> jax.Array:
    """`jax.nn.dot_product_attention`-compatible fused attention.

    query [B, T, N, H], key/value [B, S, K, H] with N % K == 0 (GQA);
    returns [B, T, N, H].  bias/mask broadcast from [B|1, N|1, T, S]
    exactly as in `jax.nn`.
    """
    b, t, n_heads, h = query.shape
    _, s, k_heads, _ = key.shape

    q = query.transpose(0, 2, 1, 3)
    k = key.transpose(0, 2, 1, 3)
    v = value.transpose(0, 2, 1, 3)

    window = None
    if local_window_size is not None:
        if isinstance(local_window_size, (tuple, list)):
            left, right = local_window_size
            if right != 0:
                raise NotImplementedError(
                    "right-looking windows are not supported; use "
                    "local_window_size=(left, 0) or an explicit mask")
        else:
            left = local_window_size
        # jax.nn's `left` counts keys BEFORE the diagonal; the kernel's
        # window_size spans the whole visible run including self.
        window = int(left) + 1

    # Length annotations map onto the kernels' segment-id path: O(N)
    # inputs compared in-kernel (never an O(T*S) external mask).
    # Valid positions get segment 0, padding segment 1 — padded query
    # rows then attend only padded KV (don't-care rows; a fully masked
    # row produces zeros), valid rows see exactly cols < length.
    q_seg = kv_seg = None
    if (query_seq_lengths is not None
            or key_value_seq_lengths is not None):
        qlen = (query_seq_lengths if query_seq_lengths is not None
                else jnp.full((b,), t, jnp.int32))
        kvlen = (key_value_seq_lengths
                 if key_value_seq_lengths is not None
                 else jnp.full((b,), s, jnp.int32))
        q_seg = (jnp.arange(t)[None, :] >= qlen[:, None]).astype(
            jnp.int32)
        kv_seg = (jnp.arange(s)[None, :] >= kvlen[:, None]).astype(
            jnp.int32)

    if mask is not None and mask.dtype != jnp.bool_:
        mask = mask.astype(jnp.bool_)

    o = flash_attention(
        q, k, v,
        causal=is_causal,
        mask=mask,
        bias=bias,
        window_size=window,
        scale=scale,
        q_segment_ids=q_seg,
        kv_segment_ids=kv_seg,
    )
    return o.transpose(0, 2, 1, 3)
