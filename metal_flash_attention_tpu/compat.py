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
    local_window_size    -> window_size; an int means (w, w) exactly
                            as in jax.nn (the right half is moot under
                            is_causal, unsupported otherwise)
    key_value_seq_lengths-> in-kernel segment-id compare (O(N) inputs)
    query_seq_lengths    -> same, on the query axis

Alignment: jax.nn builds its causal/window masks TOP-LEFT aligned
(query position i vs key position j directly), while the kernels'
causal traversal is bottom-right aligned (offset = kv_len - q_len,
the decode convention).  The two coincide when T == S — the fused
fast path.  For T != S the adapter reproduces jax.nn's semantics
exactly through an explicit [1, 1, T, S] mask (the only place the
O(T*S) materialization is accepted; rectangular causal cross-
attention is rare and small).

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

    left = None
    if local_window_size is not None:
        if isinstance(local_window_size, (tuple, list)):
            left, right = (int(x) for x in local_window_size)
        else:
            # jax.nn treats an int w as the symmetric window (w, w).
            left = right = int(local_window_size)
        if right != 0 and not is_causal:
            raise NotImplementedError(
                "right-looking windows are only supported under "
                "is_causal (which masks the right half anyway); use "
                "an explicit mask otherwise")

    aligned = t == s
    causal_kw = is_causal and aligned
    window_kw = None
    if left is not None and aligned:
        # jax.nn's `left` counts keys BEFORE the diagonal; the
        # kernel's window_size spans the visible run including self.
        window_kw = left + 1

    align_mask = None
    if not aligned and (is_causal or left is not None):
        # jax.nn masks are top-left aligned; the kernel's causal
        # offset is bottom-right.  Reproduce jax.nn exactly (see
        # module docstring).
        rows = jnp.arange(t)[:, None]
        cols = jnp.arange(s)[None, :]
        keep = jnp.ones((t, s), bool)
        if is_causal:
            keep &= cols <= rows
        if left is not None:
            keep &= cols >= rows - left
            if not is_causal:
                keep &= cols <= rows  # right half was 0 (asserted)
        align_mask = keep[None, None]

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
    # The kernel's two mask slots AND-combine; mask2 requires mask.
    mask2 = None
    if align_mask is not None:
        if mask is None:
            mask = align_mask
        else:
            mask2 = align_mask

    o = flash_attention(
        q, k, v,
        causal=causal_kw,
        mask=mask,
        mask2=mask2,
        bias=bias,
        window_size=window_kw,
        scale=scale,
        q_segment_ids=q_seg,
        kv_segment_ids=kv_seg,
    )
    return o.transpose(0, 2, 1, 3)
