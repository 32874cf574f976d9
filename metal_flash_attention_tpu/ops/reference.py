"""Golden reference attention model (pure jnp, FP32).

TPU-native analog of the reference's CPU golden model
(`Tests/FlashAttentionTests/Utilities/Network.swift:61-403`): a naive
O(N^2 D) attention in float32 with analytically-derived gradients under
the loss Phi = sum(dO * O) (`Network.swift:13-59`), so every kernel
output (O, L, D, dQ, dK, dV) has a closed-form golden value.

Conventions (shared with the Pallas kernels in this package):

- Shapes are single-head 2D here: Q [R, D], K/V [C, D].  Batched /
  multi-head goldens are built by `vmap` in the test harness.
- ``L`` is the natural-log row logsumexp of the *scaled* logits
  (the reference stores L = m + log2(l) in base-2 units and its tests
  divide by log2(e) before comparing — `SquareAttentionTest.swift:406-413`;
  we standardize on natural log at every API boundary).
- ``D_term`` is rowsum(dO * O) (the reference's D operand; its tests
  multiply by the 1/sqrt(d) scale before comparing — we keep it
  unscaled, the kernels fold scale into dS instead).
- Fully-masked rows produce P = 0, O = 0, matching the reference's
  masked-row select (`AttentionKernel+Softmax.swift:663-695`).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

# Finite mask value instead of -inf: avoids NaN from exp(-inf - (-inf))
# on fully-masked rows.  Same idea as the reference's
# `-max * 0.875 / log2e` sentinel (AttentionKernel+Softmax.swift:228-260).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _highest_precision(fn):
    """Run the golden model's matmuls at full FP32 precision even on
    TPU, where the default is a single bf16 MXU pass."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped



def _build_logit_mask(
    r: int,
    c: int,
    *,
    causal: bool = False,
    window_size: Optional[int] = None,
    mask: Optional[jax.Array] = None,
) -> Optional[jax.Array]:
    """Boolean [R, C] mask; True = attend.  Combines causal, sliding
    window and an external boolean mask (reference fork features:
    `AttentionDescriptor.swift:31,35,57`)."""
    out = None
    if causal or window_size is not None:
        rows = jnp.arange(r)[:, None]
        cols = jnp.arange(c)[None, :]
        # Rectangular causal: align the diagonal to the *end* of both
        # sequences so decode (R < C) attends to the full prefix.
        offset = c - r
        if causal:
            m = cols <= rows + offset
            out = m if out is None else out & m
        if window_size is not None:
            m = cols > rows + offset - window_size
            out = m if out is None else out & m
    if mask is not None:
        m = mask.astype(bool)
        out = m if out is None else out & m
    return out


@_highest_precision
def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    window_size: Optional[int] = None,
    mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
    return_residuals: bool = False,
):
    """Naive softmax(Q K^T / sqrt(D)) V in FP32.

    Returns O [R, D]; with ``return_residuals`` also returns the
    natural-log row logsumexp L [R].
    """
    r, d = q.shape
    c = k.shape[0]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    q32, k32, v32 = (x.astype(jnp.float32) for x in (q, k, v))
    s = (q32 @ k32.T) * scale
    if logit_softcap is not None:
        # Gemma-2-style soft capping: cap * tanh(s / cap).
        s = logit_softcap * jnp.tanh(s / logit_softcap)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    logit_mask = _build_logit_mask(
        r, c, causal=causal, window_size=window_size, mask=mask
    )
    if logit_mask is not None:
        s = jnp.where(logit_mask, s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    if logit_mask is not None:
        # Fully-masked rows: p would be exp(0)=1 on every masked entry;
        # force those rows to zero like the reference's select.
        any_valid = jnp.any(logit_mask, axis=-1, keepdims=True)
        p = jnp.where(any_valid, jnp.where(logit_mask, p, 0.0), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o = (p / safe_l) @ v32
    if not return_residuals:
        return o
    lse = (m + jnp.log(safe_l))[:, 0]
    return o, lse


@_highest_precision
def attention_reference_grads(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    do: jax.Array,
    *,
    causal: bool = False,
    window_size: Optional[int] = None,
    mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
):
    """Analytic gradients of Phi = sum(dO * O) w.r.t. Q, K, V.

    Mirrors `Network.swift:329-402` (derivativeV/K/Q):
        D   = rowsum(dO * O)
        dV  = P^T dO
        dP  = dO V^T
        dS  = P * (dP - D) * scale
        dQ  = dS K
        dK  = dS^T Q
    Returns (dq, dk, dv, o, lse, d_term).
    """
    r, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    q32, k32, v32, do32 = (x.astype(jnp.float32) for x in (q, k, v, do))
    c = k.shape[0]
    s = (q32 @ k32.T) * scale
    cap_deriv = None
    if logit_softcap is not None:
        # Gemma-2-style soft capping: cap * tanh(s / cap).
        t = jnp.tanh(s / logit_softcap)
        cap_deriv = 1.0 - t * t
        s = logit_softcap * t
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    logit_mask = _build_logit_mask(
        r, c, causal=causal, window_size=window_size, mask=mask
    )
    if logit_mask is not None:
        s = jnp.where(logit_mask, s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p_un = jnp.exp(s - m)
    if logit_mask is not None:
        any_valid = jnp.any(logit_mask, axis=-1, keepdims=True)
        p_un = jnp.where(any_valid, jnp.where(logit_mask, p_un, 0.0), 0.0)
    l = jnp.sum(p_un, axis=-1, keepdims=True)
    safe_l = jnp.where(l == 0.0, 1.0, l)
    p = p_un / safe_l
    o = p @ v32
    lse = (m + jnp.log(safe_l))[:, 0]
    d_term = jnp.sum(do32 * o, axis=-1, keepdims=True)
    dv = p.T @ do32
    dp = do32 @ v32.T
    ds = p * (dp - d_term) * scale
    if cap_deriv is not None:
        ds = ds * cap_deriv
    dq = ds @ k32
    dk = ds.T @ q32
    return dq, dk, dv, o, lse, d_term[:, 0]
