"""Memory-efficient fused cross-entropy over a chunked vocabulary.

The training loss of every model family here ends in the same shape:
hidden states [T, d] -> lm-head GEMM -> logits [T, V] -> log-softmax
-> NLL gather.  Materializing the [T, V] logits (and the softmax
residual autodiff keeps for it) dominates training-step memory once V
is real (4096 tokens x 128K vocab = 2 GB fp32) and turns the loss into
an HBM-bandwidth problem.

This is the same observation the attention kernels are built on
(ops/flash_attention.py): a softmax whose normalizer is accumulated
*online* never needs its full score row at once.  Applied to the
vocabulary axis:

- forward `lax.scan`s over vocab chunks: each step is one MXU-sized
  GEMM [T, d] x [d, chunk] plus an online (m, s) logsumexp update and
  a branch-free gather of the target column — only [T]-sized state
  survives a step, logits die in registers/VMEM;
- backward recomputes each chunk's logits from the saved lse (the
  flash-attention trick: softmax(chunk) = exp(logits - lse) needs no
  stored probabilities), forms dlogits = (p - onehot) * g, and
  contracts it immediately into dx and that chunk's dW columns.

Everything is `lax.scan` + `dot_general`, no Pallas: the hot op is a
plain GEMM that XLA already runs at roofline; the win is memory
locality, which the chunking provides at the graph level.  Chunk size
trades GEMM efficiency against live memory — 8192 keeps the MXU fed
(d x 8192 weight panels) while bounding live logits to T x 8192.

No reference analog: the Metal reference stops at kernels; this is the
training-objective layer its users would write on top.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from metal_flash_attention_tpu.utils.shapes import round_up


def _mxu_precision(x):
    """The repo-wide precision rule (CLAUDE.md): HIGHEST for fp32
    inputs (TPU DEFAULT would compute fp32 contractions in single-pass
    bf16 — measured 4e-3 absolute logit error vs the naive objective
    on chip, invisible hermetically where DEFAULT is true fp32),
    DEFAULT for bf16."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(x.dtype) == jnp.dtype(jnp.float32)
            else jax.lax.Precision.DEFAULT)


def _chunk_logits(x, w_c, col0, chunk, vocab, softcap):
    """fp32 logits for one vocab chunk (optionally tanh-softcapped,
    Gemma-2 semantics), padded columns forced to -inf so they vanish
    from both the normalizer and the gradient.  Returns (logits,
    dcapped/draw) — the softcap derivative the backward pass needs,
    1.0 where no cap, 0.0 on padded columns (never -inf * 0 = NaN)."""
    logits = jax.lax.dot_general(
        x, w_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(x))
    if softcap is not None:
        capped = softcap * jnp.tanh(logits / softcap)
        deriv = 1.0 - (capped / softcap) ** 2
        logits = capped
    else:
        deriv = jnp.ones_like(logits)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    live = cols < vocab
    return jnp.where(live, logits, -jnp.inf), jnp.where(live, deriv, 0.0)


def _pad_w(w, chunk):
    """Pad [d, V] columns up to a chunk multiple.  The scan steps then
    `dynamic_slice` panels out of this one array — no [n_chunks, d,
    chunk] stack is ever materialized (stacking would copy the entire
    lm head twice per step, fwd and bwd, defeating the memory point
    of the fused loss).  When chunk | V this is the original array."""
    d, vocab = w.shape
    v_pad = round_up(vocab, chunk)
    if v_pad == vocab:
        return w, v_pad // chunk
    return jnp.pad(w, ((0, 0), (0, v_pad - vocab))), v_pad // chunk


def _w_panel(wp, c, chunk):
    return jax.lax.dynamic_slice_in_dim(wp, c * chunk, chunk, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_cross_entropy(x, w, targets, chunk: int = 8192,
                        softcap=None):
    """Per-token NLL [T] fp32 of softmax(x @ w) at ``targets``.

    x: [T, d] hidden states (any float dtype; GEMMs accumulate fp32).
    w: [d, V] lm-head weight.  targets: [T] int32.  ``softcap``
    applies the Gemma-2 final-logit cap softcap*tanh(logit/softcap)
    before the softmax.  Never materializes the [T, V] logits; peak
    live state is [T, chunk] within one scan step.
    """
    nll, _ = _fce_fwd(x, w, targets, chunk, softcap)
    return nll


def _fce_fwd(x, w, targets, chunk, softcap):
    t, d = x.shape
    vocab = w.shape[1]
    wp, n_chunks = _pad_w(w, chunk)

    def step(carry, c):
        m, s, tl = carry
        w_c = _w_panel(wp, c, chunk)
        logits, _ = _chunk_logits(x, w_c, c * chunk, chunk, vocab,
                                  softcap)
        m_new = jnp.maximum(m, logits.max(axis=1))
        s = s * jnp.exp(m - m_new) + jnp.exp(
            logits - m_new[:, None]).sum(axis=1)
        # Branch-free target gather: clip the local column id into
        # range, then keep the value only when the target lives here.
        local = jnp.clip(targets - c * chunk, 0, chunk - 1)
        hit = (targets >= c * chunk) & (targets < (c + 1) * chunk)
        tl = tl + jnp.where(
            hit, jnp.take_along_axis(logits, local[:, None], 1)[:, 0],
            0.0)
        return (m_new, s, tl), None

    init = (jnp.full((t,), -jnp.inf, jnp.float32),
            jnp.zeros((t,), jnp.float32),
            jnp.zeros((t,), jnp.float32))
    (m, s, tl), _ = jax.lax.scan(step, init, jnp.arange(n_chunks))
    lse = m + jnp.log(s)
    return lse - tl, (x, w, targets, lse)


def _fce_bwd(chunk, softcap, res, g):
    x, w, targets, lse = res
    t, d = x.shape
    vocab = w.shape[1]
    wp, n_chunks = _pad_w(w, chunk)

    def step(dx, c):
        w_c = _w_panel(wp, c, chunk)
        logits, deriv = _chunk_logits(x, w_c, c * chunk, chunk, vocab,
                                      softcap)
        p = jnp.exp(logits - lse[:, None])          # softmax, recomputed
        local = jnp.clip(targets - c * chunk, 0, chunk - 1)
        hit = (targets >= c * chunk) & (targets < (c + 1) * chunk)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
                  == local[:, None]) & hit[:, None]
        # Chain through the softcap: d(raw) = d(capped) * dcapped/draw.
        dlogits = (p - onehot.astype(p.dtype)) * g[:, None] * deriv
        dx = dx + jax.lax.dot_general(
            dlogits, w_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(x))
        dw_c = jax.lax.dot_general(
            x, dlogits, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(x))
        return dx, dw_c

    dx, dw_chunks = jax.lax.scan(
        step, jnp.zeros((t, d), jnp.float32), jnp.arange(n_chunks))
    # [n_chunks, d, chunk] -> [d, V]: dW itself must materialize (it
    # IS the gradient); this relayout is its only full-size copy.
    dw = dw_chunks.transpose(1, 0, 2).reshape(d, -1)[:, :vocab]
    return dx.astype(x.dtype), dw.astype(w.dtype), None


fused_cross_entropy.defvjp(_fce_fwd, _fce_bwd)
