"""Atomic-free two-kernel flash-attention backward (Pallas / TPU).

TPU-native re-design of the reference's backward family
(`Attention/AttentionKernelType.swift:10-23`, `README.md:39-46`):

- ``backwardQuery``: grid parallel over *query rows*; recomputes
  S = Q K^T and P = exp2(S·scale − L), then
  dS = P (dP − D) and dQ += dS K
  (`AttentionKernel+Source.swift:419-463`).
- ``backwardKeyValue``: grid parallel over *key columns*; the reference
  recomputes the transposed world S^T = K Q^T
  (`AttentionKernel+Source.swift:465-518`).  On TPU we instead compute
  S = Q K^T in natural orientation and express dV = P^T dO and
  dK = dS^T Q as contractions over the row dimension
  (`dot_general` with dimension 0 contraction) — the MXU treats both
  orientations identically, so the reference's whole transposed-operand
  machinery collapses into dimension numbers.

No atomics or scatter-adds anywhere: each kernel owns its output tiles
exclusively, the only inter-kernel dataflow is L and D through HBM —
exactly the reference's design, which is *more* idiomatic on TPU where
cross-core accumulation would serialize.

Work model parity: fwd (2D+5)N², dQ (3D+5)N², dK/dV (4D+5)N², total
9D+15 (`README.md:41-46`).

Performance structure (same playbook as the forward kernel, which see):
- Q is pre-scaled by log2(e)·scale so no per-score multiply exists.
- The softmax scale on dS is folded into the *final* dQ/dK store
  (one [b, d] multiply per block strip instead of one per score).
- Traversal blocks split into halves whose matmuls are emitted before
  the VPU chains, letting Mosaic overlap MXU and VPU work.
- Structural masks are one compare of a grid-invariant (cols − rows)
  iota delta against a scalar threshold; no branches.  P for masked
  elements underflows to exactly 0 via exp2(MASK − L), so no select
  is needed on p at all (L is finite: fully-masked rows carry
  L = −inf which is neutralized to 0 before use).

D = rowsum(dO ⊙ O) is precomputed once on the host side (XLA fuses it)
and shared by both kernels, like the reference's D operand written by
backwardQuery and consumed by backwardKeyValue
(`AttentionKernel+Softmax.swift:32-221`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_tpu.ops.flash_attention import (
    GATE_MAGNITUDE,
    LOG2E,
    MASK_VALUE,
    MIN_LANES,
    PIPELINE_HALF,
    RESIDUAL_SUBLANES,
    _block_visible,
    _first_visible_block,
    _last_visible_block,
    flash_attention_forward,
)
from metal_flash_attention_tpu.descriptors.parameters import (
    select_block_sizes,
)
from metal_flash_attention_tpu.utils.shapes import round_up, pad_to


def _make_dq_kernel(
    *, block_q, block_kv, num_halves, num_kv_blocks, q_len, kv_len, scale,
    causal, window_size, has_mask, has_mask2, has_bias, has_segments,
    kv_pad, emit_dbias, out_dtype, precision=None, logit_softcap=None,
):
    scale_log2e = scale * LOG2E
    softcap2 = logit_softcap * LOG2E if logit_softcap else None
    offset = kv_len - q_len
    half = block_kv // num_halves
    needs_when = causal or window_size is not None
    any_struct = (causal or window_size is not None or kv_pad
                  or has_segments)

    def kernel(*refs):
        it = iter(refs)
        q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref = (next(it) for _ in range(6))
        mask_ref = next(it) if has_mask else None
        mask2_ref = next(it) if has_mask2 else None
        bias_ref = next(it) if has_bias else None
        qseg_ref = next(it) if has_segments else None
        kvseg_ref = next(it) if has_segments else None
        dq_ref = next(it)
        dbias_ref = next(it) if emit_dbias else None
        dq_acc = next(it)

        i = pl.program_id(2)
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _init():
            dq_acc[...] = jnp.zeros_like(dq_acc)

        def body():
            q = q_ref[0, 0]
            q = (q.astype(jnp.float32) * scale_log2e).astype(q.dtype)
            do = do_ref[0, 0].astype(jnp.float32)
            lse2 = (lse_ref[0, 0, 0].astype(jnp.float32)
                    * LOG2E)                       # [bq] natural -> base2
            # Fully-masked rows carry L = -inf; exp2(s - (-inf)) would
            # poison the whole tile.  Their P entries must be zero, and
            # with L neutralized to 0 they are: exp2(MASK - 0) = 0.
            lse2 = jnp.where(jnp.isfinite(lse2), lse2, 0.0)
            d_term = d_ref[0, 0, 0].astype(jnp.float32)  # [bq]

            if any_struct:
                delta = (jax.lax.broadcasted_iota(
                             jnp.int32, (block_q, half), 1)
                         - jax.lax.broadcasted_iota(
                             jnp.int32, (block_q, half), 0))
                col_static = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, half), 1)

            if has_segments:
                qseg = qseg_ref[0, :, :1]              # [bq, 1]

            def struct_mask(u):
                em = None
                if has_segments:
                    kvseg = kvseg_ref[0, 0:1,
                                      u * half:(u + 1) * half]
                    em = qseg == kvseg
                if causal:
                    thr = i * block_q + offset - j * block_kv - u * half
                    em_c = delta <= thr
                    em = em_c if em is None else jnp.logical_and(em, em_c)
                if window_size is not None:
                    thr_w = (i * block_q + offset - window_size
                             - j * block_kv - u * half)
                    em_w = delta > thr_w
                    em = em_w if em is None else jnp.logical_and(em, em_w)
                if kv_pad:
                    em_p = col_static < kv_len - j * block_kv - u * half
                    em = em_p if em is None else jnp.logical_and(em, em_p)
                return em

            # MXU batch: every half's S and dP products first.
            ss, dps, gates, tanhs = [], [], [], []
            for u in range(num_halves):
                ku = k_ref[0, 0, u * half:(u + 1) * half, :]
                s = jax.lax.dot_general(
                    q, ku, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                if softcap2 is not None:
                    t = jnp.tanh(s / softcap2)
                    tanhs.append(t)
                    s = softcap2 * t
                if has_bias:
                    s += (bias_ref[0, 0, :, u * half:(u + 1) * half]
                          .astype(jnp.float32) * LOG2E)
                if has_mask:
                    gate = jnp.minimum(jnp.abs(
                        mask_ref[0, 0, :, u * half:(u + 1) * half]
                        .astype(jnp.float32)), 1.0)
                    if has_mask2:
                        gate = gate * jnp.minimum(jnp.abs(
                            mask2_ref[0, 0, :, u * half:(u + 1) * half]
                            .astype(jnp.float32)), 1.0)
                    s = s + (gate - 1.0) * GATE_MAGNITUDE
                    gates.append(gate)
                ss.append(s)
                vu = v_ref[0, 0, u * half:(u + 1) * half, :]
                dps.append(jax.lax.dot_general(
                    do, vu.astype(jnp.float32), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                ))

            acc = dq_acc[...]
            for u in range(num_halves):
                s = ss[u]
                em = struct_mask(u) if any_struct else None
                if em is not None:
                    s = jnp.where(em, s, MASK_VALUE)
                # P recomputed from the L residual.
                p = jnp.exp2(s - lse2[:, None])
                if has_mask:
                    p = p * gates[u]
                ds = p * (dps[u] - d_term[:, None])    # natural units
                if emit_dbias:
                    dbias_ref[0, 0, :, u * half:(u + 1) * half] = (
                        ds.astype(dbias_ref.dtype))
                if softcap2 is not None:
                    # Chain rule through cap*tanh(s/cap): x (1 - tanh^2).
                    ds = ds * (1.0 - tanhs[u] * tanhs[u])
                ku = k_ref[0, 0, u * half:(u + 1) * half, :]
                acc += jax.lax.dot_general(
                    ds.astype(ku.dtype), ku, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
            dq_acc[...] = acc

        if needs_when:
            should_run = _block_visible(
                i, j, block_q=block_q, block_kv=block_kv, causal=causal,
                window_size=window_size, offset=offset, kv_len=kv_len,
            )
            pl.when(should_run)(body)
            if emit_dbias:
                @pl.when(jnp.logical_not(should_run))
                def _zero_dbias():
                    dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])
        else:
            body()

        @pl.when(j == num_kv_blocks - 1)
        def _store():
            # The softmax scale lands here: one multiply per output
            # strip instead of one per score element.
            dq_ref[0, 0] = (dq_acc[...] * scale).astype(out_dtype)

    return kernel


def _make_dkv_kernel(
    *, block_q, block_kv, num_halves, num_q_blocks, q_len, kv_len, scale,
    causal, window_size, has_mask, has_mask2, has_bias, has_segments,
    kv_pad, out_dtype, precision=None, logit_softcap=None, group=1,
):
    scale_log2e = scale * LOG2E
    softcap2 = logit_softcap * LOG2E if logit_softcap else None
    offset = kv_len - q_len
    half = block_q // num_halves
    needs_when = causal or window_size is not None
    any_struct = (causal or window_size is not None or kv_pad
                  or has_segments)

    def kernel(*refs):
        it = iter(refs)
        q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref = (next(it) for _ in range(6))
        mask_ref = next(it) if has_mask else None
        mask2_ref = next(it) if has_mask2 else None
        bias_ref = next(it) if has_bias else None
        qseg_ref = next(it) if has_segments else None
        kvseg_ref = next(it) if has_segments else None
        dk_ref = next(it)
        dv_ref = next(it)
        dk_acc = next(it)
        dv_acc = next(it)

        j = pl.program_id(2)   # kv block — the parallel dimension
        # Traversal enumerates (GQA group member, q block) pairs: the
        # grid runs over *kv* heads and dK/dV accumulate across the
        # whole group in VMEM scratch, so GQA pays no group-times fp32
        # HBM writes + post-hoc reduction (reference design point:
        # per-head grid dispatch, AttentionKernel+Source.swift:35-48;
        # on TPU the group fold is free because grid steps are
        # sequential per core anyway).
        t = pl.program_id(3)
        i = jax.lax.rem(t, num_q_blocks) if group > 1 else t

        @pl.when(t == 0)
        def _init():
            dk_acc[...] = jnp.zeros_like(dk_acc)
            dv_acc[...] = jnp.zeros_like(dv_acc)

        def body():
            k = k_ref[0, 0]
            v = v_ref[0, 0]

            if any_struct:
                # Halves split the *query rows* here, so the delta is
                # (cols - rows) over a [half, block_kv] tile.
                delta = (jax.lax.broadcasted_iota(
                             jnp.int32, (half, block_kv), 1)
                         - jax.lax.broadcasted_iota(
                             jnp.int32, (half, block_kv), 0))
                col_static = jax.lax.broadcasted_iota(
                    jnp.int32, (half, block_kv), 1)

            if has_segments:
                kvseg = kvseg_ref[0, 0:1, :]           # [1, bkv]

            def struct_mask(u):
                em = None
                row0 = i * block_q + u * half
                if has_segments:
                    qseg = qseg_ref[0, u * half:(u + 1) * half, :1]
                    em = qseg == kvseg
                if causal:
                    em_c = delta <= row0 + offset - j * block_kv
                    em = em_c if em is None else jnp.logical_and(em, em_c)
                if window_size is not None:
                    em_w = delta > row0 + offset - window_size - j * block_kv
                    em = em_w if em is None else jnp.logical_and(em, em_w)
                if kv_pad:
                    em_p = col_static < kv_len - j * block_kv
                    em = em_p if em is None else jnp.logical_and(em, em_p)
                return em

            ss, dps, gates, dos, tanhs = [], [], [], [], []
            for u in range(num_halves):
                qu = q_ref[0, 0, u * half:(u + 1) * half, :]
                qu = (qu.astype(jnp.float32) * scale_log2e).astype(qu.dtype)
                s = jax.lax.dot_general(
                    qu, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                if softcap2 is not None:
                    t = jnp.tanh(s / softcap2)
                    tanhs.append(t)
                    s = softcap2 * t
                if has_bias:
                    s += (bias_ref[0, 0, u * half:(u + 1) * half, :]
                          .astype(jnp.float32) * LOG2E)
                if has_mask:
                    gate = jnp.minimum(jnp.abs(
                        mask_ref[0, 0, u * half:(u + 1) * half, :]
                        .astype(jnp.float32)), 1.0)
                    if has_mask2:
                        gate = gate * jnp.minimum(jnp.abs(
                            mask2_ref[0, 0, u * half:(u + 1) * half, :]
                            .astype(jnp.float32)), 1.0)
                    s = s + (gate - 1.0) * GATE_MAGNITUDE
                    gates.append(gate)
                ss.append(s)
                dou = do_ref[0, 0, u * half:(u + 1) * half, :]
                dos.append(dou)
                dps.append(jax.lax.dot_general(
                    dou.astype(jnp.float32), v.astype(jnp.float32),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                ))

            dvacc = dv_acc[...]
            dkacc = dk_acc[...]
            for u in range(num_halves):
                s = ss[u]
                em = struct_mask(u) if any_struct else None
                if em is not None:
                    s = jnp.where(em, s, MASK_VALUE)
                lse2 = (lse_ref[0, 0, 0, u * half:(u + 1) * half]
                        .astype(jnp.float32) * LOG2E)
                lse2 = jnp.where(jnp.isfinite(lse2), lse2, 0.0)
                d_term = (d_ref[0, 0, 0, u * half:(u + 1) * half]
                          .astype(jnp.float32))
                p = jnp.exp2(s - lse2[:, None])        # [half, bkv]
                if has_mask:
                    p = p * gates[u]
                # dV += P^T dO: contraction over the row dimension
                # replaces the reference's explicit S^T world.
                dvacc += jax.lax.dot_general(
                    p.astype(dos[u].dtype), dos[u],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                ds = p * (dps[u] - d_term[:, None])    # natural units
                if softcap2 is not None:
                    ds = ds * (1.0 - tanhs[u] * tanhs[u])
                qu = q_ref[0, 0, u * half:(u + 1) * half, :]
                dkacc += jax.lax.dot_general(
                    ds.astype(qu.dtype), qu, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
            dv_acc[...] = dvacc
            dk_acc[...] = dkacc

        visible = _block_visible(
            i, j, block_q=block_q, block_kv=block_kv, causal=causal,
            window_size=window_size, offset=offset, kv_len=kv_len,
        )
        if needs_when or q_len % block_q != 0:
            should_run = jnp.logical_and(visible, i * block_q < q_len)
            pl.when(should_run)(body)
        else:
            body()

        @pl.when(t == group * num_q_blocks - 1)
        def _store():
            dk_ref[0, 0] = (dk_acc[...] * scale).astype(out_dtype)
            dv_ref[0, 0] = dv_acc[...].astype(out_dtype)

    return kernel


def flash_attention_backward(
    q, k, v, do, o, lse,
    *,
    causal=False, window_size=None, mask=None, bias=None, mask2=None,
    q_segment_ids=None, kv_segment_ids=None, scale=None,
    logit_softcap=None,
    block_q=None, block_kv=None, interpret=None, compute_dbias=False,
    low_precision_intermediates=False,
):
    """Run both backward kernels; returns (dq, dk, dv[, dbias]).

    dK/dV are computed per *query* head and reduced over GQA groups
    afterwards (an XLA reduction, not an atomic — the TPU analog of the
    reference's per-head grid dispatch).
    """
    batch, q_heads, q_len, head_dim = q.shape
    _, kv_heads, kv_len, _ = k.shape
    group = q_heads // kv_heads
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if block_q is None or block_kv is None:
        # Both backward kernels share one (block_q, block_kv) pair so
        # they can share residual padding; take the dQ-kernel row.
        # A causal-sweep autotune winner lives under the "_causal"
        # suffixed key (never overwriting the dense winner); probe it
        # first, then fall back to the shared static rows.
        tq = tkv = None
        if causal:
            from metal_flash_attention_tpu.runtime.autotune import (
                lookup_tuned_blocks,
            )
            tuned = lookup_tuned_blocks("backward_query_causal",
                                        head_dim, q.dtype, q_len)
            if tuned is not None:
                from metal_flash_attention_tpu.descriptors.parameters \
                    import clamp_to_vmem
                tq, tkv = clamp_to_vmem("backward_query", tuned[0],
                                        tuned[1], head_dim, q.dtype)
        if tq is None:
            tq, tkv = select_block_sizes("backward_query", head_dim,
                                         q.dtype, seq_len=q_len)
        block_q = block_q or tq
        block_kv = block_kv or tkv

    d_pad = round_up(head_dim, MIN_LANES)
    block_q = max(min(block_q, round_up(q_len, MIN_LANES)), MIN_LANES)
    block_kv = max(min(block_kv, round_up(kv_len, MIN_LANES)), MIN_LANES)
    r_pad = round_up(q_len, block_q)
    c_pad = round_up(kv_len, block_kv)
    num_q_blocks = r_pad // block_q
    num_kv_blocks = c_pad // block_kv
    # Pipeline halves: the dQ kernel splits KV columns, the dK/dV
    # kernel splits Q rows (each along its traversal dimension).
    nh_kv = (block_kv // PIPELINE_HALF
             if block_kv % PIPELINE_HALF == 0 and block_kv > PIPELINE_HALF
             else 1)
    nh_q = (block_q // PIPELINE_HALF
            if block_q % PIPELINE_HALF == 0 and block_q > PIPELINE_HALF
            else 1)

    precision = (jax.lax.Precision.HIGHEST
                 if jnp.dtype(q.dtype) == jnp.dtype(jnp.float32)
                 else jax.lax.Precision.DEFAULT)

    # D = rowsum(dO * O): shared residual of both kernels
    # (reference's D operand, AttentionKernel+Softmax.swift:32-221).
    d_term = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    qp = pad_to(q, (batch, q_heads, r_pad, d_pad))
    kp = pad_to(k, (batch, kv_heads, c_pad, d_pad))
    vp = pad_to(v, (batch, kv_heads, c_pad, d_pad))
    dop = pad_to(do, (batch, q_heads, r_pad, d_pad))
    # Residuals in the sublane-duplicated layout (see RESIDUAL_SUBLANES).
    # Under low_precision_intermediates both L and D are stored bf16
    # (the reference's L=FP16/D=BF16 mode, AttentionDescriptor+
    # Precisions.swift:34-101; no fp16 TPU datapath) — D is still
    # *computed* in fp32 above and the kernels widen on load.
    res_dtype = (jnp.bfloat16 if low_precision_intermediates
                 else jnp.float32)
    lsep = jnp.broadcast_to(
        pad_to(lse.astype(res_dtype), (batch, q_heads, r_pad))
        [:, :, None, :],
        (batch, q_heads, RESIDUAL_SUBLANES, r_pad))
    dp_ = jnp.broadcast_to(
        pad_to(d_term.astype(res_dtype),
               (batch, q_heads, r_pad))[:, :, None, :],
        (batch, q_heads, RESIDUAL_SUBLANES, r_pad))

    has_mask = mask is not None
    has_mask2 = mask2 is not None
    has_bias = bias is not None
    has_segments = q_segment_ids is not None
    kv_pad = c_pad != kv_len
    offset = kv_len - q_len

    qs_lanes = ks_sub = None
    if has_segments:
        from metal_flash_attention_tpu.ops.flash_attention import (
            MIN_LANES as _ML,
        )
        qs = jnp.pad(q_segment_ids.astype(jnp.int32),
                     ((0, 0), (0, r_pad - q_len)), constant_values=-1)
        ks = jnp.pad(kv_segment_ids.astype(jnp.int32),
                     ((0, 0), (0, c_pad - kv_len)), constant_values=-2)
        qs_lanes = jnp.broadcast_to(
            qs[:, :, None], (batch, r_pad, _ML))
        ks_sub = jnp.broadcast_to(
            ks[:, None, :], (batch, RESIDUAL_SUBLANES, c_pad))

    def _aux_spec(a):
        # Broadcast (size 1) or repeat (divisor) batch/head dims via
        # modulo index maps (the fork's biasRepeatCount semantics).
        bmod, hmod = a.shape[0], a.shape[1]
        return pl.BlockSpec(
            (1, 1, block_q, block_kv),
            lambda b, h, i, j, bm=bmod, hm=hmod: (b % bm, h % hm, i, j),
        )

    mp = mp2 = bp = None
    if has_mask:
        mp = pad_to(mask.astype(jnp.int8), mask.shape[:2] + (r_pad, c_pad))
    if has_mask2:
        mp2 = pad_to(mask2.astype(jnp.int8),
                     mask2.shape[:2] + (r_pad, c_pad))
    if has_bias:
        bp = pad_to(bias, bias.shape[:2] + (r_pad, c_pad))

    def kv_index(b, h, i, j, g=group):
        jj = j
        if causal:
            jj = jnp.minimum(jj, _last_visible_block(
                i, block_q=block_q, block_kv=block_kv, causal=True,
                offset=offset, num_kv_blocks=num_kv_blocks))
        if window_size is not None:
            jj = jnp.maximum(jj, _first_visible_block(
                i, block_q=block_q, block_kv=block_kv,
                window_size=window_size, offset=offset,
                num_kv_blocks=num_kv_blocks))
        return (b, h // g, jj, 0)

    # ---- backwardQuery: grid over rows --------------------------------
    dq_specs = [
        pl.BlockSpec((1, 1, block_q, d_pad), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
        pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
        pl.BlockSpec((1, 1, block_q, d_pad), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, RESIDUAL_SUBLANES, block_q),
                     lambda b, h, i, j: (b, h, 0, i)),
        pl.BlockSpec((1, 1, RESIDUAL_SUBLANES, block_q),
                     lambda b, h, i, j: (b, h, 0, i)),
    ]
    dq_inputs = [qp, kp, vp, dop, lsep, dp_]
    if has_mask:
        dq_specs.append(_aux_spec(mp)); dq_inputs.append(mp)
    if has_mask2:
        dq_specs.append(_aux_spec(mp2)); dq_inputs.append(mp2)
    if has_bias:
        dq_specs.append(_aux_spec(bp)); dq_inputs.append(bp)
    if has_segments:
        dq_specs.append(pl.BlockSpec(
            (1, block_q, qs_lanes.shape[-1]),
            lambda b, h, i, j: (b, i, 0)))
        dq_inputs.append(qs_lanes)

        def kvseg_index(b, h, i, j):
            _, _, jj, _ = kv_index(b, h, i, j)
            return (b, 0, jj)

        dq_specs.append(pl.BlockSpec(
            (1, RESIDUAL_SUBLANES, block_kv), kvseg_index))
        dq_inputs.append(ks_sub)

    emit_dbias = compute_dbias and has_bias
    dq_out_specs = [
        pl.BlockSpec((1, 1, block_q, d_pad), lambda b, h, i, j: (b, h, i, 0)),
    ]
    dq_out_shapes = [
        jax.ShapeDtypeStruct((batch, q_heads, r_pad, d_pad), q.dtype),
    ]
    if emit_dbias:
        dq_out_specs.append(
            pl.BlockSpec((1, 1, block_q, block_kv),
                         lambda b, h, i, j: (b, h, i, j)))
        dq_out_shapes.append(
            jax.ShapeDtypeStruct((batch, q_heads, r_pad, c_pad),
                                 jnp.float32))

    dq_kernel = _make_dq_kernel(
        block_q=block_q, block_kv=block_kv, num_halves=nh_kv,
        num_kv_blocks=num_kv_blocks,
        q_len=q_len, kv_len=kv_len, scale=scale, causal=causal,
        window_size=window_size, has_mask=has_mask, has_mask2=has_mask2,
        has_bias=has_bias, has_segments=has_segments,
        kv_pad=kv_pad, emit_dbias=emit_dbias,
        out_dtype=q.dtype, precision=precision,
        logit_softcap=logit_softcap,
    )
    dq_out = pl.pallas_call(
        dq_kernel,
        grid=(batch, q_heads, num_q_blocks, num_kv_blocks),
        in_specs=dq_specs,
        out_specs=dq_out_specs,
        out_shape=dq_out_shapes,
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*dq_inputs)
    dq = dq_out[0][:, :, :q_len, :head_dim]
    dbias = None
    if emit_dbias:
        dbias_full = dq_out[1][:, :, :q_len, :kv_len]
        # Reduce over broadcasted batch/head dims of the bias input.
        red = []
        if bias.shape[0] == 1:
            red.append(0)
        if bias.shape[1] == 1:
            red.append(1)
        dbias = (jnp.sum(dbias_full, axis=tuple(red), keepdims=True)
                 if red else dbias_full).astype(bias.dtype)

    # ---- backwardKeyValue: grid over columns --------------------------
    # Grid runs over *kv* heads; the traversal dimension t enumerates
    # (group member, q block) pairs so dK/dV accumulate across the GQA
    # group in VMEM scratch (group=1 degenerates to a plain q-block
    # loop).  (i is inside the traversal dim, so K/V block skipping
    # clamps it.)
    def _split_t(t):
        if group == 1:
            return 0, t
        return t // num_q_blocks, t % num_q_blocks

    def _clamp_i(i, j):
        # Clamped into range: the map is evaluated even for blocks the
        # when-guard skips entirely.
        ii = i
        if causal:
            # First visible Q block for KV block j: rows with
            # r + offset >= j*block_kv.
            first = jnp.clip((j * block_kv - offset) // block_q,
                             0, num_q_blocks - 1)
            ii = jnp.maximum(ii, first)
        if window_size is not None:
            # Last Q block whose window still reaches KV block j
            # (largest i with i*bq + offset - window < (j+1)*bkv - 1,
            # the exact complement of _block_visible's window bound).
            lastw = (((j + 1) * block_kv - 2 + window_size - offset)
                     // block_q)
            ii = jnp.minimum(ii, jnp.clip(lastw, 0, num_q_blocks - 1))
        return ii

    def q_index_t(b, h, j, t):
        g, i = _split_t(t)
        return (b, h * group + g, _clamp_i(i, j), 0)

    def q_res_index_t(b, h, j, t):
        g, i = _split_t(t)
        return (b, h * group + g, 0, _clamp_i(i, j))

    dkv_specs = [
        pl.BlockSpec((1, 1, block_q, d_pad), q_index_t),
        pl.BlockSpec((1, 1, block_kv, d_pad),
                     lambda b, h, j, t: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_kv, d_pad),
                     lambda b, h, j, t: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_q, d_pad), q_index_t),
        pl.BlockSpec((1, 1, RESIDUAL_SUBLANES, block_q), q_res_index_t),
        pl.BlockSpec((1, 1, RESIDUAL_SUBLANES, block_q), q_res_index_t),
    ]
    dkv_inputs = [qp, kp, vp, dop, lsep, dp_]

    def _aux_spec_t(a):
        bmod, hmod = a.shape[0], a.shape[1]

        def index(b, h, j, t, bm=bmod, hm=hmod):
            g, i = _split_t(t)
            return (b % bm, (h * group + g) % hm, _clamp_i(i, j), j)

        return pl.BlockSpec((1, 1, block_q, block_kv), index)

    if has_mask:
        dkv_specs.append(_aux_spec_t(mp)); dkv_inputs.append(mp)
    if has_mask2:
        dkv_specs.append(_aux_spec_t(mp2)); dkv_inputs.append(mp2)
    if has_bias:
        dkv_specs.append(_aux_spec_t(bp)); dkv_inputs.append(bp)
    if has_segments:
        def qseg_index(b, h, j, t):
            g, i = _split_t(t)
            return (b, _clamp_i(i, j), 0)

        dkv_specs.append(pl.BlockSpec(
            (1, block_q, qs_lanes.shape[-1]), qseg_index))
        dkv_inputs.append(qs_lanes)
        dkv_specs.append(pl.BlockSpec(
            (1, RESIDUAL_SUBLANES, block_kv),
            lambda b, h, j, t: (b, 0, j)))
        dkv_inputs.append(ks_sub)

    dkv_kernel = _make_dkv_kernel(
        block_q=block_q, block_kv=block_kv, num_halves=nh_q,
        num_q_blocks=num_q_blocks,
        q_len=q_len, kv_len=kv_len, scale=scale, causal=causal,
        window_size=window_size, has_mask=has_mask, has_mask2=has_mask2,
        has_bias=has_bias, has_segments=has_segments,
        kv_pad=kv_pad, out_dtype=jnp.float32,
        precision=precision, logit_softcap=logit_softcap, group=group,
    )
    dk_full, dv_full = pl.pallas_call(
        dkv_kernel,
        grid=(batch, kv_heads, num_kv_blocks, group * num_q_blocks),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda b, h, j, t: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda b, h, j, t: (b, h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, kv_heads, c_pad, d_pad),
                                 jnp.float32),
            jax.ShapeDtypeStruct((batch, kv_heads, c_pad, d_pad),
                                 jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*dkv_inputs)

    dk = dk_full[:, :, :kv_len, :head_dim].astype(k.dtype)
    dv = dv_full[:, :, :kv_len, :head_dim].astype(v.dtype)

    if compute_dbias:
        return dq, dk, dv, dbias
    return dq, dk, dv


# --------------------------------------------------------------------------
# custom_vjp wiring
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16))
def _flash_attention_vjp(
    q, k, v, mask, bias, mask2, q_segment_ids, kv_segment_ids,
    causal, window_size, scale, logit_softcap, block_q, block_kv,
    interpret, low_precision_intermediates=False, out_dtype=None,
):
    return flash_attention_forward(
        q, k, v, causal=causal, window_size=window_size, mask=mask,
        bias=bias, mask2=mask2, q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids, scale=scale,
        logit_softcap=logit_softcap,
        block_q=block_q, block_kv=block_kv,
        interpret=interpret,
        low_precision_intermediates=low_precision_intermediates,
        out_dtype=out_dtype,
    )


def _vjp_fwd(q, k, v, mask, bias, mask2, q_segment_ids, kv_segment_ids,
             causal, window_size, scale, logit_softcap, block_q,
             block_kv, interpret, low_precision_intermediates=False,
             out_dtype=None):
    o, lse = flash_attention_forward(
        q, k, v, causal=causal, window_size=window_size, mask=mask,
        bias=bias, mask2=mask2, q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids, scale=scale,
        logit_softcap=logit_softcap,
        block_q=block_q, block_kv=block_kv,
        interpret=interpret,
        low_precision_intermediates=low_precision_intermediates,
        out_dtype=out_dtype,
    )
    return (o, lse), (q, k, v, mask, bias, mask2, q_segment_ids,
                      kv_segment_ids, o, lse)


def _vjp_bwd(causal, window_size, scale, logit_softcap, block_q,
             block_kv, interpret, low_precision_intermediates,
             out_dtype, residuals, cotangents):
    (q, k, v, mask, bias, mask2, q_segment_ids, kv_segment_ids,
     o, lse) = residuals
    do, _dlse = cotangents
    out = flash_attention_backward(
        q, k, v, do, o, lse,
        causal=causal, window_size=window_size, mask=mask, bias=bias,
        mask2=mask2, q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids, scale=scale,
        logit_softcap=logit_softcap,
        block_q=None, block_kv=None,
        interpret=interpret, compute_dbias=bias is not None,
        low_precision_intermediates=low_precision_intermediates,
    )
    if bias is not None:
        dq, dk, dv, dbias = out
    else:
        dq, dk, dv = out
        dbias = None
    dmask = dmask2 = dqseg = dkvseg = None
    if mask is not None:
        # Boolean/integer operands are non-differentiable.
        dmask = jnp.zeros(mask.shape, dtype=jax.dtypes.float0)
    if mask2 is not None:
        dmask2 = jnp.zeros(mask2.shape, dtype=jax.dtypes.float0)
    if q_segment_ids is not None:
        dqseg = jnp.zeros(q_segment_ids.shape, dtype=jax.dtypes.float0)
        dkvseg = jnp.zeros(kv_segment_ids.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask, dbias, dmask2, dqseg, dkvseg


_flash_attention_vjp.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16))
def _flash_attention_vjp_o(
    q, k, v, mask, bias, mask2, q_segment_ids, kv_segment_ids,
    causal, window_size, scale, logit_softcap, block_q, block_kv,
    interpret, low_precision_intermediates=False, out_dtype=None,
):
    """O-only variant for the common `return_residuals=False` call:
    the primal pallas kernel emits a SINGLE output — a second (L)
    output costs ~3pp of forward utilization on v5e purely in
    out-window bookkeeping (experiments/r04_causal_skeleton.py), and
    XLA cannot DCE an unused output out of an opaque pallas_call.
    Differentiated calls route through the fwd rule below, which does
    emit L (the backward needs it)."""
    o, _ = flash_attention_forward(
        q, k, v, causal=causal, window_size=window_size, mask=mask,
        bias=bias, mask2=mask2, q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids, scale=scale,
        logit_softcap=logit_softcap,
        block_q=block_q, block_kv=block_kv,
        interpret=interpret,
        low_precision_intermediates=low_precision_intermediates,
        out_dtype=out_dtype, emit_lse=False,
    )
    return o


def _vjp_o_fwd(q, k, v, mask, bias, mask2, q_segment_ids,
               kv_segment_ids, causal, window_size, scale,
               logit_softcap, block_q, block_kv, interpret,
               low_precision_intermediates=False, out_dtype=None):
    (o, lse), res = _vjp_fwd(
        q, k, v, mask, bias, mask2, q_segment_ids, kv_segment_ids,
        causal, window_size, scale, logit_softcap, block_q, block_kv,
        interpret, low_precision_intermediates, out_dtype)
    return o, res


def _vjp_o_bwd(causal, window_size, scale, logit_softcap, block_q,
               block_kv, interpret, low_precision_intermediates,
               out_dtype, residuals, do):
    return _vjp_bwd(causal, window_size, scale, logit_softcap, block_q,
                    block_kv, interpret, low_precision_intermediates,
                    out_dtype, residuals, (do, None))


_flash_attention_vjp_o.defvjp(_vjp_o_fwd, _vjp_o_bwd)
