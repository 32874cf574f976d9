"""Fused flash-attention forward kernel (Pallas / TPU).

TPU-native re-design of the reference's generated forward attention
kernel (`Sources/FlashAttention/Attention/AttentionKernel/
AttentionKernel+Source.swift:346-417` — loopForward): one fused pass
computing QK^T -> online softmax with running (m, l) statistics ->
P V accumulation, emitting O and the logsumexp residual L for the
backward pass (L = m + log2(l) in the reference,
`AttentionKernel+Caching.swift:371-379`; we expose natural-log L).

Where the reference emits Metal Shading Language strings specialized
per problem and drives 8x8 simdgroup tiles, this kernel is a single
Pallas program tiled for the 128x128 MXU:

- grid = (batch, q_heads, R/block_q, C/block_kv); the first three grid
  dimensions are "parallel" (the reference's threadgroup grid,
  `SquareAttentionTest.swift:328-339`), the last is the sequential
  online-softmax traversal loop.
- The (m, l, acc) state lives in VMEM scratch across the traversal
  loop — the analog of the reference's register-cached Q/O operands
  (`AttentionKernel+Caching.swift:18-281`).
- exp2 trick: log2(e) * scale is folded into *Q itself* before the QK
  product (`AttentionKernel+Softmax.swift:17-26` folds it into the
  product; pre-scaling Q moves the multiply off the [bq, bkv] score
  tile onto the [bq, d] operand — measured +4-20pp on v5e).
- Two-half software pipelining: each traversal block is split into
  halves whose QK products are emitted *before* the softmax chain, so
  Mosaic overlaps half-2's MXU pass with half-1's VPU softmax.
  Measured: 62.8% -> 87% of roofline at D=128/N=4096/bf16 on v5e.
  (The fwd pass is VPU-bound: utilization without overlap closely
  follows (2D+5)/(2D + ops*R) where R ~ 25 is the MXU:VPU throughput
  ratio; reducing softmax ops or overlapping them is worth far more
  than any matmul tuning.)
- Element masks (causal / window / kv padding / segment ids) are
  branch-free: one compare of a grid-invariant (cols - rows) iota
  delta against a scalar threshold (a `lax.cond` around the masked
  path measured 2x slower than unconditional masking).  A `@pl.when`
  guard around the whole body exists only when block-level skipping
  is possible (causal/window), since the guard alone costs ~12pp of
  overlap.
- Causal / sliding-window blocks that are fully masked are skipped at
  block granularity (`AttentionKernel+Source.swift:365-381`), and the
  K/V index maps clamp the block index so skipped steps re-point at an
  already-fetched block instead of burning HBM bandwidth.
- GQA: q_heads may be a multiple of kv_heads; the K/V index map folds
  the group quotient (reference fork: batched multi-head dispatch,
  `AttentionKernel+Source.swift:35-48`).

Causal mid-N plateau (negative results, measured v5e 2026-08): causal
D=128 sits at ~49-53% @ N=4096 / ~62% @ 8192 / ~68-71% @ 16384 of the
*halved* work model, tracking the ceiling 79% / (1 + bkv/N) set by
guard overhead + diagonal-block waste.  Three redesigns all tied with
this kernel within noise and were removed: (a) a folded-pair kernel
(strips i and nq-1-i share a program, traversal enumerates only live
blocks — eliminates skipped steps entirely; both a 4-branch and a
single-predicated-body + stacked-scratch variant), (b) per-half skip
of fully-invisible halves inside the diagonal (masked) body, (c) the
dynamic-traversal kernel at mid N (it wins only at N >= 16K).  Block
sweeps confirm (1024, 2048) is optimal; smaller blocks lose far more
to per-step fixed costs (bq=128/bkv=512 runs at 18%).  Conclusion:
the remaining gap is per-step guard/overlap cost that every design
pays one way or another; don't re-explore without a Mosaic-level
change (e.g. predicated DMA-free guard elision).

r03 external cross-check update (experiments/external_crosscheck.py,
same harness, same day): a TUNED jax.experimental Pallas
flash_attention leads this kernel at mid-N causal by 5-10% (53.9 vs
50.8 @ D=128 N=4096; 47.8 vs 43.1 @ D=256 N=2048) and loses
everywhere else (fwd: 66.5 vs 79.3).  Root cause localized: its lean
block body stays efficient at (512,512) where diagonal-block waste is
halved, while this kernel at (512,512) collapses to 29% (~2x
per-block fixed cost) and must run (1024,1024).  A fourth redesign
should target per-block cost at small blocks, not skip handling —
skipped-step DMA re-pointing *forward* (prefetching the next strip's
first visible block, jax-flash's trick) measured NEUTRAL here
(50.1/42.3 vs 50.8/43.1 pre-change, within session noise) and is
kept only because it costs nothing.

Per-D causal walls (measured v5e 2026-08, full autotune sweeps in the
persistent cache; 7 block candidates each, winner (1024, 1024) at
every D):
- D=256 @ N=2048: 37% of the halved model.  The sweep's winner
  (1.606 ms) is within 8% of FULL attention at the same shape
  (1.732 ms at its own best blocks) — at N = 2 strips x 2 KV blocks
  the diagonal (masked-body) blocks are half of all work, so halving
  the counted work cannot halve the wall time.  Same plateau
  phenomenon as mid-N D=128, amplified by small N/bkv; grows out of
  it with N (the causal/full time ratio improves monotonically).
- D=64 @ N=4096: ~30%, which is exactly the COMPOSITION of the two
  documented walls: D=64 MXU halving (43.9% fwd) x the causal-vs-full
  ratio at N=4096 (53.1/82.1 = 0.65) = 28% — no separate deficit.
Both are geometry, not tuning: every candidate in the per-D sweeps
lands within ~40% of its winner and the winner matches the D=128
row's shape.

D=64 wall (negative result, measured v5e 2026-08, probe checked in at
experiments/d64_mxu_probe.py): D=64 fwd sits at ~42% because BOTH
attention matmuls run at exactly half the MXU rate on the 128x128
array — in-kernel VMEM-resident probes measure QK [1024,64]x[64,2048]
at 26.8% vs 53.8% for the same shape at depth 128, and PV
[1024,2048]x[2048,64] at 45.1% vs 90.0% at 128 output lanes (both
exact 2x).  Packing cannot recover it:
  (a) Q-strip packing (2x rows, [2048,64]x[64,2048]) measured 27.8% —
      m does not fix contraction depth;
  (b) block-diagonal head packing ([Q0|0; 0|Q1] depth 128) IS the
      measured depth-128 shape (53.8%) but only half its output blocks
      are useful -> 26.9% effective, identical to direct D=64; the
      systolic array sums along depth, so keeping two heads separate
      requires block-diagonal weights whose off-diagonal FLOPs are
      pure waste.  Same arithmetic on the PV side (90.0% x 1/2 =
      45.0% = the direct rate);
  (c) GQA sharing does not help: the group shares K/V, so group-packed
      QK is still one depth-64 contraction, and group-packed PV still
      has 64 output lanes;
  (d) zero-padding D to 128 doubles FLOPs at double rate — wall-time
      wash, plus 2x VMEM/HBM for K/V.
The kernel's 42.3% = ~half of the D=128 kernel's ~84%, i.e. it is
already at the geometry wall.  (The Metal reference reports 86% at
D=64 because Apple's simdgroup MMA is 8x8-granular — a platform
difference, not a kernel deficit.)  Don't re-attack without a
hardware-level change (e.g. an MXU mode that splits the array into
two 64-deep halves, which Mosaic does not expose).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_tpu.descriptors.parameters import (
    select_block_sizes,
)
from metal_flash_attention_tpu.descriptors.precision import OperandPrecision
from metal_flash_attention_tpu.ops.quantization import QuantizedTensor
from metal_flash_attention_tpu.utils.shapes import (
    round_up,
    pad_to,
)

LOG2E = math.log2(math.e)
LN2 = math.log(2.0)
# Finite sentinel instead of -inf (avoids exp(-inf - -inf) NaNs); same
# role as the reference's `-max * 0.875 / log2e` constant
# (AttentionKernel+Softmax.swift:228-260).
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
# Magnitude subtracted from logits gated off by the external mask
# (finite, so exp2 flushes to 0 without inf-inf NaNs).
GATE_MAGNITUDE = 1e30
MIN_LANES = 128
# Per-row residuals (L, D) are stored as [batch, heads, 8, r_pad] with
# duplicated sublanes: the minimal layout that satisfies the TPU (8, 128)
# tile constraint for any batch/head count (a 128x-expanded layout like
# some implementations use wastes 16x more HBM bandwidth).
RESIDUAL_SUBLANES = 8
# Traversal blocks split into halves this wide for the MXU/VPU overlap
# pipeline; 1024 measured best on v5e (512-wide halves regress).
PIPELINE_HALF = 1024
# Benchmark/test override for the dynamic-traversal kernel choice:
# None = measured gate, True = dynamic whenever eligible, False = grid.
_FORCE_DYNAMIC: Optional[bool] = None
# Body-variant override for the grid kernel's skip-guarded blocks:
# None = structural policy (see dispatch), True = single always-masked
# body, False = dual interior/masked bodies.  The dual form saves the
# interior blocks' mask compares (~2-4 VPU ops per score tile); the
# single form instantiates HALF the program code under the guard,
# which matters when per-block fixed cost dominates (small blocks).
_SINGLE_BODY: Optional[bool] = None


def _block_visible(
    i, j, *, block_q: int, block_kv: int, causal: bool,
    window_size: Optional[int], offset: int, kv_len: int,
):
    """Whether KV block j contributes anything to Q block i.

    Mirrors the reference's sliding-window / causal block-skip logic
    (`AttentionKernel+Source.swift:365-381`).  `offset = kv_len - q_len`
    aligns the causal diagonal to the sequence ends.
    """
    conds = []
    # Any column of block j in range at all (kv padding).
    conds.append(j * block_kv < kv_len)
    if causal:
        # Lowest visible row of block i sees columns <= i*bq + bq-1 + offset.
        conds.append(j * block_kv <= (i + 1) * block_q - 1 + offset)
    if window_size is not None:
        # Highest row of block i sees columns > i*bq + offset - window.
        conds.append((j + 1) * block_kv - 1 > i * block_q + offset - window_size)
    out = conds[0]
    for c in conds[1:]:
        out = jnp.logical_and(out, c)
    return out


def _last_visible_block(i, *, block_q, block_kv, causal, offset,
                        num_kv_blocks):
    """Largest KV block index with any visible column for Q block i
    (for causal); used to clamp K/V index maps so block-skipped steps
    re-point at a fetched block instead of paying dead DMA."""
    if not causal:
        return num_kv_blocks - 1
    last = ((i + 1) * block_q - 1 + offset) // block_kv
    return jnp.clip(last, 0, num_kv_blocks - 1)


def _first_visible_block(i, *, block_q, block_kv, window_size, offset,
                         num_kv_blocks):
    """Smallest visible KV block index (for sliding window), clamped
    into range — the index map is still evaluated for fully-skipped
    blocks, so it must never go out of bounds."""
    if window_size is None:
        return 0
    first = (i * block_q + offset - window_size + 1) // block_kv
    return jnp.clip(first, 0, num_kv_blocks - 1)


def _make_fwd_kernel(
    *,
    block_q: int,
    block_kv: int,
    num_halves: int,
    num_kv_blocks: int,
    q_len: int,
    kv_len: int,
    scale: float,
    causal: bool,
    window_size: Optional[int],
    has_mask: bool,
    has_mask2: bool,
    has_bias: bool,
    has_segments: bool,
    kv_pad: bool,
    out_dtype,
    precision=None,
    kv_precision=None,
    group: int = 1,
    logit_softcap=None,
    single_body: bool = False,
    emit_lse: bool = True,
):
    scale_log2e = scale * LOG2E
    # Softcap operates on natural-unit logits; in the base-2 domain the
    # same curve is cap2 * tanh(s2 / cap2) with cap2 = cap * log2(e).
    softcap2 = logit_softcap * LOG2E if logit_softcap else None
    offset = kv_len - q_len
    half = block_kv // num_halves
    # Block-level skip guard needed only when whole blocks can be
    # invisible; kv padding alone is handled by the element mask.
    needs_when = causal or window_size is not None
    # Broadcast policy (measured r04, experiments/r04_perstep_ablation
    # .py): Mosaic lowers a [bq, 1] SLICE broadcast (m_next[:, :1] in
    # the p subtract, alpha[:, :1] in the acc update) so poorly at
    # narrow bodies that (512, 512) ran at 36% where an explicit
    # jnp.tile of the full-lane [bq, 128] residual reads 70% — the
    # entire "per-block fixed cost" plateau documented above.  At
    # 1024-wide halves the slice broadcast is the faster form
    # (79% vs 70% tiled at (1024, 2048)), so the tile is gated on
    # body width.  d_pad must be a 128-multiple to tile alpha.
    full_lane_bcast = half <= 512 and half % MIN_LANES == 0

    def kernel(*refs):
        it = iter(refs)
        q_ref = next(it)
        k_ref = next(it)
        v_ref = next(it)
        k_scale_ref = next(it) if kv_precision is not None else None
        v_scale_ref = next(it) if kv_precision is not None else None
        mask_ref = next(it) if has_mask else None
        mask2_ref = next(it) if has_mask2 else None
        bias_ref = next(it) if has_bias else None
        qseg_ref = next(it) if has_segments else None
        kvseg_ref = next(it) if has_segments else None
        o_ref = next(it)
        l_ref = next(it) if emit_lse else None
        m_scr = next(it)
        l_scr = next(it)
        acc_scr = next(it)

        b_idx = pl.program_id(0)
        h_idx = pl.program_id(1)
        i = pl.program_id(2)
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        def body(masked: bool = True, interior_scalar=None):
            # ``masked=False`` is the interior fast path: blocks fully
            # inside the causal/window visible region skip the
            # structural compares (the fwd pass is VPU-bound; the mask
            # chain costs ~2-4 extra VPU ops on the [bq, half] tile).
            # Loaded masks / segment ids still apply on either path.
            # Pre-scale Q once per [bq, d] block: moves the per-score
            # multiply off the [bq, bkv] tile (exp2-trick fold).
            q = q_ref[0, 0]
            q = (q.astype(jnp.float32) * scale_log2e).astype(q.dtype)

            def load_k(u):
                ku = k_ref[0, 0, u * half:(u + 1) * half, :]
                if kv_precision is not None:
                    from metal_flash_attention_tpu.ops.quantization import (
                        dequant_block,
                    )
                    ku = dequant_block(
                        ku, k_scale_ref[b_idx, h_idx // group],
                        kv_precision, q.dtype)
                return ku

            def load_v(u):
                vu = v_ref[0, 0, u * half:(u + 1) * half, :]
                if kv_precision is not None:
                    from metal_flash_attention_tpu.ops.quantization import (
                        dequant_block,
                    )
                    vu = dequant_block(
                        vu, v_scale_ref[b_idx, h_idx // group],
                        kv_precision, q.dtype)
                return vu

            # Emit every half's QK product before any softmax work so
            # the scheduler can overlap half u+1's MXU pass with half
            # u's VPU softmax.
            ss = []
            gates = []
            for u in range(num_halves):
                s = jax.lax.dot_general(
                    q, load_k(u), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                if softcap2 is not None:
                    s = softcap2 * jnp.tanh(s / softcap2)
                if has_bias:
                    s += (bias_ref[0, 0, :, u * half:(u + 1) * half]
                          .astype(jnp.float32) * LOG2E)
                if has_mask:
                    gate = jnp.minimum(jnp.abs(
                        mask_ref[0, 0, :, u * half:(u + 1) * half]
                        .astype(jnp.float32)), 1.0)
                    if has_mask2:
                        # Second mask operand (reference fork:
                        # `attnMask2` @ buffer 12) combines by AND.
                        gate = gate * jnp.minimum(jnp.abs(
                            mask2_ref[0, 0, :, u * half:(u + 1) * half]
                            .astype(jnp.float32)), 1.0)
                    # Loaded masks are applied arithmetically: an i1
                    # vector sourced from memory trips a Mosaic
                    # relayout error when combined with iota-derived
                    # booleans, and a float gate is one VPU mul anyway.
                    s = s + (gate - 1.0) * GATE_MAGNITUDE
                    gates.append(gate)
                ss.append(s)

            # Structural masks are applied *unconditionally* on every
            # visible block: a branch (`lax.cond` or a second `pl.when`
            # level) around the masked path measures ~2x slower than
            # just doing the compare — so the masks are made as cheap
            # as possible instead.  The (cols - rows) delta matrix is
            # a grid-invariant iota, so each mask condition is ONE
            # compare against a scalar threshold.
            any_struct = ((masked and (causal or window_size is not None
                                       or kv_pad))
                          or has_segments)
            # Rows with zero visible columns (when the causal diagonal
            # starts below row 0, or when a q token's segment has no
            # kv tokens) need the explicit p-zero select; otherwise
            # exp2(MASK - m) underflows to exactly 0 on its own.
            needs_p_zero = ((masked
                             and (causal or window_size is not None)
                             and offset < 0) or has_segments)
            if any_struct:
                delta = (jax.lax.broadcasted_iota(
                             jnp.int32, (block_q, half), 1)
                         - jax.lax.broadcasted_iota(
                             jnp.int32, (block_q, half), 0))
                col_static = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, half), 1)

            if has_segments:
                # Segment ids: q ids along sublanes ([bq, 1] slice of
                # the lane-duplicated layout), kv ids along lanes.
                qseg = qseg_ref[0, :, :1]              # [bq, 1]

            def struct_mask(u):
                # delta <= thr  <=>  cols <= rows + offset
                em_seg = None
                if has_segments:
                    kvseg = kvseg_ref[0, 0:1,
                                      u * half:(u + 1) * half]  # [1, half]
                    em_seg = qseg == kvseg
                if not masked:
                    return em_seg
                em = None
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
                if em is not None and interior_scalar is not None:
                    # Select-body form: ONE guarded body; fully-
                    # visible (interior) blocks neutralize the
                    # structural mask with a scalar OR instead of a
                    # second pl.when program (the widened mask costs
                    # one VPU op; the dual instantiation costs per-
                    # step scheduling — measured r04_causal_skeleton).
                    em = jnp.logical_or(em, interior_scalar)
                if em_seg is not None:
                    em = em_seg if em is None \
                        else jnp.logical_and(em, em_seg)
                return em

            m_prev = m_scr[...]
            l_prev = l_scr[...]
            ps, alphas = [], []
            for u in range(num_halves):
                s = ss[u]
                em = struct_mask(u) if any_struct else None
                if em is not None:
                    s = jnp.where(em, s, MASK_VALUE)
                m_next = jnp.maximum(
                    m_prev, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp2(m_prev - m_next)
                if full_lane_bcast:
                    p = jnp.exp2(
                        s - jnp.tile(m_next, (1, half // MIN_LANES)))
                else:
                    p = jnp.exp2(s - m_next[:, :1])
                if has_mask:
                    # The external-mask gate multiplies p exactly, so
                    # fully gated rows keep l = 0 (O = 0, L = -inf)
                    # rather than the exp2(-huge + huge) = 1 degenerate.
                    p = p * gates[u]
                if em is not None and needs_p_zero:
                    # Kill the degenerate fully-masked-row case where
                    # exp2(MASK - MASK) = 1 (reference's masked-row
                    # select, AttentionKernel+Softmax.swift:663-695).
                    p = jnp.where(em, p, 0.0)
                l_prev = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
                m_prev = m_next
                ps.append(p)
                alphas.append(alpha)
            m_scr[...] = m_prev
            l_scr[...] = l_prev

            acc = acc_scr[...]
            d_lanes = acc.shape[-1]
            for u in range(num_halves):
                vu = load_v(u)
                pv = jax.lax.dot_general(
                    ps[u].astype(vu.dtype), vu, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
                # Deferred normalization: O /= l happens once at
                # cleanup (reference's everyIterationScale /
                # lastIterationScale hooks,
                # AttentionKernel+Accumulate.swift:16-21).
                if full_lane_bcast and d_lanes % MIN_LANES == 0:
                    acc = acc * jnp.tile(
                        alphas[u], (1, d_lanes // MIN_LANES)) + pv
                else:
                    acc = acc * alphas[u][:, :1] + pv
            acc_scr[...] = acc

        if needs_when:
            should_run = _block_visible(
                i, j, block_q=block_q, block_kv=block_kv, causal=causal,
                window_size=window_size, offset=offset, kv_len=kv_len,
            )
            # Interior = every element of the block is visible under
            # the structural masks.
            interior = jnp.bool_(True)
            if causal:
                interior = jnp.logical_and(
                    interior,
                    (j + 1) * block_kv - 1 <= i * block_q + offset)
            if window_size is not None:
                interior = jnp.logical_and(
                    interior,
                    j * block_kv > ((i + 1) * block_q - 1 + offset
                                    - window_size))
            if kv_pad:
                interior = jnp.logical_and(
                    interior, (j + 1) * block_kv <= kv_len)
            if single_body == "select":
                # ONE guarded body; interior blocks neutralize the
                # structural mask via a scalar OR inside struct_mask.
                # At narrow bodies this beats the dual instantiation
                # (r04_perstep/causal_skeleton probes); it pays the
                # mask compares on interior blocks like "single" but
                # avoids nothing-visible degenerate rows differently.
                pl.when(should_run)(
                    lambda: body(True, interior_scalar=interior))
            elif single_body:
                # Lean form: one always-masked body.  Interior blocks
                # pay the mask compares, but the guarded region holds
                # half the code — the structural masks are all-visible
                # on interior blocks, so the result is identical.
                pl.when(should_run)(lambda: body(True))
            else:
                # Fast compare-free body on interior blocks; diagonal-
                # crossing / padded blocks take the masked body.
                pl.when(jnp.logical_and(should_run, interior))(
                    lambda: body(False))
                pl.when(jnp.logical_and(should_run,
                                        jnp.logical_not(interior)))(
                    lambda: body(True))
        else:
            body()

        @pl.when(j == num_kv_blocks - 1)
        def _store():
            l_final = l_scr[:, :1]
            safe_l = jnp.where(l_final == 0.0, 1.0, l_final)
            o_ref[0, 0] = (acc_scr[...] / safe_l).astype(out_dtype)
            # The L residual is emitted only when a consumer exists
            # (vjp fwd / return_residuals): a second pallas output
            # costs ~3pp of forward utilization even though its data
            # is tiny (measured r04, experiments/r04_causal_skeleton
            # .py — the out-window bookkeeping, not the bytes).
            if emit_lse:
                m_final = m_scr[:, 0]
                l_vec = l_scr[:, 0]
                lse2 = jnp.where(
                    l_vec > 0.0, m_final + jnp.log2(l_vec), -jnp.inf)
                # Residual layout: (RESIDUAL_SUBLANES, block_q)
                # duplicated sublanes to satisfy the TPU (8, 128) tile
                # constraint.  The cast honors
                # lowPrecisionIntermediates (bf16 L).
                l_ref[0, 0] = jnp.broadcast_to(
                    (lse2 * LN2)[None, :], l_ref.shape[2:]).astype(
                        l_ref.dtype)

    return kernel


def _make_fwd_kernel_dynamic(
    *,
    block_q: int,
    block_kv: int,
    num_halves: int,
    q_len: int,
    kv_len: int,
    scale: float,
    causal: bool,
    window_size: Optional[int],
    has_segments: bool,
    out_dtype,
    precision=None,
    kv_precision=None,
    group: int = 1,
    logit_softcap=None,
    resident: bool = False,
    emit_lse: bool = True,
):
    """Dynamic-traversal forward for causal / sliding-window masks.

    The grid kernel (`_make_fwd_kernel`) skips invisible KV blocks with
    a `pl.when` guard, but a *skipped* Pallas grid step still costs
    ~59% of a live one (measured v5e, D=128 N=4096: causal at
    (1024,1024) runs 0.845x of full time against a 0.625 block-work
    fraction).  This variant removes skipped steps entirely: the grid
    is (batch, q_heads, q_blocks) and the KV traversal is an in-kernel
    `fori_loop` with a *dynamic trip count* — exactly the visible
    blocks [first, last] of this q block — with hand-rolled
    double-buffered K/V DMA from HBM (the same pattern as the decode /
    paged kernels).  The reference's analog is its traversal-loop
    early exit (`AttentionKernel+Source.swift:365-381`); TPU's analog
    of "early exit" is not running the iteration at all.

    Same math as the grid kernel: prescaled Q, two-half MXU/VPU
    overlap, branch-free one-compare element masks, deferred O
    normalization.

    ``resident=True`` (moderate KV lengths): the whole K/V strip rides
    a constant-index BlockSpec — Pallas fetches it once per (b, head)
    and the traversal loop is pure compute over VMEM slices.  Measured
    v5e: a per-block in-kernel DMA pair costs ~2us of fixed overhead
    per loop iteration (issue + wait + scalar bookkeeping), which at
    block_kv=1024 is ~30% of the block's compute; resident mode
    removes it, and the extra HBM traffic of fetching masked-off
    blocks is noise (the full strip is ~1 MB against ~100 us of
    compute per (b, h)).
    """
    scale_log2e = scale * LOG2E
    softcap2 = logit_softcap * LOG2E if logit_softcap else None
    offset = kv_len - q_len
    half = block_kv // num_halves
    # Same tiled-vs-slice residual broadcast policy as the grid
    # kernel (see _make_fwd_kernel's note).
    full_lane_bcast = half <= 512 and half % MIN_LANES == 0
    # Last KV block with any live (non-padding) column — static.
    live_last = (kv_len - 1) // block_kv
    needs_p_zero = (((causal or window_size is not None) and offset < 0)
                    or has_segments)

    def kernel(*refs):
        it = iter(refs)
        q_ref = next(it)
        k_hbm = next(it)
        v_hbm = next(it)
        k_scale_ref = next(it) if kv_precision is not None else None
        v_scale_ref = next(it) if kv_precision is not None else None
        qseg_ref = next(it) if has_segments else None
        kvseg_ref = next(it) if has_segments else None
        o_ref = next(it)
        l_ref = next(it) if emit_lse else None
        m_scr = next(it)
        l_scr = next(it)
        acc_scr = next(it)
        if not resident:
            k_scr = next(it)
            v_scr = next(it)
            sems = next(it)

        b_idx = pl.program_id(0)
        h_idx = pl.program_id(1)
        i = pl.program_id(2)
        h_kv = h_idx // group

        # Visible block range [first, last] for q block i (floor
        # division: offsets may drive the numerators negative).
        last = jnp.int32(live_last)
        if causal:
            last = jnp.minimum(last, jnp.floor_divide(
                (i + 1) * block_q - 1 + offset, block_kv))
        if window_size is not None:
            first = jnp.clip(
                jnp.floor_divide(i * block_q + offset - window_size + 1,
                                 block_kv),
                0, live_last)
        else:
            first = jnp.int32(0)
        n_blocks = jnp.maximum(last - first + 1, 0)

        if not resident:
            def kv_dma(c, slot):
                start = (first + c) * block_kv
                return [
                    pltpu.make_async_copy(
                        k_hbm.at[b_idx, h_kv, pl.ds(start, block_kv)],
                        k_scr.at[slot], sems.at[slot, 0]),
                    pltpu.make_async_copy(
                        v_hbm.at[b_idx, h_kv, pl.ds(start, block_kv)],
                        v_scr.at[slot], sems.at[slot, 1]),
                ]

            @pl.when(n_blocks > 0)
            def _prefetch():
                for dma in kv_dma(0, 0):
                    dma.start()

        q = q_ref[0, 0]
        q = (q.astype(jnp.float32) * scale_log2e).astype(q.dtype)

        if has_segments:
            qseg = qseg_ref[0, :, :1]                  # [bq, 1]

        delta = (jax.lax.broadcasted_iota(jnp.int32, (block_q, half), 1)
                 - jax.lax.broadcasted_iota(jnp.int32, (block_q, half), 0))
        col_static = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, half), 1)

        def dequant(x, scale_ref):
            if kv_precision is None:
                return x
            from metal_flash_attention_tpu.ops.quantization import (
                dequant_block,
            )
            return dequant_block(x, scale_ref[b_idx, h_kv],
                                 kv_precision, q.dtype)

        def make_body(masked: bool):
            """Loop body; ``masked=False`` is the interior fast path —
            blocks fully below the causal diagonal skip every
            structural compare (the fwd pass is VPU-bound, and the
            mask chain is ~4 extra VPU ops on the [bq, bkv] tile: a
            measured +41%/block)."""

            def struct_mask(u, jj):
                em = None
                if has_segments:
                    kvseg = kvseg_ref[0, jj, 0:1,
                                      u * half:(u + 1) * half]  # [1, half]
                    em = qseg == kvseg
                if not masked:
                    return em
                if causal:
                    thr = (i * block_q + offset - jj * block_kv
                           - u * half)
                    em_c = delta <= thr
                    em = em_c if em is None else jnp.logical_and(em, em_c)
                if window_size is not None:
                    thr_w = (i * block_q + offset - window_size
                             - jj * block_kv - u * half)
                    em_w = delta > thr_w
                    em = em_w if em is None else jnp.logical_and(em, em_w)
                # KV-padding columns beyond kv_len (dynamic: only the
                # last live block has them, but jj is dynamic so the
                # compare is unconditional — it is one VPU op).
                em_p = col_static < kv_len - jj * block_kv - u * half
                em = em_p if em is None else jnp.logical_and(em, em_p)
                return em

            def body(c, _):
                jj = first + c
                if resident:
                    k_raw = k_hbm[0, 0, pl.ds(jj * block_kv, block_kv), :]
                else:
                    slot = jax.lax.rem(c, 2)

                    @pl.when(c + 1 < n_blocks)
                    def _():
                        for dma in kv_dma(c + 1, jax.lax.rem(c + 1, 2)):
                            dma.start()

                    for dma in kv_dma(c, slot):
                        dma.wait()
                    k_raw = k_scr[slot]

                k_strip = dequant(k_raw, k_scale_ref)
                # Emit all halves' QK products first (MXU/VPU overlap).
                ss = []
                for u in range(num_halves):
                    s = jax.lax.dot_general(
                        q, k_strip[u * half:(u + 1) * half, :],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    if softcap2 is not None:
                        s = softcap2 * jnp.tanh(s / softcap2)
                    ss.append(s)

                m_prev = m_scr[...]
                l_prev = l_scr[...]
                ps, alphas = [], []
                for u in range(num_halves):
                    s = ss[u]
                    em = struct_mask(u, jj)
                    if em is not None:
                        s = jnp.where(em, s, MASK_VALUE)
                    m_next = jnp.maximum(
                        m_prev, jnp.max(s, axis=1, keepdims=True))
                    alpha = jnp.exp2(m_prev - m_next)
                    if full_lane_bcast:
                        # Tiled full-lane residual broadcast (see the
                        # policy note in _make_fwd_kernel).
                        p = jnp.exp2(
                            s - jnp.tile(m_next, (1, half // MIN_LANES)))
                    else:
                        p = jnp.exp2(s - m_next[:, :1])
                    if em is not None and needs_p_zero:
                        p = jnp.where(em, p, 0.0)
                    l_prev = (alpha * l_prev
                              + jnp.sum(p, axis=1, keepdims=True))
                    m_prev = m_next
                    ps.append(p)
                    alphas.append(alpha)
                m_scr[...] = m_prev
                l_scr[...] = l_prev

                if resident:
                    v_raw = v_hbm[0, 0, pl.ds(jj * block_kv, block_kv), :]
                else:
                    v_raw = v_scr[slot]
                v_strip = dequant(v_raw, v_scale_ref)
                acc = acc_scr[...]
                d_lanes = acc.shape[-1]
                for u in range(num_halves):
                    vu = v_strip[u * half:(u + 1) * half, :]
                    pv = jax.lax.dot_general(
                        ps[u].astype(vu.dtype), vu,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    if full_lane_bcast and d_lanes % MIN_LANES == 0:
                        acc = acc * jnp.tile(
                            alphas[u], (1, d_lanes // MIN_LANES)) + pv
                    else:
                        acc = acc * alphas[u][:, :1] + pv
                acc_scr[...] = acc
                return 0

            return body

        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        if causal and window_size is None:
            # Loop split: blocks wholly below the diagonal (last col
            # <= this q block's min row) take the fast path; the
            # <= ceil(bq/bkv)+1 diagonal-crossing blocks (plus the
            # kv-padding block) take the masked path.
            diag_start = jnp.clip(
                jnp.floor_divide(i * block_q + offset, block_kv),
                0, n_blocks)
            if kv_len % block_kv:
                # Keep the zero-padded last live block on the masked
                # path (its padded columns need the kv_pad compare).
                diag_start = jnp.minimum(diag_start, live_last)
            jax.lax.fori_loop(0, diag_start, make_body(False), 0)
            jax.lax.fori_loop(diag_start, n_blocks, make_body(True), 0)
        else:
            jax.lax.fori_loop(0, n_blocks, make_body(True), 0)

        l_final = l_scr[:, :1]
        safe_l = jnp.where(l_final == 0.0, 1.0, l_final)
        o_ref[0, 0] = (acc_scr[...] / safe_l).astype(out_dtype)
        if emit_lse:
            m_final = m_scr[:, 0]
            l_vec = l_scr[:, 0]
            lse2 = jnp.where(l_vec > 0.0, m_final + jnp.log2(l_vec),
                             -jnp.inf)
            l_ref[0, 0] = jnp.broadcast_to(
                (lse2 * LN2)[None, :], l_ref.shape[2:]).astype(
                    l_ref.dtype)

    return kernel


def flash_attention_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    window_size: Optional[int] = None,
    mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    mask2: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    interpret: Optional[bool] = None,
    low_precision_intermediates: bool = False,
    out_dtype=None,
    emit_lse: bool = True,
):
    """Fused forward attention.

    Args:
        q: [batch, q_heads, q_len, head_dim]
        k, v: [batch, kv_heads, kv_len, head_dim]; q_heads % kv_heads == 0
        mask: optional boolean/int [B, H, q_len, kv_len]; nonzero =
            attend (reference operand `mask` @ buffer 10,
            AttentionOperand.swift:66-88).  B / H may be any divisor of
            batch / q_heads: size-1 broadcasts, and a divisor R < batch
            repeats every R batches — the reference fork's
            `biasRepeatCount` window-attention pattern reuse
            (AttentionDescriptor.swift:49-52,
            AttentionKernel+Source.swift:142-178).
        bias: optional additive float, same [B, H, q_len, kv_len]
            broadcast/repeat rules (reference operand `attnBias` @
            buffer 11).
        mask2: optional second mask, combined with ``mask`` by AND
            (reference fork operand `attnMask2` @ buffer 12).
        q_segment_ids / kv_segment_ids: optional int32 [batch, q_len] /
            [batch, kv_len] for packed-sequence training; position
            pairs attend only within equal segment ids.  O(N) memory —
            the in-kernel compare replaces an O(N^2) external mask.
        window_size: sliding window width (reference `windowSize`,
            AttentionDescriptor.swift:57); position r attends to
            columns in (r + offset - window, r + offset].
        low_precision_intermediates: store the L residual in bf16
            instead of fp32 (the reference's
            `lowPrecisionIntermediates`, AttentionDescriptor+
            Precisions.swift:34-101, which stores L=FP16/D=BF16; TPU
            kernels have no fp16 datapath, so both residuals use
            bf16).  Softmax statistics still accumulate in fp32 —
            only the HBM store narrows.  Mixed tolerance tier.
        out_dtype: O storage dtype; default q.dtype.  An fp32 O from
            bf16 inputs is free — the accumulator is already fp32 and
            only the final store widens (the reference's
            FP32-outputs rationale, AttentionDescriptor+
            Precisions.swift:103-164).

    Returns:
        (o [batch, q_heads, q_len, head_dim], lse [batch, q_heads, q_len])
        with lse the natural-log row logsumexp of scaled logits.
    """
    # Quantized KV cache: unwrap payload + per-(batch, head) scales
    # (reference: quantizedKV descriptor flag, uchar* K/V + K_scale/
    # V_scale buffers, AttentionKernel+Source.swift:216-291).
    kv_precision = None
    k_scales = v_scales = None
    if isinstance(k, QuantizedTensor):
        assert isinstance(v, QuantizedTensor), "K and V must both be quantized"
        assert v.precision == k.precision
        kv_precision = k.precision
        k_scales, v_scales = k.scales, v.scales
        k, v = k.values, v.values
    is_nf4 = (kv_precision is not None
              and kv_precision == OperandPrecision.NF4)

    batch, q_heads, q_len, head_dim = q.shape
    _, kv_heads, kv_len, _ = k.shape
    if is_nf4:
        head_dim = q.shape[-1]  # payload holds head_dim // 2 bytes
    assert q_heads % kv_heads == 0, (q_heads, kv_heads)
    group = q_heads // kv_heads
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if block_q is None or block_kv is None:
        # Resolve from the parameter tables (reference: row selection in
        # AttentionDescriptor+Parameters.swift:41-66), preferring a
        # measured autotune winner when one exists.
        table = ("forward_causal"
                 if causal or window_size is not None else "forward")
        tq, tkv = select_block_sizes(table, head_dim, q.dtype,
                                     seq_len=q_len)
        block_q = block_q or tq
        block_kv = block_kv or tkv

    # Pad to block/lane multiples; the kernel masks padded KV columns
    # and padded head-dim lanes are zeros (contribute nothing).
    # NF4 packs two elements per byte along D, so the logical head dim
    # must pad to 256 for the packed lane dim to stay 128-aligned.
    # Head dims below 128 that are sublane-aligned stay UNPADDED:
    # Mosaic accepts a block whose lane extent equals the full array
    # dim, and padding D=64 to 128 would double every MXU pass.
    if is_nf4:
        d_pad = round_up(head_dim, 2 * MIN_LANES)
    elif head_dim < MIN_LANES and head_dim % 8 == 0:
        d_pad = head_dim
    else:
        d_pad = round_up(head_dim, MIN_LANES)
    d_kv = d_pad // 2 if is_nf4 else d_pad
    block_q = max(min(block_q, round_up(q_len, MIN_LANES)), MIN_LANES)
    block_kv = max(min(block_kv, round_up(kv_len, MIN_LANES)), MIN_LANES)
    r_pad = round_up(q_len, block_q)
    c_pad = round_up(kv_len, block_kv)
    # Pipeline halves: split the traversal block at PIPELINE_HALF.
    num_halves = (block_kv // PIPELINE_HALF
                  if block_kv % PIPELINE_HALF == 0 and block_kv > PIPELINE_HALF
                  else 1)

    if is_nf4:
        # The split-half NF4 layout unpacks payload byte j to elements
        # (j, j + W) where W is the *padded* payload width.  Keep the
        # math consistent under padding by (a) padding the payload with
        # 0x77 — both nibbles index the codebook's exact 0.0 — and
        # (b) re-arranging Q's lanes into the same two-halves layout;
        # O comes back in that layout and is un-shuffled below.
        half = head_dim // 2
        pad_w = d_kv - k.shape[-1]
        pad_c = c_pad - kv_len
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_c), (0, pad_w)),
                     constant_values=0x77)
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_c), (0, pad_w)),
                     constant_values=0x77)
        zpad = jnp.zeros(q.shape[:-1] + (d_kv - half,), q.dtype)
        q_shuf = jnp.concatenate(
            [q[..., :half], zpad, q[..., half:], zpad], axis=-1)
        qp = pad_to(q_shuf, (batch, q_heads, r_pad, d_pad))
    else:
        qp = pad_to(q, (batch, q_heads, r_pad, d_pad))
        kp = pad_to(k, (batch, kv_heads, c_pad, d_kv))
        vp = pad_to(v, (batch, kv_heads, c_pad, d_kv))

    has_mask = mask is not None
    has_mask2 = mask2 is not None
    assert not (has_mask2 and not has_mask), "mask2 requires mask"
    has_bias = bias is not None
    has_segments = q_segment_ids is not None
    assert has_segments == (kv_segment_ids is not None), \
        "q_segment_ids and kv_segment_ids must come together"
    kv_pad = c_pad != kv_len

    num_q_blocks = r_pad // block_q
    num_kv_blocks = c_pad // block_kv
    grid = (batch, q_heads, num_q_blocks, num_kv_blocks)
    offset = kv_len - q_len

    # Causal / sliding-window without loaded mask/bias operands: the
    # dynamic-traversal kernel visits only visible KV blocks (see
    # _make_fwd_kernel_dynamic).  Loaded [bq, bkv] operands would need
    # their own in-kernel DMA plumbing; those shapes fall back to the
    # grid kernel, as does NF4 (packed-lane layout).
    #
    # Gate (measured v5e, D=128): at N=4096 the two designs tie
    # (~750us causal, ~890us window — per-iteration latency dominates
    # either way), but at N=16384 dynamic wins 3494us vs ~4100us
    # (52-55% vs ~44% util-equiv) because the skipped-step population
    # grows with N while the dynamic loop never visits those blocks.
    dynamic_eligible = ((causal or window_size is not None)
                        and not (has_mask or has_bias or has_mask2)
                        and not is_nf4)
    # Resident mode: the K+V strip (plus Q/O/acc blocks) must fit the
    # ~16 MiB of VMEM — budgeted at 2x because Mosaic may double-buffer
    # the strip even on a constant index map (measured: an 8 MiB strip
    # compiles at bq=1024 but OOMs at bq=2048 with a 30 MiB scoped
    # allocation).  Beyond the budget the kernel DMAs per-block from
    # HBM — but an HBM DMA slice needs a 128-aligned lane extent, so
    # unpadded head dims < 128 can only run resident (else grid).
    strip_bytes = 2 * c_pad * d_kv * jnp.dtype(kp.dtype).itemsize
    resident = strip_bytes <= 4 * 1024 * 1024
    if not resident and d_kv % MIN_LANES != 0:
        dynamic_eligible = False
    use_dynamic = dynamic_eligible and kv_len >= 8192
    if _FORCE_DYNAMIC is not None:   # test/benchmark override
        # Bypasses only the length gate; eligibility (operands, NF4,
        # lane alignment) still applies.
        use_dynamic = dynamic_eligible and _FORCE_DYNAMIC
    res_dtype = (jnp.bfloat16 if low_precision_intermediates
                 else jnp.float32)
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else q.dtype
    # Mosaic rejects f16 kernel outputs just like f16 inputs: store
    # bf16 from the kernel, cast on the way out.
    f16_out = out_dtype == jnp.dtype(jnp.float16)
    if f16_out:
        out_dtype = jnp.dtype(jnp.bfloat16)
    if use_dynamic:
        precision = (jax.lax.Precision.HIGHEST
                     if jnp.dtype(q.dtype) == jnp.dtype(jnp.float32)
                     else jax.lax.Precision.DEFAULT)
        kernel = _make_fwd_kernel_dynamic(
            block_q=block_q, block_kv=block_kv, num_halves=num_halves,
            q_len=q_len, kv_len=kv_len,
            scale=scale, causal=causal, window_size=window_size,
            has_segments=has_segments, out_dtype=out_dtype,
            precision=precision, kv_precision=kv_precision, group=group,
            logit_softcap=logit_softcap, resident=resident,
            emit_lse=emit_lse,
        )
        if resident:
            # Whole strip on a constant index map: fetched once per
            # (b, head), revisits are free.
            kv_spec = pl.BlockSpec((1, 1, c_pad, d_kv),
                                   lambda b, h, i, g=group: (b, h // g, 0, 0))
        else:
            # K/V stay in HBM; the kernel DMAs visible blocks itself.
            kv_spec = pl.BlockSpec(memory_space=pl.ANY)
        in_specs = [
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b, h, i: (b, h, i, 0)),
            kv_spec,
            kv_spec,
        ]
        inputs = [qp, kp, vp]
        if kv_precision is not None:
            scale_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
            in_specs += [scale_spec, scale_spec]
            inputs += [k_scales.astype(jnp.float32),
                       v_scales.astype(jnp.float32)]
        if has_segments:
            qs = jnp.pad(q_segment_ids.astype(jnp.int32),
                         ((0, 0), (0, r_pad - q_len)), constant_values=-1)
            ks = jnp.pad(kv_segment_ids.astype(jnp.int32),
                         ((0, 0), (0, c_pad - kv_len)), constant_values=-2)
            qs_lanes = jnp.broadcast_to(
                qs[:, :, None], (batch, r_pad, MIN_LANES))
            # KV ids blocked [batch, nk, 8, bkv]: the kernel indexes
            # block jj dynamically on a non-tiled leading dim.
            ks_blk = jnp.broadcast_to(
                ks.reshape(batch, num_kv_blocks, 1, block_kv),
                (batch, num_kv_blocks, RESIDUAL_SUBLANES, block_kv))
            in_specs.append(pl.BlockSpec(
                (1, block_q, MIN_LANES), lambda b, h, i: (b, i, 0)))
            inputs.append(qs_lanes)
            in_specs.append(pl.BlockSpec(
                (1, num_kv_blocks, RESIDUAL_SUBLANES, block_kv),
                lambda b, h, i: (b, 0, 0, 0)))
            inputs.append(ks_blk)

        out_specs = [pl.BlockSpec((1, 1, block_q, d_pad),
                                  lambda b, h, i: (b, h, i, 0))]
        out_shape = [jax.ShapeDtypeStruct(
            (batch, q_heads, r_pad, d_pad), out_dtype)]
        if emit_lse:
            out_specs.append(
                pl.BlockSpec((1, 1, RESIDUAL_SUBLANES, block_q),
                             lambda b, h, i: (b, h, 0, i)))
            out_shape.append(jax.ShapeDtypeStruct(
                (batch, q_heads, RESIDUAL_SUBLANES, r_pad), res_dtype))
        outs = pl.pallas_call(
            kernel,
            grid=(batch, q_heads, num_q_blocks),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
                pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
                pltpu.VMEM((block_q, d_pad), jnp.float32),
            ] + ([] if resident else [
                pltpu.VMEM((2, block_kv, d_kv), kp.dtype),
                pltpu.VMEM((2, block_kv, d_kv), vp.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ]),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            interpret=interpret,
        )(*inputs)
        o = outs[0][:, :, :q_len, :head_dim]
        if f16_out:
            o = o.astype(jnp.float16)
        if not emit_lse:
            return o, None
        return o, outs[1][:, :, 0, :q_len]

    def kv_index(b, h, i, j, g=group):
        # Skipped blocks re-point FORWARD: steps before the visible
        # range fetch the strip's first visible block, steps after it
        # fetch the NEXT strip's first visible block — every skipped
        # step's DMA slot prefetches the next block the pipeline will
        # genuinely need (consecutive identical indices elide the
        # copy), so strip starts never stall on their first KV fetch.
        # (Re-pointing BACKWARD at an already-fetched block, the r02
        # design, made skips bandwidth-free but left the next strip's
        # first block cold — jax's flash kernel plays this same
        # forward trick with block 0.)
        jj = j
        if causal or window_size is not None:
            last = _last_visible_block(
                i, block_q=block_q, block_kv=block_kv, causal=causal,
                offset=offset, num_kv_blocks=num_kv_blocks)
            first = _first_visible_block(
                i, block_q=block_q, block_kv=block_kv,
                window_size=window_size, offset=offset,
                num_kv_blocks=num_kv_blocks)
            next_first = _first_visible_block(
                i + 1, block_q=block_q, block_kv=block_kv,
                window_size=window_size, offset=offset,
                num_kv_blocks=num_kv_blocks)
            jj = jnp.where(j > last, next_first, jnp.maximum(jj, first))
        return (b, h // g, jj, 0)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d_pad),
                     lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_kv, d_kv), kv_index),
        pl.BlockSpec((1, 1, block_kv, d_kv), kv_index),
    ]
    inputs = [qp, kp, vp]
    if kv_precision is not None:
        # Whole scales array resident in SMEM, indexed by program ids
        # (a tiled (1,1) SMEM block violates the TPU tile constraint).
        scale_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs += [scale_spec, scale_spec]
        inputs += [k_scales.astype(jnp.float32),
                   v_scales.astype(jnp.float32)]

    def _aux_spec(a):
        # Batch/head dims broadcast (size 1) or repeat (any divisor):
        # index = b % B covers both, implementing the reference fork's
        # `biasRepeatCount` pattern reuse as a pure index map.
        assert batch % a.shape[0] == 0 and q_heads % a.shape[1] == 0, (
            f"mask/bias dims {a.shape[:2]} must divide "
            f"({batch}, {q_heads})")
        bmod, hmod = a.shape[0], a.shape[1]
        return pl.BlockSpec(
            (1, 1, block_q, block_kv),
            lambda b, h, i, j, bm=bmod, hm=hmod: (b % bm, h % hm, i, j),
        )

    if has_mask:
        mp = pad_to(mask.astype(jnp.int8), mask.shape[:2] + (r_pad, c_pad))
        in_specs.append(_aux_spec(mp))
        inputs.append(mp)
    if has_mask2:
        mp2 = pad_to(mask2.astype(jnp.int8),
                     mask2.shape[:2] + (r_pad, c_pad))
        in_specs.append(_aux_spec(mp2))
        inputs.append(mp2)
    if has_bias:
        bp = pad_to(bias, bias.shape[:2] + (r_pad, c_pad))
        in_specs.append(_aux_spec(bp))
        inputs.append(bp)
    if has_segments:
        # q ids lane-duplicated (so the kernel slices a [bq, 1] column
        # with no relayout); kv ids sublane-duplicated.  Padded rows
        # get -1 / cols get -2: never equal, so padding self-masks.
        qs = jnp.pad(q_segment_ids.astype(jnp.int32),
                     ((0, 0), (0, r_pad - q_len)), constant_values=-1)
        ks = jnp.pad(kv_segment_ids.astype(jnp.int32),
                     ((0, 0), (0, c_pad - kv_len)), constant_values=-2)
        qs_lanes = jnp.broadcast_to(
            qs[:, :, None], (batch, r_pad, MIN_LANES))
        ks_sub = jnp.broadcast_to(
            ks[:, None, :], (batch, RESIDUAL_SUBLANES, c_pad))
        in_specs.append(pl.BlockSpec(
            (1, block_q, MIN_LANES), lambda b, h, i, j: (b, i, 0)))
        inputs.append(qs_lanes)

        def kvseg_index(b, h, i, j):
            _, _, jj, _ = kv_index(b, h, i, j)
            return (b, 0, jj)

        in_specs.append(pl.BlockSpec(
            (1, RESIDUAL_SUBLANES, block_kv), kvseg_index))
        inputs.append(ks_sub)

    # FP32 inputs demand true FP32 MXU passes (the reference's FP32
    # regime carries a 2e-5 tolerance contract); lower precisions use
    # the native bf16 MXU path.
    precision = (jax.lax.Precision.HIGHEST
                 if jnp.dtype(q.dtype) == jnp.dtype(jnp.float32)
                 else jax.lax.Precision.DEFAULT)
    # Body policy: at narrow bodies (the full-lane-tile regime, see
    # _make_fwd_kernel) the single select-form body wins; at wide
    # bodies the dual interior/masked pair does.  _SINGLE_BODY
    # overrides for probes (True / False / "select").
    if _SINGLE_BODY is not None:
        single_body = _SINGLE_BODY
    else:
        single_body = ("select"
                       if block_kv // num_halves <= 512 else False)
    kernel = _make_fwd_kernel(
        block_q=block_q, block_kv=block_kv, num_halves=num_halves,
        num_kv_blocks=num_kv_blocks,
        q_len=q_len, kv_len=kv_len, scale=scale, causal=causal,
        window_size=window_size, has_mask=has_mask, has_mask2=has_mask2,
        has_bias=has_bias, has_segments=has_segments,
        kv_pad=kv_pad, out_dtype=out_dtype,
        precision=precision, kv_precision=kv_precision, group=group,
        logit_softcap=logit_softcap, single_body=single_body,
        emit_lse=emit_lse,
    )

    out_specs = [pl.BlockSpec((1, 1, block_q, d_pad),
                              lambda b, h, i, j: (b, h, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((batch, q_heads, r_pad, d_pad),
                                      out_dtype)]
    if emit_lse:
        out_specs.append(
            pl.BlockSpec((1, 1, RESIDUAL_SUBLANES, block_q),
                         lambda b, h, i, j: (b, h, 0, i)))
        out_shape.append(jax.ShapeDtypeStruct(
            (batch, q_heads, RESIDUAL_SUBLANES, r_pad), res_dtype))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)

    o = outs[0]
    if is_nf4:
        half = head_dim // 2
        o = jnp.concatenate(
            [o[..., :half], o[..., d_kv:d_kv + half]], axis=-1)
        o = o[:, :, :q_len, :]
    else:
        o = o[:, :, :q_len, :head_dim]
    if f16_out:
        o = o.astype(jnp.float16)
    if not emit_lse:
        return o, None
    return o, outs[1][:, :, 0, :q_len]


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "window_size", "scale", "logit_softcap",
        "block_q", "block_kv", "interpret", "return_residuals",
        "low_precision_intermediates", "out_dtype",
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    mask2: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    window_size: Optional[int] = None,
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    interpret: Optional[bool] = None,
    return_residuals: bool = False,
    low_precision_intermediates: bool = False,
    out_dtype=None,
):
    """Public fused attention entry point (differentiable).

    See :func:`flash_attention_forward` for argument semantics.  The
    backward pass uses the reference's atomic-free two-kernel split
    (dQ kernel over rows, dK/dV kernel over columns; README.md:39-46).

    FP16 inputs (the reference's native low precision) compute in
    bf16 — the TPU MXU has no fp16 datapath and Mosaic rejects f16
    kernels; bf16 compute with fp32 accumulation sits in the same
    mixed-precision tolerance tier — and the output is cast back to
    fp16.
    """
    if jnp.dtype(q.dtype) == jnp.dtype(jnp.float16):
        cast = lambda x: (x.astype(jnp.bfloat16)
                          if isinstance(x, jax.Array)
                          and jnp.dtype(x.dtype) == jnp.dtype(jnp.float16)
                          else x)
        out = flash_attention(
            cast(q), cast(k), cast(v), mask, cast(bias), mask2,
            q_segment_ids, kv_segment_ids, causal=causal,
            window_size=window_size, scale=scale,
            logit_softcap=logit_softcap, block_q=block_q,
            block_kv=block_kv, interpret=interpret,
            return_residuals=return_residuals,
            low_precision_intermediates=low_precision_intermediates,
            out_dtype=out_dtype)
        fin = (lambda x: x) if out_dtype is not None else (
            lambda x: x.astype(jnp.float16))
        if return_residuals:
            o, lse = out
            return fin(o), lse
        return fin(out)

    if isinstance(k, QuantizedTensor):
        # Serving path: quantized KV caches are not differentiated
        # (the reference likewise only generates forward kernels for
        # quantized KV).  L is emitted only when the caller consumes
        # it (a second pallas output costs ~3pp of utilization).
        o, lse = flash_attention_forward(
            q, k, v, causal=causal, window_size=window_size, mask=mask,
            bias=bias, mask2=mask2, q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids, scale=scale,
            logit_softcap=logit_softcap,
            block_q=block_q, block_kv=block_kv,
            interpret=interpret,
            low_precision_intermediates=low_precision_intermediates,
            out_dtype=out_dtype, emit_lse=return_residuals,
        )
        return (o, lse) if return_residuals else o

    from metal_flash_attention_tpu.ops.flash_attention_bwd import (
        _flash_attention_vjp,
        _flash_attention_vjp_o,
    )

    vjp_args = (
        q, k, v, mask, bias, mask2, q_segment_ids, kv_segment_ids,
        causal, window_size, scale, logit_softcap,
        block_q, block_kv, interpret,
        low_precision_intermediates,
        jnp.dtype(out_dtype).name if out_dtype is not None else None,
    )
    if return_residuals:
        return _flash_attention_vjp(*vjp_args)
    # Common case: no residual consumer — the primal kernel emits one
    # output (differentiation still works; the vjp fwd rule computes L).
    return _flash_attention_vjp_o(*vjp_args)
