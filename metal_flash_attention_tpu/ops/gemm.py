"""Tiled GEMM kernel (Pallas / TPU).

TPU-native re-design of the reference's GEMM half
(`GEMM/GEMMKernel/*.swift`): C = A B with per-operand transposes,
optional accumulation into a previous C (`loadPreviousC`,
`GEMMDescriptor.swift:11-47`), mixed per-operand precisions, and
arbitrary (misaligned) problem sizes.

Where the reference emits an MSL kernel per (block geometry, precision,
transpose) tuple with async-copy edge handling
(`GEMMKernel+Multiply.swift:113-213`, `GEMMKernel+Caching.swift:36-205`),
on TPU one Pallas program covers the space:

- The K loop is the third grid dimension with a VMEM fp32 accumulator
  (the reference's 8x8 register accumulators -> one [bm, bn] tile).
- Transposes are absorbed by `dot_general` dimension numbers and
  BlockSpec index maps; no transposed-copy code paths.
- Edge blocks are handled by host-side padding (XLA-fused) instead of
  the reference's block-shift-into-bounds trick
  (`GEMMKernel+Source.swift:55-76`).
- `loadPreviousC` folds the prior C into the accumulator on the first
  K step.

Backend routing — a deliberate TPU-first design decision: XLA's
native dot IS the vendor GEMM on TPU and measures 89-93% of the MXU
roofline at large sizes where the best Pallas schedule we found stops
at ~77% (v5e, bf16; misaligned 513-sized probes are 4x better through
XLA).  The reference hand-rolled GEMM because Apple's vendor path was
slow (`README.md` positions MFA against MPS); on TPU the honest
equivalent is to ROUTE to `jax.lax.dot_general` by default and keep
the Pallas kernel for what XLA does not give us — explicit block-level
control for fused variants and a verification target for the
descriptor/autotune machinery.  `backend="pallas"` forces the custom
kernel; `backend="xla"` forces the native path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_tpu.utils.shapes import pad_to, round_up


def _make_gemm_kernel(*, num_k_blocks, load_previous_c, out_dtype,
                      precision, dimension_numbers):
    def kernel(*refs):
        it = iter(refs)
        a_ref = next(it)
        b_ref = next(it)
        c_prev_ref = next(it) if load_previous_c else None
        o_ref = next(it)
        acc = next(it)

        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _init():
            if load_previous_c:
                acc[...] = c_prev_ref[...].astype(jnp.float32)
            else:
                acc[...] = jnp.zeros_like(acc)

        # Transposed operands are handled purely by contraction
        # dimension numbers — the MXU ingests either orientation, so
        # the reference's four transpose code paths
        # (GEMMKernel+Multiply.swift) collapse into `dimension_numbers`.
        acc[...] += jax.lax.dot_general(
            a_ref[...], b_ref[...], dimension_numbers,
            preferred_element_type=jnp.float32, precision=precision,
        )

        @pl.when(kk == num_k_blocks - 1)
        def _store():
            o_ref[...] = acc[...].astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("transpose_a", "transpose_b", "out_dtype",
                     "block_m", "block_n", "block_k", "interpret",
                     "backend"),
)
def gemm(
    a: jax.Array,
    b: jax.Array,
    c: Optional[jax.Array] = None,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    backend: str = "auto",
):
    """C = op(A) op(B) [+ C_prev].

    op(A) is [M, K] (A is [K, M] when ``transpose_a``); op(B) is [K, N].
    ``c`` enables the reference's `loadPreviousC` accumulation.
    Block sizes default to the descriptor heuristic / autotune cache
    (descriptors.gemm_descriptor.GEMMDescriptor.kernel_config).

    ``backend``: "auto" routes to XLA's native dot (see module
    docstring); explicit block sizes or "pallas" select the custom
    kernel.
    """
    if (jnp.dtype(a.dtype) == jnp.dtype(jnp.float16)
            or jnp.dtype(b.dtype) == jnp.dtype(jnp.float16)):
        # Mosaic rejects f16 kernels (no fp16 MXU datapath): compute
        # in bf16 and cast back — same contract as flash_attention.
        out16 = out_dtype or jnp.promote_types(a.dtype, b.dtype)
        out = gemm(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   None if c is None else c.astype(jnp.bfloat16),
                   transpose_a=transpose_a, transpose_b=transpose_b,
                   out_dtype=jnp.bfloat16, block_m=block_m,
                   block_n=block_n, block_k=block_k,
                   interpret=interpret, backend=backend)
        return out.astype(out16)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, k = (a.shape[1], a.shape[0]) if transpose_a else a.shape
    kb, n = (b.shape[1], b.shape[0]) if transpose_b else b.shape
    assert k == kb, (a.shape, b.shape, transpose_a, transpose_b)

    explicit_blocks = (block_m is not None or block_n is not None
                       or block_k is not None)
    if backend == "xla" or (backend == "auto" and not explicit_blocks):
        if out_dtype is None:
            out_dtype = jnp.promote_types(a.dtype, b.dtype)
        precision = (
            jax.lax.Precision.HIGHEST
            if (jnp.dtype(a.dtype) == jnp.dtype(jnp.float32)
                or jnp.dtype(b.dtype) == jnp.dtype(jnp.float32))
            else jax.lax.Precision.DEFAULT)
        a_contract = 0 if transpose_a else 1
        b_contract = 1 if transpose_b else 0
        out = jax.lax.dot_general(
            a, b, (((a_contract,), (b_contract,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        if c is not None:
            out = out + c.astype(jnp.float32)
        return out.astype(out_dtype)

    if block_m is None or block_n is None or block_k is None:
        from metal_flash_attention_tpu.descriptors.gemm_descriptor import (
            GEMMDescriptor,
        )
        from metal_flash_attention_tpu.descriptors.precision import (
            OperandPrecision,
        )
        cfg = GEMMDescriptor(
            m=m, n=n, k=k,
            precision_a=OperandPrecision.from_dtype(a.dtype),
            precision_b=OperandPrecision.from_dtype(b.dtype),
            transpose_a=transpose_a, transpose_b=transpose_b,
            load_previous_c=c is not None,
        ).kernel_config()
        block_m = block_m or cfg.block_m
        block_n = block_n or cfg.block_n
        block_k = block_k or cfg.block_k

    if out_dtype is None:
        out_dtype = jnp.promote_types(a.dtype, b.dtype)
    # fp32 operands get true fp32 MXU passes (reference FP32 contract).
    precision = (
        jax.lax.Precision.HIGHEST
        if (jnp.dtype(a.dtype) == jnp.dtype(jnp.float32)
            or jnp.dtype(b.dtype) == jnp.dtype(jnp.float32))
        else jax.lax.Precision.DEFAULT)

    # With a transposed A the M dimension is the lane axis of A's
    # blocks, so it must be 128-aligned; otherwise 8 (sublane) suffices.
    m_align = 128 if transpose_a else 8
    block_m = max(min(block_m, round_up(m, m_align)), m_align)
    block_n = max(min(block_n, round_up(n, 128)), 128)
    block_k = max(min(block_k, round_up(k, 128)), 128)
    m_pad, n_pad, k_pad = (round_up(m, block_m), round_up(n, block_n),
                           round_up(k, block_k))

    ap = pad_to(a, (k_pad, m_pad) if transpose_a else (m_pad, k_pad))
    bp = pad_to(b, (n_pad, k_pad) if transpose_b else (k_pad, n_pad))

    if transpose_a:
        a_spec = pl.BlockSpec((block_k, block_m), lambda i, j, kk: (kk, i))
    else:
        a_spec = pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk))
    if transpose_b:
        b_spec = pl.BlockSpec((block_n, block_k), lambda i, j, kk: (j, kk))
    else:
        b_spec = pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j))

    in_specs = [a_spec, b_spec]
    inputs = [ap, bp]
    if c is not None:
        cp = pad_to(c, (m_pad, n_pad))
        in_specs.append(
            pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)))
        inputs.append(cp)

    num_k_blocks = k_pad // block_k
    a_contract = 0 if transpose_a else 1
    b_contract = 1 if transpose_b else 0
    kernel = _make_gemm_kernel(
        num_k_blocks=num_k_blocks, load_previous_c=c is not None,
        out_dtype=out_dtype, precision=precision,
        dimension_numbers=(((a_contract,), (b_contract,)), ((), ())),
    )

    out = pl.pallas_call(
        kernel,
        grid=(m_pad // block_m, n_pad // block_n, num_k_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    return out[:m, :n]


def batched_gemm(a, b, **kwargs):
    """Batched GEMM over a leading batch dimension (reference:
    `GEMMDescriptor.batchDimension`)."""
    return jax.vmap(lambda x, y: gemm(x, y, **kwargs))(a, b)
