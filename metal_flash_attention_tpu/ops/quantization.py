"""KV-cache quantization: FP8-E4M3 / FP8-E5M2 / INT8 / NF4.

TPU-native analog of the reference's quantization layer
(`Utilities/QuantizationUtilities.swift:14-128` — MSL dequant snippets;
`AttentionKernel+OuterProduct.swift:379-613` — in-kernel dequant of the
RHS operand; scales fetched per batch*head at buffers 20/21,
`AttentionKernel+Source.swift:216-291`).

Deliberate deviation (SURVEY.md §7.4): the reference's "FP8" is a
*linear* code with zero-point 128, not IEEE FP8
(`QuantizationUtilities.swift:11-13`).  TPU has native
`float8_e4m3fn`/`float8_e5m2` dtypes that the MXU and VPU understand,
so we use the real bit layouts.  INT8 is symmetric (no zero point,
matching the reference's signed path `uint8_to_half_signed`).  NF4 is
the same 16-value normal-float codebook, nibble-packed two-per-byte
along the head dimension (`QuantizationUtilities.swift:65-91`).

Scales are per (batch, head) — the reference's granularity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from metal_flash_attention_tpu.descriptors.precision import OperandPrecision

# The NF4 codebook: 16 quantiles of a standard normal, normalized to
# [-1, 1] (same table the reference embeds,
# QuantizationUtilities.swift:69-76).
NF4_CODEBOOK = (
    -1.0, -0.6961928009986877, -0.5250730514526367,
    -0.39491748809814453, -0.28444138169288635, -0.18477343022823334,
    -0.09105003625154495, 0.0, 0.07958029955625534,
    0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
    0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0,
)  # Python floats: jnp constants would be captured by the kernel tracer


class QuantizedTensor(NamedTuple):
    """A quantized KV operand: payload + per-(batch, head) scale.

    values: [batch, heads, seq, head_dim] in the storage dtype
        (NF4: [batch, heads, seq, head_dim // 2] nibble-packed uint8).
    scales: [batch, heads] float32 dequantization scale.
    precision: which scheme (drives the in-kernel dequant path).
    """
    values: jax.Array
    scales: jax.Array
    precision: OperandPrecision


jax.tree_util.register_pytree_node(
    QuantizedTensor,
    lambda t: ((t.values, t.scales), t.precision),
    lambda prec, children: QuantizedTensor(*children, prec),
)


def _absmax_scale(x: jax.Array, target_max: float) -> jax.Array:
    """Per-(batch, head) scale so payload fits the target range."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(-1, -2))
    return jnp.maximum(absmax, 1e-12) / target_max


def quantize(x: jax.Array, precision: OperandPrecision) -> QuantizedTensor:
    """Quantize [batch, heads, seq, head_dim] for the KV cache."""
    x32 = x.astype(jnp.float32)
    if precision is OperandPrecision.INT8:
        scale = _absmax_scale(x32, 127.0)
        q = jnp.round(x32 / scale[:, :, None, None])
        q = jnp.clip(q, -127, 127).astype(jnp.int8)
        return QuantizedTensor(q, scale, precision)
    if precision in (OperandPrecision.FP8_E4M3, OperandPrecision.FP8_E5M2):
        # Native FP8: scale into the format's dynamic range, cast.
        fmax = 448.0 if precision is OperandPrecision.FP8_E4M3 else 57344.0
        scale = _absmax_scale(x32, fmax)
        q = (x32 / scale[:, :, None, None]).astype(precision.storage_dtype)
        return QuantizedTensor(q, scale, precision)
    if precision is OperandPrecision.NF4:
        assert x.shape[-1] % 2 == 0, "NF4 packs 2 values/byte along D"
        scale = _absmax_scale(x32, 1.0)
        normalized = x32 / scale[:, :, None, None]
        idx = nf4_nearest_indices(normalized)
        # Split-half layout: byte j packs elements j (low nibble) and
        # j + D/2 (high nibble).  Unlike the reference's interleaved
        # nibble pairs (`nf4_to_half2`), unpacking this layout is a
        # lane-dim concat — free on the VPU, where an interleave would
        # be a relayout.
        half = x.shape[-1] // 2
        lo = idx[..., :half]
        hi = idx[..., half:]
        packed = (lo | (hi << 4)).astype(jnp.uint8)
        return QuantizedTensor(packed, scale, precision)
    raise ValueError(f"not a quantized precision: {precision}")


def nf4_nearest_indices(normalized: jax.Array) -> jax.Array:
    """Nearest NF4 codebook index per element (the codebook is sorted,
    so nearest = searchsorted on midpoints); shared by the dense
    (head-dim split) and paged (token-row split) packers."""
    codebook = jnp.asarray(NF4_CODEBOOK, jnp.float32)
    midpoints = (codebook[1:] + codebook[:-1]) / 2.0
    return jnp.searchsorted(midpoints, normalized).astype(jnp.uint8)


def dequantize(t: QuantizedTensor) -> jax.Array:
    """Host-side dequantization (the golden path for testing the
    in-kernel dequant)."""
    s = t.scales[:, :, None, None]
    if t.precision is OperandPrecision.NF4:
        return nf4_unpack(t.values) * s
    return t.values.astype(jnp.float32) * s


def nf4_unpack(packed: jax.Array) -> jax.Array:
    """Unpack split-half NF4 to float32 via the codebook.

    Kernel-safe: bit ops, a lane-dim concat, and a 16-way select chain
    (the VPU analog of the reference's generated `nf4_to_half2`
    function, QuantizationUtilities.swift:78-91) — no gathers, no
    relayouts.
    """
    # Bit ops in int32: Mosaic has no direct uint8 -> float32 cast.
    return nf4_unpack_groups(packed, contract_axis=-1)


def _nf4_table_rows(lanes: int, scale=None) -> jax.Array:
    """The codebook laid out in the first 16 lanes of a tiny [8,
    lanes] plane (built from scalar constants — pallas kernels cannot
    capture array constants; cost amortizes over the block's rows).
    ``scale`` (an SMEM scalar) folds the dequantization multiply into
    the table for free."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 1)
    t = jnp.zeros((8, lanes), jnp.float32)
    for i, v in enumerate(NF4_CODEBOOK):
        t = t + jnp.where(lane == i, v, 0.0)
    if scale is not None:
        t = t * scale
    return t


def _nf4_lookup_gather(idx: jax.Array, scale=None) -> jax.Array:
    """Codebook lookup via the VPU lane gather (`tpu.dynamic_gather`,
    reached through `jnp.take_along_axis(table, idx, axis=1)` with
    table.shape == idx.shape).  Measured v5e: 305 Gelem/s vs the
    16-step indicator chain's 101 (experiments/nf4_gather_probe.py) —
    the difference between ~5k and ~15-18k tok/s NF4 decode.

    Constraints honored here: the gather dimension must fit ONE vreg
    (<= 128 lanes — wider arrays are processed in 128-lane chunks;
    lane slices at 128-multiples are tile-aligned), the table must be
    f32 (Mosaic has no bf16 dynamic_gather), and every chunk must
    have >= 16 lanes to hold the codebook (callers fall back to the
    chain otherwise)."""
    lanes = idx.shape[-1]
    outs = []
    for start in range(0, lanes, 128):
        chunk = idx[:, start:start + 128]
        tab = jnp.broadcast_to(
            _nf4_table_rows(chunk.shape[1], scale)[:1], chunk.shape)
        outs.append(jnp.take_along_axis(tab, chunk, axis=1))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def _nf4_gather_ok(idx: jax.Array) -> bool:
    lanes = idx.shape[-1]
    tail = lanes % 128 or 128
    return idx.ndim == 2 and lanes >= 16 and tail >= 16


def nf4_codebook_lookup(idx: jax.Array, scale=None) -> jax.Array:
    """16-entry codebook lookup; gather-based on the 2D kernel path,
    indicator-accumulate chain otherwise (tiny head dims whose lane
    extent cannot hold the 16-entry table, and host-side 4D arrays).

    Chain note: `where` with a splat scalar against a loaded-data i1
    vector trips a Mosaic relayout ("{0,0} -> {*,*}");
    multiply-accumulate of the 0/1 indicator does not."""
    idx32 = idx.astype(jnp.int32)
    if _nf4_gather_ok(idx32):
        return _nf4_lookup_gather(idx32, scale)
    out = jnp.zeros(idx.shape, jnp.float32)
    for i in range(16):
        indicator = (idx32 == i).astype(jnp.float32)
        out = out + indicator * NF4_CODEBOOK[i]
    if scale is not None:
        out = out * scale
    return out


# f32 exponent bias minus the FP8 format's bias: the "magic" power of
# two folded into the dequant scale (see fp8_expand_bits).
_FP8_MAGIC_EXP = {
    OperandPrecision.FP8_E4M3: 127 - 7,    # bias 7
    OperandPrecision.FP8_E5M2: 127 - 15,   # bias 15
}
_FP8_MAN_BITS = {
    OperandPrecision.FP8_E4M3: 3,
    OperandPrecision.FP8_E5M2: 2,
}


def fp8_expand_bits(vals: jax.Array, precision: OperandPrecision) -> jax.Array:
    """Expand FP8 payload bits into a float32 equal to
    value * 2^-(127 - fp8_bias), via integer ops + bitcast.

    The VPU analog of the reference's generated `fp8_*_to_half`
    functions (QuantizationUtilities.swift:19-46).  v5e has no native
    FP8 datapath, so XLA lowers `fp8.astype(f32)` to a slow emulation
    (~80 Gelem/s measured); shifting the 7 payload bits straight into
    the f32 exponent/mantissa fields runs at VPU int-op speed.  The
    exponent is NOT rebased here — the 2^(127 - bias) correction is a
    power of two, so callers fold it into the dequantization scale for
    free (one multiply that already exists).  Exact for normals; FP8
    subnormals map to f32 subnormals, which the TPU VPU flushes to
    zero in the scale multiply — an absolute error below
    absmax * 2^-14, far inside the quantized-KV tolerance tier.
    """
    from jax.experimental.pallas import tpu as pltpu

    # Two int ops per element (was six): widening int8 -> int32 SIGN-
    # extends, so after shifting the 7 payload bits into the f32
    # exponent/mantissa fields the sign's replicas occupy exactly the
    # f32 exponent bits ABOVE the FP8 exponent (bits 30..23+man+4);
    # one AND clears the replicas while keeping bit 31 — sign and
    # payload land placed in a single shift+mask.  (INT8 dequant is
    # one convert; this is the near-parity schedule VERDICT r3 next
    # #4 asked for — same bytes read, now nearly the same VPU cost.)
    man_bits = _FP8_MAN_BITS[precision]
    shift = 23 - man_bits
    # Python ~ keeps this a (negative) signed value in int32 range:
    # e4m3 -> 0x87FFFFFF, e5m2 -> 0x8FFFFFFF as two's complement.
    keep = ~(((1 << (24 - shift)) - 1) << (shift + 7))
    u = pltpu.bitcast(vals, jnp.int8).astype(jnp.int32)
    bits = (u << shift) & jnp.int32(keep)
    return pltpu.bitcast(bits, jnp.float32)


def dequant_block(vals: jax.Array, scale, precision: OperandPrecision,
                  compute_dtype) -> jax.Array:
    """In-kernel dequantization of one KV block (the TPU analog of the
    reference's per-tile dequant in the outer-product/accumulate
    generators, AttentionKernel+OuterProduct.swift:379-613).

    ``scale`` is the per-(batch, head) scalar read from SMEM
    (reference: scale fetched per batch_head_idx from buffers 20/21).
    """
    if precision is OperandPrecision.NF4:
        # Scale folds into the gather table (one multiply on the tiny
        # [8, lanes] plane instead of one per element).
        return nf4_unpack_groups(vals, contract_axis=-1,
                                 scale=scale).astype(compute_dtype)
    if precision in _FP8_MAGIC_EXP:
        magic_scale = scale * (2.0 ** _FP8_MAGIC_EXP[precision])
        return (fp8_expand_bits(vals, precision)
                * magic_scale).astype(compute_dtype)
    return (vals.astype(jnp.float32) * scale).astype(compute_dtype)


# --------------------------------------------------------------------------
# Quantized GEMM operands (reference: GEMMOperandPrecision spans all 7
# precisions for GEMM operands, GEMM/GEMMOperandPrecision.swift:20-96;
# quantized formats explicitly anticipated in the memory!=register
# truth table, GEMM/GEMMKernel/GEMMKernel.swift:44-103).
# --------------------------------------------------------------------------

# NF4 GEMM payloads pack the contraction dim split-half within fixed
# 512-element K-groups: byte j of a group packs elements j (low
# nibble) and j + 256 (high nibble).  A 512-deep kernel block then
# covers exactly one group, and unpacking is a single concat along the
# K axis of the stored block — no interleave relayout (the same
# reasoning as the dense KV cache's head-dim split above, applied
# per-block because GEMM K is tiled while head_dim never is).
NF4_GEMM_GROUP = 512


class QuantizedMatrix(NamedTuple):
    """A quantized GEMM operand: payload + dequantization scale.

    values: storage-dtype payload with the same layout the dense
        operand would have (NF4: the contraction dim is nibble-packed
        to half length, see NF4_GEMM_GROUP).
    scale: float32 [] per-tensor scale, or a per-channel vector along
        the operand's non-contracted dim ([M] for A, [N] for B).
    precision: storage scheme (INT8 / FP8_E4M3 / FP8_E5M2 / NF4).
    shape: logical (rows, cols) of the dequantized matrix — NF4 pads
        K up to NF4_GEMM_GROUP before packing, so the payload alone
        does not determine it.
    """
    values: jax.Array
    scale: jax.Array
    precision: OperandPrecision
    shape: tuple


jax.tree_util.register_pytree_node(
    QuantizedMatrix,
    lambda t: ((t.values, t.scale), (t.precision, t.shape)),
    lambda aux, children: QuantizedMatrix(*children, *aux),
)


def _matrix_absmax_scale(x32: jax.Array, target_max: float,
                         channel_axis) -> jax.Array:
    if channel_axis is None:
        absmax = jnp.max(jnp.abs(x32))
    else:
        absmax = jnp.max(jnp.abs(x32), axis=1 - channel_axis)
    return jnp.maximum(absmax, 1e-12) / target_max


def _nf4_pack_groups(idx: jax.Array, contract_axis: int) -> jax.Array:
    """Pack 4-bit codebook indices split-half within NF4_GEMM_GROUP-
    element groups along ``contract_axis``."""
    k = idx.shape[contract_axis]
    assert k % NF4_GEMM_GROUP == 0, k
    half = NF4_GEMM_GROUP // 2
    if contract_axis == 1:
        g = idx.reshape(idx.shape[0], k // NF4_GEMM_GROUP, NF4_GEMM_GROUP)
        packed = g[..., :half] | (g[..., half:] << 4)
        return packed.reshape(idx.shape[0], k // 2).astype(jnp.uint8)
    g = idx.reshape(k // NF4_GEMM_GROUP, NF4_GEMM_GROUP, idx.shape[1])
    packed = g[:, :half] | (g[:, half:] << 4)
    return packed.reshape(k // 2, idx.shape[1]).astype(jnp.uint8)


def nf4_unpack_groups(packed: jax.Array, contract_axis: int,
                      scale=None) -> jax.Array:
    """Unpack one kernel block of group-packed NF4 (the block must
    span exactly one K-group: NF4_GEMM_GROUP//2 payload bytes along
    ``contract_axis``).  Kernel-safe: bit ops + per-nibble-plane
    codebook lookups (gather on the hot path) + one concat.  The two
    planes look up BEFORE the concat so the gather's one-vreg lane
    constraint sees the payload width, not twice it.  ``scale`` folds
    the dequant multiply into the lookup table."""
    p32 = packed.astype(jnp.int32)
    lo = p32 & 0x0F
    hi = (p32 >> 4) & 0x0F
    return jnp.concatenate([nf4_codebook_lookup(lo, scale),
                            nf4_codebook_lookup(hi, scale)],
                           axis=contract_axis)


def quantize_matrix(
    x: jax.Array,
    precision: OperandPrecision,
    *,
    contract_axis: int,
    per_channel: bool = False,
) -> QuantizedMatrix:
    """Quantize a 2-D GEMM operand.

    ``contract_axis`` is the K axis of the *stored* layout (A: 1
    normally, 0 when transpose_a; B: 0 normally, 1 when transpose_b).
    ``per_channel`` puts one scale per non-contracted row/column
    (standard weight quantization) instead of one per tensor.
    """
    assert x.ndim == 2, x.shape
    assert contract_axis in (0, 1)
    x32 = x.astype(jnp.float32)
    channel_axis = (1 - contract_axis) if per_channel else None
    if precision is OperandPrecision.INT8:
        scale = _matrix_absmax_scale(x32, 127.0, channel_axis)
        s = scale if channel_axis is None else jnp.expand_dims(
            scale, contract_axis)
        q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
        return QuantizedMatrix(q, scale, precision, x.shape)
    if precision in (OperandPrecision.FP8_E4M3, OperandPrecision.FP8_E5M2):
        fmax = 448.0 if precision is OperandPrecision.FP8_E4M3 else 57344.0
        scale = _matrix_absmax_scale(x32, fmax, channel_axis)
        s = scale if channel_axis is None else jnp.expand_dims(
            scale, contract_axis)
        q = (x32 / s).astype(precision.storage_dtype)
        return QuantizedMatrix(q, scale, precision, x.shape)
    if precision is OperandPrecision.NF4:
        scale = _matrix_absmax_scale(x32, 1.0, channel_axis)
        s = scale if channel_axis is None else jnp.expand_dims(
            scale, contract_axis)
        normalized = x32 / s
        # Pad K to a whole number of groups; zero quantizes exactly to
        # codebook index 7 (0.0), so padding is inert in the product.
        k = x.shape[contract_axis]
        from metal_flash_attention_tpu.utils.shapes import round_up
        k_pad = round_up(k, NF4_GEMM_GROUP)
        if k_pad != k:
            pad = [(0, 0), (0, 0)]
            pad[contract_axis] = (0, k_pad - k)
            normalized = jnp.pad(normalized, pad)
        idx = nf4_nearest_indices(normalized)
        packed = _nf4_pack_groups(idx, contract_axis)
        return QuantizedMatrix(packed, scale, precision, x.shape)
    raise ValueError(f"not a quantized precision: {precision}")


def dequantize_matrix(t: QuantizedMatrix, *, contract_axis: int) -> jax.Array:
    """Host-side dequantization — the golden path for testing the
    in-kernel GEMM dequant."""
    if t.precision is OperandPrecision.NF4:
        vals = nf4_unpack_groups(t.values, contract_axis)
        sl = [slice(None), slice(None)]
        sl[contract_axis] = slice(0, t.shape[contract_axis])
        vals = vals[tuple(sl)]
    else:
        vals = t.values.astype(jnp.float32)
    s = t.scale
    if s.ndim == 1:
        s = jnp.expand_dims(s, contract_axis)
    return vals * s
