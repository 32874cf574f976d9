"""Forward kernel correctness vs the golden jnp model.

Strategy per the reference (`SURVEY.md §4`): golden-model comparison on
adversarial shapes including the reference's deliberately hostile cases
D in {1, 2, 3, 34, 77, 95, 199} and N in {4, 9, 23, 25, 93, 777}
(`SquareAttentionTest.swift:6-25`), plus mask/bias/window features the
reference ships untested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_forward,
)
from metal_flash_attention_tpu.ops.reference import attention_reference
from metal_flash_attention_tpu.utils.tolerances import (
    fp32_kernel_tol,
    max_abs_err,
    tolerances_for,
)


def make_qkv(rng, shape_q, shape_kv, dtype=jnp.float32):
    q = rng.standard_normal(shape_q, dtype=np.float32)
    k = rng.standard_normal(shape_kv, dtype=np.float32)
    v = rng.standard_normal(shape_kv, dtype=np.float32)
    return (jnp.asarray(q, dtype), jnp.asarray(k, dtype), jnp.asarray(v, dtype))


def golden_batched(q, k, v, **kw):
    """vmap the single-head golden over (batch, heads) with GQA."""
    b, hq, r, d = q.shape
    _, hkv, c, _ = k.shape
    group = hq // hkv
    kk = jnp.repeat(k, group, axis=1)
    vv = jnp.repeat(v, group, axis=1)
    fn = lambda q2, k2, v2: attention_reference(
        q2, k2, v2, return_residuals=True, **kw)
    fn = jax.vmap(jax.vmap(fn))
    return fn(q, kk, vv)


# Adversarial (N, D) pairs, after the reference's list.
ADVERSARIAL_SHAPES = [
    (4, 1), (9, 2), (23, 3), (25, 34), (93, 77), (177, 95),
    (777, 199), (128, 64), (256, 128), (1024, 64), (384, 256),
]


@pytest.mark.parametrize("n,d", ADVERSARIAL_SHAPES)
def test_forward_square_fp32(rng, n, d):
    q, k, v = make_qkv(rng, (1, 1, n, d), (1, 1, n, d))
    o, lse = flash_attention_forward(q, k, v)
    o_ref, lse_ref = golden_batched(q, k, v)
    assert max_abs_err(o, o_ref) < fp32_kernel_tol(), (n, d)
    assert max_abs_err(lse, lse_ref) < 1e-3, (n, d)


@pytest.mark.parametrize("r,c,d", [
    (128, 384, 64), (384, 128, 64), (100, 300, 80), (1, 257, 64),
])
def test_forward_rectangular(rng, r, c, d):
    q, k, v = make_qkv(rng, (1, 1, r, d), (1, 1, c, d))
    o, lse = flash_attention_forward(q, k, v)
    o_ref, lse_ref = golden_batched(q, k, v)
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()
    assert max_abs_err(lse, lse_ref) < 1e-3


@pytest.mark.parametrize("r,c", [(256, 256), (250, 250), (128, 384), (384, 128)])
def test_forward_causal(rng, r, c):
    q, k, v = make_qkv(rng, (1, 1, r, 64), (1, 1, c, 64))
    o, _ = flash_attention_forward(q, k, v, causal=True)
    o_ref = golden_batched(q, k, v, causal=True)[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


@pytest.mark.parametrize("window", [1, 17, 128, 1000])
def test_forward_sliding_window(rng, window):
    n, d = 300, 64
    q, k, v = make_qkv(rng, (1, 1, n, d), (1, 1, n, d))
    o, _ = flash_attention_forward(q, k, v, causal=True, window_size=window)
    o_ref = golden_batched(q, k, v, causal=True, window_size=window)[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_forward_external_mask(rng):
    n, d = 200, 64
    q, k, v = make_qkv(rng, (1, 1, n, d), (1, 1, n, d))
    mask = jnp.asarray(rng.random((1, 1, n, n)) > 0.3)
    o, lse = flash_attention_forward(q, k, v, mask=mask)
    o_ref, lse_ref = golden_batched(q, k, v, mask=mask)
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_forward_fully_masked_rows(rng):
    # Rows with no visible columns must produce O = 0, L = -inf.
    n, d = 130, 64
    q, k, v = make_qkv(rng, (1, 1, n, d), (1, 1, n, d))
    mask = np.ones((1, 1, n, n), bool)
    mask[:, :, 5, :] = False
    mask[:, :, 129, :] = False
    o, lse = flash_attention_forward(q, k, v, mask=jnp.asarray(mask))
    assert np.allclose(np.asarray(o)[0, 0, 5], 0.0)
    assert np.allclose(np.asarray(o)[0, 0, 129], 0.0)
    assert np.isneginf(np.asarray(lse)[0, 0, 5])
    o_ref = golden_batched(q, k, v, mask=jnp.asarray(mask))[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_forward_bias(rng):
    n, d = 150, 64
    q, k, v = make_qkv(rng, (1, 1, n, d), (1, 1, n, d))
    bias = jnp.asarray(rng.standard_normal((1, 1, n, n)), jnp.float32)
    o, _ = flash_attention_forward(q, k, v, bias=bias)
    o_ref = golden_batched(q, k, v, bias=bias)[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_forward_bias_head_broadcast(rng):
    b, h, n, d = 2, 4, 64, 64
    q, k, v = make_qkv(rng, (b, h, n, d), (b, h, n, d))
    bias = jnp.asarray(rng.standard_normal((1, 1, n, n)), jnp.float32)
    o, _ = flash_attention_forward(q, k, v, bias=bias)
    o_ref = golden_batched(q, k, v, bias=bias[0, 0])[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_forward_batched_heads(rng):
    b, h, n, d = 3, 5, 100, 64
    q, k, v = make_qkv(rng, (b, h, n, d), (b, h, n, d))
    o, lse = flash_attention_forward(q, k, v)
    o_ref, lse_ref = golden_batched(q, k, v)
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()
    assert max_abs_err(lse, lse_ref) < 1e-3


def test_forward_gqa(rng):
    b, hq, hkv, n, d = 2, 8, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((b, hq, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, n, d)), jnp.float32)
    o, _ = flash_attention_forward(q, k, v)
    o_ref = golden_batched(q, k, v)[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_forward_bf16(rng):
    n, d = 256, 128
    q, k, v = make_qkv(rng, (1, 1, n, d), (1, 1, n, d), jnp.bfloat16)
    o, lse = flash_attention_forward(q, k, v)
    o_ref, lse_ref = golden_batched(q, k, v)
    tol = tolerances_for(jnp.bfloat16)
    assert max_abs_err(o, o_ref) < tol.o
    assert max_abs_err(lse, lse_ref) < tol.lse * 10


def test_forward_oob_canary(rng):
    """OOB-read canary, after `MTLContext+Buffers.swift:10-18`: embed
    the logical problem in a larger buffer poisoned with garbage; a
    kernel that reads past the logical extent changes its output."""
    n, d = 100, 60
    q, k, v = make_qkv(rng, (1, 1, n, d), (1, 1, n, d))
    o_clean, _ = flash_attention_forward(q, k, v)

    poison = 1e30
    qbig = jnp.full((1, 1, n + 64, d + 32), poison, jnp.float32)
    kbig = jnp.full((1, 1, n + 64, d + 32), poison, jnp.float32)
    vbig = jnp.full((1, 1, n + 64, d + 32), poison, jnp.float32)
    qbig = qbig.at[:, :, :n, :d].set(q)
    kbig = kbig.at[:, :, :n, :d].set(k)
    vbig = vbig.at[:, :, :n, :d].set(v)
    o_sliced, _ = flash_attention_forward(
        qbig[:, :, :n, :d], kbig[:, :, :n, :d], vbig[:, :, :n, :d])
    assert max_abs_err(o_clean, o_sliced) == 0.0


def test_forward_decode_shape(rng):
    # Single-query decode against a long KV prefix.
    q, k, v = make_qkv(rng, (1, 2, 1, 64), (1, 2, 777, 64))
    o, _ = flash_attention_forward(q, k, v, causal=True)
    o_ref = golden_batched(q, k, v, causal=True)[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_forward_mask2_combines_by_and(rng):
    """Reference fork operand `attnMask2` @ buffer 12
    (AttentionOperand.swift:36-88): two masks AND together."""
    n, d = 200, 64
    q, k, v = make_qkv(rng, (1, 1, n, d), (1, 1, n, d))
    m1 = jnp.asarray(rng.random((1, 1, n, n)) > 0.2)
    m2 = jnp.asarray(rng.random((1, 1, n, n)) > 0.2)
    o, _ = flash_attention_forward(q, k, v, mask=m1, mask2=m2)
    o_ref = golden_batched(q, k, v, mask=jnp.logical_and(m1, m2))[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_forward_bias_repeat(rng):
    """biasRepeatCount semantics (AttentionDescriptor.swift:49-52):
    a bias whose batch dim R divides the full batch repeats every R
    batches (bias_pattern_idx = batch_idx % R)."""
    batch, heads, n, d = 4, 2, 130, 64
    repeat = 2
    q, k, v = make_qkv(rng, (batch, heads, n, d), (batch, heads, n, d))
    bias = jnp.asarray(
        rng.standard_normal((repeat, heads, n, n)), jnp.float32)
    o, _ = flash_attention_forward(q, k, v, bias=bias)
    bias_full = jnp.concatenate([bias] * (batch // repeat), axis=0)
    o_ref = golden_batched(q, k, v)[0]  # shape/stack check below
    outs = []
    for b in range(batch):
        per = jax.vmap(lambda q2, k2, v2, bb: attention_reference(
            q2, k2, v2, bias=bb))(q[b], k[b], v[b], bias_full[b])
        outs.append(per)
    o_ref = jnp.stack(outs)
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_forward_mask_head_repeat(rng):
    """Mask head dim repeats when it divides q_heads (modulo index
    map, generalizing broadcast)."""
    batch, heads, n, d = 1, 4, 128, 64
    q, k, v = make_qkv(rng, (batch, heads, n, d), (batch, heads, n, d))
    mask = jnp.asarray(rng.random((1, 2, n, n)) > 0.3)
    o, _ = flash_attention_forward(q, k, v, mask=mask)
    mask_full = jnp.concatenate([mask, mask], axis=1)
    o_ref = golden_batched(q, k, v, mask=None)[0]
    outs = []
    for h in range(heads):
        outs.append(attention_reference(
            q[0, h], k[0, h], v[0, h], mask=mask_full[0, h]))
    o_ref = jnp.stack(outs)[None]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_backward_mask2(rng):
    from metal_flash_attention_tpu.ops.flash_attention import (
        flash_attention,
    )
    n, d = 150, 64
    q, k, v = make_qkv(rng, (1, 2, n, d), (1, 2, n, d))
    m1 = jnp.asarray(rng.random((1, 1, n, n)) > 0.2)
    m2 = jnp.asarray(rng.random((1, 1, n, n)) > 0.2)
    do = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, m1, None, m2) * do)

    g = jax.grad(loss, (0, 1, 2))(q, k, v)
    m12 = jnp.logical_and(m1, m2)[0, 0]

    def loss_ref(q, k, v):
        o = jnp.stack([
            attention_reference(q[0, h], k[0, h], v[0, h], mask=m12)
            for h in range(2)])[None]
        return jnp.sum(o * do)

    g_ref = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        assert max_abs_err(a, b) < 5 * fp32_kernel_tol()


def test_forward_large_head_dim_512(rng):
    """D > 256 exercises the VMEM block clamp (the reference's
    register-spill analog, README.md:13)."""
    n, d = 256, 512
    q, k, v = make_qkv(rng, (1, 1, n, d), (1, 1, n, d))
    o, lse = flash_attention_forward(q, k, v, causal=True)
    o_ref, lse_ref = golden_batched(q, k, v, causal=True)
    assert max_abs_err(o, o_ref) < 2 * fp32_kernel_tol()
    assert max_abs_err(lse[..., None], lse_ref[..., None]) < 1e-4


def test_block_clamp_fits_budget():
    from metal_flash_attention_tpu.descriptors.parameters import (
        clamp_to_vmem,
        vmem_bytes,
    )
    bq, bkv = clamp_to_vmem("forward", 1024, 2048, 512, jnp.bfloat16,
                            budget=15 * 2**20)
    assert vmem_bytes(bq, bkv, 512, 2) <= 15 * 2**20
    # Small D keeps the tuned blocks untouched.
    assert clamp_to_vmem("forward", 1024, 2048, 128, jnp.bfloat16,
                         budget=15 * 2**20) == (1024, 2048)


def test_forward_logit_softcap(rng):
    """Gemma-2-style soft capping: cap * tanh(s / cap)."""
    n, d, cap = 256, 64, 30.0
    q, k, v = make_qkv(rng, (1, 2, n, d), (1, 2, n, d))
    o, _ = flash_attention_forward(q, k, v, causal=True,
                                   logit_softcap=cap)
    o_ref = golden_batched(q, k, v, causal=True, logit_softcap=cap)[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_backward_logit_softcap(rng):
    from metal_flash_attention_tpu.ops.flash_attention import (
        flash_attention,
    )
    n, d, cap = 200, 64, 20.0
    q, k, v = make_qkv(rng, (1, 1, n, d), (1, 1, n, d))
    do = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)

    g = jax.grad(lambda q, k, v: jnp.sum(flash_attention(
        q, k, v, causal=True, logit_softcap=cap) * do),
        (0, 1, 2))(q, k, v)

    def ref_loss(q, k, v):
        o = attention_reference(q[0, 0], k[0, 0], v[0, 0], causal=True,
                                logit_softcap=cap)
        return jnp.sum(o[None, None] * do)

    g_ref = jax.grad(ref_loss, (0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, g_ref):
        assert max_abs_err(a, b) < 5 * fp32_kernel_tol(), name


# ---------------------------------------------------------------------------
# Dynamic-traversal kernel (long-context causal/window path): forced on
# small shapes via the module override so CPU tests pin its behavior.
# ---------------------------------------------------------------------------

@pytest.fixture
def force_dynamic():
    import metal_flash_attention_tpu.ops.flash_attention as famod
    famod = __import__(
        "metal_flash_attention_tpu.ops.flash_attention",
        fromlist=["_FORCE_DYNAMIC"])
    famod._FORCE_DYNAMIC = True
    yield famod
    famod._FORCE_DYNAMIC = None


@pytest.mark.parametrize("n,c,d", [(256, 512, 64), (200, 333, 77),
                                   (512, 512, 128)])
def test_dynamic_causal_matches_golden(rng, force_dynamic, n, c, d):
    q, k, v = make_qkv(rng, (1, 2, n, d), (1, 2, c, d))
    o, lse = flash_attention_forward(q, k, v, causal=True,
                                     block_q=128, block_kv=128)
    o_ref, lse_ref = golden_batched(q, k, v, causal=True)
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()
    assert max_abs_err(lse, lse_ref) < fp32_kernel_tol()


def test_dynamic_window_matches_golden(rng, force_dynamic):
    n, d, w = 300, 64, 100
    q, k, v = make_qkv(rng, (1, 2, n, d), (1, 2, n, d))
    o, _ = flash_attention_forward(q, k, v, window_size=w,
                                   block_q=128, block_kv=128)
    o_ref = golden_batched(q, k, v, window_size=w)[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_dynamic_causal_offset_negative_rows(rng, force_dynamic):
    """q_len > kv_len: leading rows have no visible columns (O = 0,
    L = -inf) — exercises n_blocks = 0 and the p-zero select."""
    n, c, d = 300, 100, 64
    q, k, v = make_qkv(rng, (1, 1, n, d), (1, 1, c, d))
    o, lse = flash_attention_forward(q, k, v, causal=True,
                                     block_q=128, block_kv=128)
    o_ref = golden_batched(q, k, v, causal=True)[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_dynamic_segments_causal(rng, force_dynamic):
    n, d = 256, 64
    q, k, v = make_qkv(rng, (1, 2, n, d), (1, 2, n, d))
    ids = jnp.asarray(
        np.repeat(np.arange(4), n // 4)[None, :], jnp.int32)
    o, _ = flash_attention_forward(
        q, k, v, causal=True, q_segment_ids=ids, kv_segment_ids=ids,
        block_q=128, block_kv=128)
    mask = ids[0][:, None] == ids[0][None, :]
    o_ref = golden_batched(q, k, v, causal=True, mask=mask)[0]
    assert max_abs_err(o, o_ref) < fp32_kernel_tol()


def test_dynamic_quantized_kv_causal(rng, force_dynamic):
    from metal_flash_attention_tpu.descriptors.precision import (
        OperandPrecision,
    )
    from metal_flash_attention_tpu.ops.quantization import quantize

    n, d = 256, 128
    q, k, v = make_qkv(rng, (1, 2, n, d), (1, 2, n, d))
    kq = quantize(k, OperandPrecision.INT8)
    vq = quantize(v, OperandPrecision.INT8)
    o, _ = flash_attention_forward(q, kq, vq, causal=True,
                                   block_q=128, block_kv=128)
    o_ref = golden_batched(q, k, v, causal=True)[0]
    assert max_abs_err(o, o_ref) < 5e-2


def test_fp16_inputs_compute_in_bf16(rng):
    """FP16 (the reference's native low precision) maps onto bf16
    compute on TPU; outputs come back fp16 within the mixed tier."""
    from metal_flash_attention_tpu.ops.flash_decode import flash_decode

    q = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float16)
    k = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float16)
    v = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float16)
    o = flash_attention(q, k, v, causal=True)
    assert o.dtype == jnp.float16
    ref = jax.vmap(jax.vmap(lambda a, b, c: attention_reference(
        a, b, c, causal=True)))(q.astype(jnp.float32),
                                k.astype(jnp.float32),
                                v.astype(jnp.float32))
    assert float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref))) < 5e-2
    g = jax.grad(lambda *a: jnp.sum(flash_attention(
        *a, causal=True).astype(jnp.float32)))(q, k, v)
    assert g.dtype == jnp.float16
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))

    qt = jnp.asarray(rng.standard_normal((2, 4, 64)), jnp.float16)
    kc = jnp.asarray(rng.standard_normal((2, 2, 256, 64)), jnp.float16)
    vc = jnp.asarray(rng.standard_normal((2, 2, 256, 64)), jnp.float16)
    od = flash_decode(qt, kc, vc,
                      kv_lens=jnp.asarray([256, 100], jnp.int32))
    assert od.dtype == jnp.float16
    assert bool(jnp.all(jnp.isfinite(od.astype(jnp.float32))))
