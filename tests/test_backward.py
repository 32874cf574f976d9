"""Backward two-kernel correctness vs analytic golden gradients.

The golden model derives dQ/dK/dV analytically under Phi = sum(dO * O)
(reference: `Network.swift:13-59, 329-402`); a jax.grad cross-check of
the analytic formulas replaces the reference's archived
finite-differencing validation
(`Documentation/Archive/FiniteDifferencingTest.swift:8-30`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_forward,
)
from metal_flash_attention_tpu.ops.flash_attention_bwd import (
    flash_attention_backward,
)
from metal_flash_attention_tpu.ops.reference import (
    attention_reference,
    attention_reference_grads,
)
from metal_flash_attention_tpu.utils.tolerances import (
    fp32_kernel_tol,
    max_abs_err,
)


def run_case(rng, r, c, d, dtype=jnp.float32, tol=None, **kw):
    tol = tol or fp32_kernel_tol()
    q = jnp.asarray(rng.standard_normal((1, 1, r, d)), dtype)
    k = jnp.asarray(rng.standard_normal((1, 1, c, d)), dtype)
    v = jnp.asarray(rng.standard_normal((1, 1, c, d)), dtype)
    do = jnp.asarray(rng.standard_normal((1, 1, r, d)), dtype)

    o, lse = flash_attention_forward(q, k, v, **kw)
    dq, dk, dv = flash_attention_backward(q, k, v, do, o, lse, **kw)

    dq_ref, dk_ref, dv_ref, o_ref, lse_ref, _ = attention_reference_grads(
        q[0, 0], k[0, 0], v[0, 0], do[0, 0], **kw)
    assert max_abs_err(o[0, 0], o_ref) < tol, "O"
    assert max_abs_err(dv[0, 0], dv_ref) < tol, "dV"
    assert max_abs_err(dk[0, 0], dk_ref) < tol, "dK"
    assert max_abs_err(dq[0, 0], dq_ref) < tol, "dQ"


@pytest.mark.parametrize("r,c,d", [
    (128, 128, 64), (9, 9, 2), (93, 77, 34), (256, 256, 128),
    (128, 384, 64), (384, 128, 64), (200, 100, 80), (129, 257, 199),
])
def test_backward_fp32(rng, r, c, d):
    run_case(rng, r, c, d)


@pytest.mark.parametrize("r,c", [(256, 256), (250, 123), (128, 384)])
def test_backward_causal(rng, r, c):
    run_case(rng, r, c, 64, causal=True)


def test_backward_window(rng):
    run_case(rng, 300, 300, 64, causal=True, window_size=77)


def test_backward_mask(rng):
    r = c = 150
    mask = jnp.asarray(rng.random((1, 1, r, c)) > 0.3)
    q = jnp.asarray(rng.standard_normal((1, 1, r, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, c, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, c, 64)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((1, 1, r, 64)), jnp.float32)
    o, lse = flash_attention_forward(q, k, v, mask=mask)
    dq, dk, dv = flash_attention_backward(q, k, v, do, o, lse, mask=mask)
    dq_ref, dk_ref, dv_ref, *_ = attention_reference_grads(
        q[0, 0], k[0, 0], v[0, 0], do[0, 0], mask=mask[0, 0])
    assert max_abs_err(dv[0, 0], dv_ref) < fp32_kernel_tol()
    assert max_abs_err(dk[0, 0], dk_ref) < fp32_kernel_tol()
    assert max_abs_err(dq[0, 0], dq_ref) < fp32_kernel_tol()


def test_backward_gqa(rng):
    b, hq, hkv, n, d = 2, 4, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((b, hq, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, n, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((b, hq, n, d)), jnp.float32)
    o, lse = flash_attention_forward(q, k, v)
    dq, dk, dv = flash_attention_backward(q, k, v, do, o, lse)

    # Golden via jax.grad of the naive reference with explicit repeat.
    def loss(q_, k_, v_):
        group = hq // hkv
        kk = jnp.repeat(k_, group, axis=1)
        vv = jnp.repeat(v_, group, axis=1)
        fn = jax.vmap(jax.vmap(attention_reference))
        return jnp.sum(fn(q_, kk, vv) * do)

    dq_ref, dk_ref, dv_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert max_abs_err(dq, dq_ref) < fp32_kernel_tol()
    assert max_abs_err(dk, dk_ref) < fp32_kernel_tol()
    assert max_abs_err(dv, dv_ref) < fp32_kernel_tol()


def test_custom_vjp_end_to_end(rng):
    """jax.grad through the public flash_attention matches jax.grad
    through the naive reference."""
    n, d = 200, 64
    q = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.float32)

    def loss_kernel(q_, k_, v_):
        return jnp.sum(flash_attention(q_, k_, v_, causal=True) * do)

    def loss_ref(q_, k_, v_):
        fn = jax.vmap(jax.vmap(
            lambda a, b, c: attention_reference(a, b, c, causal=True)))
        return jnp.sum(fn(q_, k_, v_) * do)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_k, g_r, "qkv"):
        assert max_abs_err(a, b) < fp32_kernel_tol(), name


def test_bias_gradient(rng):
    n, d = 130, 64
    q = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((1, 1, n, n)), jnp.float32)

    def loss_kernel(b_):
        return jnp.sum(flash_attention(q, k, v, bias=b_) * do)

    def loss_ref(b_):
        return jnp.sum(
            attention_reference(q[0, 0], k[0, 0], v[0, 0], bias=b_[0, 0])
            * do[0, 0])

    g_k = jax.grad(loss_kernel)(bias)
    g_r = jax.grad(loss_ref)(bias)
    assert max_abs_err(g_k, g_r) < fp32_kernel_tol()


def test_analytic_grads_match_autodiff(rng):
    """Cross-validate the analytic golden formulas against jax.grad
    (the finite-differencing analog)."""
    r, c, d = 64, 96, 32
    q = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((c, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((c, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    dq_a, dk_a, dv_a, *_ = attention_reference_grads(q, k, v, do)

    def loss(q_, k_, v_):
        return jnp.sum(attention_reference(q_, k_, v_) * do)

    dq_g, dk_g, dv_g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert max_abs_err(dq_a, dq_g) < 1e-5
    assert max_abs_err(dk_a, dk_g) < 1e-5
    assert max_abs_err(dv_a, dv_g) < 1e-5
