"""Fused chunked cross-entropy vs the naive log-softmax objective:
values and gradients must agree to fp32 tolerance, including when the
vocabulary does not divide the chunk size."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.models.losses import fused_cross_entropy


def naive_nll(x, w, targets):
    logits = (x.astype(jnp.float32) @ w.astype(jnp.float32))
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, targets[:, None], 1)[:, 0]


@pytest.mark.parametrize("t,d,vocab,chunk", [
    (32, 64, 512, 128),      # chunk | vocab
    (17, 64, 300, 128),      # ragged vocab tail, ragged T
    (8, 32, 96, 128),        # vocab < chunk (single padded chunk)
])
def test_fused_ce_matches_naive(t, d, vocab, chunk):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, vocab)) * 0.1, jnp.float32)
    targets = jnp.asarray(rng.integers(0, vocab, (t,)), jnp.int32)

    got = fused_cross_entropy(x, w, targets, chunk)
    want = naive_nll(x, w, targets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_ce_grads_match_naive():
    rng = np.random.default_rng(1)
    t, d, vocab, chunk = 24, 48, 200, 64
    x = jnp.asarray(rng.standard_normal((t, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, vocab)) * 0.1, jnp.float32)
    targets = jnp.asarray(rng.integers(0, vocab, (t,)), jnp.int32)
    # Non-uniform cotangent exercises the per-token scaling in bwd.
    weights = jnp.asarray(rng.uniform(0.5, 1.5, (t,)), jnp.float32)

    def fused(x, w):
        return jnp.sum(fused_cross_entropy(x, w, targets, chunk)
                       * weights)

    def naive(x, w):
        return jnp.sum(naive_nll(x, w, targets) * weights)

    gx_f, gw_f = jax.grad(fused, (0, 1))(x, w)
    gx_n, gw_n = jax.grad(naive, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_n),
                               rtol=1e-4, atol=1e-5)


def test_fused_ce_bf16_inputs():
    """bf16 hidden states / weights: fp32 accumulation inside, grads
    returned in the parameter dtype."""
    rng = np.random.default_rng(2)
    t, d, vocab, chunk = 16, 32, 128, 64
    x32 = rng.standard_normal((t, d)).astype(np.float32)
    w32 = (rng.standard_normal((d, vocab)) * 0.1).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    w = jnp.asarray(w32, jnp.bfloat16)
    targets = jnp.asarray(rng.integers(0, vocab, (t,)), jnp.int32)

    got = fused_cross_entropy(x, w, targets, chunk)
    want = naive_nll(x, w, targets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)
    gx, gw = jax.grad(
        lambda x, w: fused_cross_entropy(x, w, targets, chunk).sum(),
        (0, 1))(x, w)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16


def test_fused_ce_softcap_matches_naive():
    """Gemma-2 final-logit softcap fused into the chunked loss: value
    and gradients equal the capped naive objective."""
    rng = np.random.default_rng(4)
    t, d, vocab, chunk, cap = 20, 32, 200, 64, 5.0
    x = jnp.asarray(rng.standard_normal((t, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, vocab)) * 0.3, jnp.float32)
    targets = jnp.asarray(rng.integers(0, vocab, (t,)), jnp.int32)

    def naive_capped(x, w):
        logits = cap * jnp.tanh((x @ w) / cap)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, targets[:, None], 1)[:, 0]

    got = fused_cross_entropy(x, w, targets, chunk, cap)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(naive_capped(x, w)),
                               rtol=1e-5, atol=1e-5)
    gx_f, gw_f = jax.grad(
        lambda x, w: fused_cross_entropy(x, w, targets, chunk, cap)
        .sum(), (0, 1))(x, w)
    gx_n, gw_n = jax.grad(
        lambda x, w: naive_capped(x, w).sum(), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_n),
                               rtol=1e-4, atol=1e-5)


def test_fused_ce_under_jit_and_vmap():
    rng = np.random.default_rng(3)
    b, t, d, vocab = 2, 12, 32, 96
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, vocab)) * 0.1, jnp.float32)
    targets = jnp.asarray(rng.integers(0, vocab, (b, t)), jnp.int32)

    fn = jax.jit(jax.vmap(
        lambda x, tg: fused_cross_entropy(x, w, tg, 64)))
    got = fn(x, targets)
    want = jnp.stack([naive_nll(x[i], w, targets[i]) for i in range(b)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
