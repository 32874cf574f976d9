"""compat.dot_product_attention must match jax.nn.dot_product_attention
(the XLA reference implementation) across its argument surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.compat import dot_product_attention


def _mk(b, t, s, n, k, h, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, n, h)), dtype)
    kk = jnp.asarray(rng.standard_normal((b, s, k, h)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, k, h)), dtype)
    return q, kk, v


def _close(a, b, tol=2e-5):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        rtol=tol, atol=tol)


def test_plain_and_causal_and_gqa():
    q, k, v = _mk(2, 64, 64, 8, 2, 32)
    _close(dot_product_attention(q, k, v),
           jax.nn.dot_product_attention(q, k, v))
    _close(dot_product_attention(q, k, v, is_causal=True),
           jax.nn.dot_product_attention(q, k, v, is_causal=True))
    _close(dot_product_attention(q, k, v, scale=0.25),
           jax.nn.dot_product_attention(q, k, v, scale=0.25))


def test_bias_and_mask_broadcast():
    q, k, v = _mk(2, 32, 48, 4, 4, 16, seed=1)
    rng = np.random.default_rng(2)
    bias = jnp.asarray(rng.standard_normal((1, 4, 32, 48)), jnp.float32)
    mask = jnp.asarray(rng.random((2, 1, 32, 48)) > 0.3)
    _close(dot_product_attention(q, k, v, bias=bias),
           jax.nn.dot_product_attention(q, k, v, bias=bias))
    got = dot_product_attention(q, k, v, mask=mask)
    want = jax.nn.dot_product_attention(q, k, v, mask=mask)
    _close(got, want)


def test_kv_seq_lengths():
    q, k, v = _mk(2, 16, 64, 4, 4, 16, seed=3)
    lens = jnp.asarray([64, 37], jnp.int32)
    got = dot_product_attention(q, k, v, key_value_seq_lengths=lens)
    want = jax.nn.dot_product_attention(q, k, v,
                                        key_value_seq_lengths=lens)
    _close(got, want)


def test_query_seq_lengths_valid_region():
    q, k, v = _mk(2, 32, 32, 2, 2, 16, seed=4)
    qlens = jnp.asarray([32, 20], jnp.int32)
    klens = jnp.asarray([32, 32], jnp.int32)
    got = dot_product_attention(q, k, v, query_seq_lengths=qlens,
                                key_value_seq_lengths=klens)
    want = jax.nn.dot_product_attention(
        q, k, v, query_seq_lengths=qlens, key_value_seq_lengths=klens)
    # Compare the valid query rows; padded rows are don't-care (both
    # implementations zero or garbage them independently).
    for bi, ql in enumerate([32, 20]):
        _close(got[bi, :ql], want[bi, :ql])


def test_local_window():
    q, k, v = _mk(1, 64, 64, 2, 2, 16, seed=5)
    got = dot_product_attention(q, k, v, is_causal=True,
                                local_window_size=(16, 0))
    want = jax.nn.dot_product_attention(q, k, v, is_causal=True,
                                        local_window_size=(16, 0))
    _close(got, want)
    # int window is symmetric (w, w) in jax.nn; under is_causal the
    # right half is masked anyway, so it must be accepted and match.
    got = dot_product_attention(q, k, v, is_causal=True,
                                local_window_size=8)
    want = jax.nn.dot_product_attention(q, k, v, is_causal=True,
                                        local_window_size=8)
    _close(got, want)
    with pytest.raises(NotImplementedError):
        dot_product_attention(q, k, v, local_window_size=(8, 8))
    with pytest.raises(NotImplementedError):
        dot_product_attention(q, k, v, local_window_size=8)


def test_rectangular_causal_top_left_alignment():
    """T != S: jax.nn's causal/window masks are top-left aligned
    (query i attends keys <= i), not the decode-style bottom-right
    offset — the adapter must reproduce jax.nn exactly."""
    q, k, v = _mk(2, 16, 64, 2, 2, 16, seed=7)
    _close(dot_product_attention(q, k, v, is_causal=True),
           jax.nn.dot_product_attention(q, k, v, is_causal=True))
    # T > S as well.
    q2, k2, v2 = _mk(1, 48, 32, 2, 2, 16, seed=8)
    _close(dot_product_attention(q2, k2, v2, is_causal=True),
           jax.nn.dot_product_attention(q2, k2, v2, is_causal=True))
    # Rectangular causal window, and with a user mask on top.
    _close(
        dot_product_attention(q, k, v, is_causal=True,
                              local_window_size=(8, 0)),
        jax.nn.dot_product_attention(q, k, v, is_causal=True,
                                     local_window_size=(8, 0)))
    rng = np.random.default_rng(9)
    mask = jnp.asarray(rng.random((2, 1, 16, 64)) > 0.2)
    _close(
        dot_product_attention(q, k, v, mask=mask, is_causal=True),
        jax.nn.dot_product_attention(q, k, v, mask=mask,
                                     is_causal=True))


def test_differentiable_matches():
    q, k, v = _mk(1, 32, 32, 2, 2, 16, seed=6)

    def f_ours(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, is_causal=True))

    def f_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v,
                                                    is_causal=True))

    g1 = jax.grad(f_ours, (0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        _close(a, b, tol=1e-4)
