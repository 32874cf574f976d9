"""Standalone softmax / derivative-softmax kernels (archive parity:
Documentation/Archive/Softmax.swift, DerivativeSoftmax.swift)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.ops.softmax import (
    derivative_softmax,
    scaled_softmax,
)


@pytest.mark.parametrize("rows,cols", [(8, 128), (100, 100), (257, 777),
                                       (512, 512)])
def test_scaled_softmax(rng, rows, cols):
    s = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float32)
    got = scaled_softmax(s)
    want = jax.nn.softmax(s / jnp.sqrt(jnp.float32(cols)), axis=-1)
    assert float(jnp.max(jnp.abs(got - want))) < 2e-6


def test_scaled_softmax_batched_custom_scale(rng):
    s = jnp.asarray(rng.standard_normal((2, 3, 64, 200)), jnp.float32)
    got = scaled_softmax(s, scale=0.25)
    want = jax.nn.softmax(s * 0.25, axis=-1)
    assert float(jnp.max(jnp.abs(got - want))) < 2e-6


def test_scaled_softmax_extreme_logits(rng):
    # Online-max discipline: no overflow on large logits.
    s = jnp.asarray(rng.standard_normal((16, 256)) * 1e4, jnp.float32)
    got = scaled_softmax(s, scale=1.0)
    assert bool(jnp.all(jnp.isfinite(got)))
    assert float(jnp.max(jnp.abs(jnp.sum(got, -1) - 1.0))) < 1e-5


def test_derivative_softmax_matches_jvp(rng):
    rows, cols = 64, 300
    s = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float32)
    dp = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    got = derivative_softmax(p, dp, scale=0.5)
    # Autodiff oracle: dS = d softmax / dS^T applied to dP, scaled.
    _, vjp = jax.vjp(lambda s_: jax.nn.softmax(s_, axis=-1), s)
    want = vjp(dp)[0] * 0.5
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5
