"""Finite-differencing cross-check of the analytic backward kernels.

The reference keeps this archived and #if false'd
(`Documentation/Archive/FiniteDifferencingTest.swift:8-30`,
rationale at `Tests/Utilities/Network.swift:13-59`): perturb one input
element by +/- h, difference the loss Phi = sum(dO * O), and compare
against the analytic gradient.  Here it runs live — it is the only
test tier whose oracle does not share ANY code with the kernels or the
jnp golden model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.ops.flash_attention import flash_attention


def phi(q, k, v, do, **kw):
    o = flash_attention(q, k, v, **kw)
    return float(jnp.sum(o.astype(jnp.float64)
                         * do.astype(jnp.float64)))


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_central_differences(rng, causal):
    n, d = 48, 32
    q = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)

    grads = jax.grad(
        lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, causal=causal) * do),
        (0, 1, 2))(q, k, v)

    h = 1e-3
    probes = [(int(a), int(b)) for a, b in
              rng.integers(0, min(n, d), size=(6, 2))]
    for op_idx, (name, x) in enumerate((("q", q), ("k", k), ("v", v))):
        for (r, c) in probes[:3]:
            e = jnp.zeros_like(x).at[0, 0, r, c].set(h)
            args = [q, k, v]
            args_p = list(args); args_p[op_idx] = x + e
            args_m = list(args); args_m[op_idx] = x - e
            fd = (phi(*args_p, do, causal=causal)
                  - phi(*args_m, do, causal=causal)) / (2 * h)
            analytic = float(grads[op_idx][0, 0, r, c])
            assert abs(fd - analytic) < 2e-2 * max(1.0, abs(analytic)), (
                name, r, c, fd, analytic)
