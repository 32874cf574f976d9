"""Tolerance tiers by precision regime.

Mirrors the reference's test tolerances
(`Tests/FlashAttentionTests/Attention/SquareAttentionTest.swift:538-554`):
FP32 2e-5 everywhere; mixed precision 5e-2 for O/dV/dK/dQ, 7e-3 for L,
1e-1 for D; GEMM 1e-5 / 5e-3 / 5e-2 by worst operand
(`LaplacianTest.swift:275-291`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Tolerances:
    o: float
    grads: float
    lse: float
    d_term: float


FP32_TOL = Tolerances(o=2e-5, grads=2e-5, lse=2e-5, d_term=2e-5)
MIXED_TOL = Tolerances(o=5e-2, grads=5e-2, lse=7e-3, d_term=1e-1)
# Quantized KV: logits must match the FP16 run within this delta
# (BASELINE.md "FP8-KV decode matching FP16 logits within stated delta").
QUANTIZED_KV_TOL = Tolerances(o=1e-1, grads=1e-1, lse=5e-2, d_term=2e-1)


def tolerances_for(dtype) -> Tolerances:
    if jnp.dtype(dtype) == jnp.dtype(jnp.float32):
        return FP32_TOL
    return MIXED_TOL


def max_abs_err(a, b) -> float:
    import numpy as np
    return float(
        np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)))
    )


def fp32_kernel_tol() -> float:
    """FP32 comparison tolerance for kernel-vs-golden: tighter on CPU
    (exact fp32) than on TPU, where "highest" precision is a multi-pass
    bf16 MXU emulation with ~1e-4 worst-case accumulation error."""
    import jax

    return 3e-5 if jax.default_backend() == "cpu" else 2e-4
