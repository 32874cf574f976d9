"""GEMM kernel correctness.

Two oracles, after the reference's test strategy:
- the Laplacian closed-form check (`LaplacianTest.swift:137-148`):
  A = periodic second-order Laplacian => each C row is
  B[r-1] - 2 B[r] + B[r+1], verifiable in O(N^2) without a matmul;
- adversarial random shapes with random transposes, precisions and
  `loadPreviousC` (`AdversarialShapeTest.swift:7-337`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.ops.gemm import batched_gemm, gemm
from metal_flash_attention_tpu.utils.tolerances import (
    fp32_kernel_tol,
    max_abs_err,
)


def laplacian(n: int) -> np.ndarray:
    a = np.zeros((n, n), np.float32)
    idx = np.arange(n)
    a[idx, idx] = -2.0
    a[idx, (idx + 1) % n] = 1.0
    a[idx, (idx - 1) % n] = 1.0
    return a


# Probe misalignment cliffs around block boundaries like the
# reference's 511/512/513 probes (`LaplacianTest.swift:44-109`).
@pytest.mark.parametrize("backend", ["auto", "pallas"])
@pytest.mark.parametrize("n", [7, 64, 127, 128, 129, 255, 256, 257])
@pytest.mark.parametrize("ta,tb", [(False, False), (False, True),
                                   (True, False), (True, True)])
def test_gemm_laplacian(rng, n, ta, tb, backend):
    a_np = laplacian(n)
    b_np = rng.standard_normal((n, n)).astype(np.float32)
    a = jnp.asarray(a_np.T if ta else a_np)
    b = jnp.asarray(b_np.T if tb else b_np)
    out = gemm(a, b, transpose_a=ta, transpose_b=tb, backend=backend)
    expected = np.roll(b_np, 1, 0) - 2 * b_np + np.roll(b_np, -1, 0)
    assert max_abs_err(out, expected) < fp32_kernel_tol() * max(1, n // 64)


@pytest.mark.parametrize("backend", ["auto", "pallas"])
@pytest.mark.parametrize("trial", range(8))
def test_gemm_adversarial(rng, trial, backend):
    r = np.random.default_rng(trial)
    # Cubed-uniform small-biased sizes (AdversarialShapeTest.swift:12-16)
    m, n, k = (int(r.uniform(0, 1) ** 3 * 500) + 1 for _ in range(3))
    ta, tb = bool(r.integers(2)), bool(r.integers(2))
    load_c = bool(r.integers(2))
    a_np = r.standard_normal((m, k)).astype(np.float32)
    b_np = r.standard_normal((k, n)).astype(np.float32)
    c_np = r.standard_normal((m, n)).astype(np.float32) if load_c else None
    a = jnp.asarray(a_np.T if ta else a_np)
    b = jnp.asarray(b_np.T if tb else b_np)
    c = jnp.asarray(c_np) if load_c else None
    out = gemm(a, b, c, transpose_a=ta, transpose_b=tb, backend=backend)
    expected = a_np @ b_np + (c_np if load_c else 0.0)
    tol = fp32_kernel_tol() * max(1, k // 64)
    assert max_abs_err(out, expected) < tol, (m, n, k, ta, tb, load_c)


def test_gemm_bf16(rng):
    m = n = k = 256
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    out = gemm(a, b)
    expected = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    assert max_abs_err(out, expected) / np.abs(expected).max() < 5e-2


def test_gemm_mixed_precision(rng):
    m = n = k = 128
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    out = gemm(a, b, out_dtype=jnp.float32)
    expected = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    assert max_abs_err(out, expected) / np.abs(expected).max() < 5e-3


def test_batched_gemm(rng):
    a = jnp.asarray(rng.standard_normal((3, 64, 96)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((3, 96, 72)), jnp.float32)
    out = batched_gemm(a, b)
    expected = np.einsum("bmk,bkn->bmn", np.asarray(a), np.asarray(b))
    assert max_abs_err(out, expected) < fp32_kernel_tol() * 2


def test_gemm_descriptor_heuristic():
    from metal_flash_attention_tpu.descriptors.gemm_descriptor import (
        GEMMDescriptor,
    )
    from metal_flash_attention_tpu.descriptors.precision import (
        OperandPrecision,
    )
    from metal_flash_attention_tpu.runtime.cache import (
        KernelConfigCache,
    )

    d = GEMMDescriptor(m=4096, n=4096, k=4096,
                       precision_a=OperandPrecision.BF16,
                       precision_b=OperandPrecision.BF16)
    # This test asserts the ANALYTIC heuristic; on a chip whose
    # persistent cache holds a measured winner (e.g. the r05 autotune
    # preferred (1024, 512) at 4096³), kernel_config rightly returns
    # that instead — so isolate the resolution from tuned state.
    saved = KernelConfigCache._instance
    KernelConfigCache._instance = KernelConfigCache(
        store_path="/dev/null")
    try:
        cfg = d.kernel_config(vmem_budget=15 * 2**20)
    finally:
        KernelConfigCache._instance = saved
    # Large problems take 1024-wide tiles within the VMEM budget.
    assert cfg.block_m == 1024 and cfg.block_n == 1024
    assert GEMMDescriptor._vmem_bytes(
        cfg.block_m, cfg.block_n, cfg.block_k, 2) <= 15 * 2**20
    # Small problems shrink to the problem size.
    d2 = GEMMDescriptor(m=100, n=100, k=100,
                        precision_a=OperandPrecision.FP32,
                        precision_b=OperandPrecision.FP32)
    cfg2 = d2.kernel_config(vmem_budget=15 * 2**20)
    assert cfg2.block_m <= 128 and cfg2.block_n == 128
    # Transposed A forces lane alignment on block_m.
    d3 = GEMMDescriptor(m=100, n=100, k=100, transpose_a=True,
                        precision_a=OperandPrecision.FP32,
                        precision_b=OperandPrecision.FP32)
    assert d3.kernel_config(vmem_budget=15 * 2**20).block_m == 128


def test_gemm_descriptor_cache_roundtrip(tmp_path, monkeypatch):
    from metal_flash_attention_tpu.descriptors.gemm_descriptor import (
        GEMMDescriptor,
    )
    from metal_flash_attention_tpu.descriptors.precision import (
        OperandPrecision,
    )
    from metal_flash_attention_tpu.runtime.cache import KernelConfigCache

    cache = KernelConfigCache(str(tmp_path / "s.json"))
    monkeypatch.setattr(KernelConfigCache, "_instance", cache)
    d = GEMMDescriptor(m=512, n=512, k=512,
                       precision_a=OperandPrecision.BF16,
                       precision_b=OperandPrecision.BF16)
    cache.insert(d.cache_key(), (256, 384))
    cfg = d.kernel_config()
    assert (cfg.block_m, cfg.block_n) == (256, 384)


def test_gemm_chain_matches_reference():
    """gemm_chain == the unrolled dependent product (the small-GEMM
    occupancy API anchor; perf story in its docstring + the
    gemm_bf16_512_chain8 bench row)."""
    import numpy as np

    from metal_flash_attention_tpu.ops.gemm import gemm, gemm_chain

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((96, 96)), jnp.float32)
          for _ in range(3)]
    out = gemm_chain(x, ws)
    ref = x
    for w in ws:
        ref = gemm(ref, w)
    assert jnp.allclose(out, ref), "chain diverges from unrolled gemms"
