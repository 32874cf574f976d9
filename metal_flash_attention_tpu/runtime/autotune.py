"""Block-size autotuner.

TPU analog of the reference's registration-time mini-autotune
(`GEMM/GEMMDescriptor/GEMMDescriptor+PipelineCache.swift:75-119`): when
no block preference is known it builds a small set of candidates, runs
each on the device, and keeps the winner — here measured by latency
(the reference uses occupancy as a static proxy because Metal exposes
it; XLA doesn't, and latency is the ground truth anyway).

Winners land in :class:`KernelConfigCache` (persisted), and the best of
them get checked into the parameter tables
(`descriptors/parameters.py`), exactly as the reference's tables are
its autotuner's outputs committed as text.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from metal_flash_attention_tpu.runtime.cache import KernelConfigCache
from metal_flash_attention_tpu.utils.shapes import round_up

# Candidate grid: the TPU analog of the reference's 4-candidate
# {48x48x32, 48x48x40} x {asyncStore on/off} sweep — (block_q, block_kv)
# pairs spanning the VMEM/occupancy trade-off.
DEFAULT_CANDIDATES: tuple[tuple[int, int], ...] = (
    (256, 512), (512, 512), (512, 1024), (1024, 512),
    (1024, 1024), (512, 2048), (1024, 2048),
)


def _loop_timed(fn: Callable, args, *, iters: int, repeats: int) -> float:
    """Best wall time of `iters` in-jit iterations of fn (the dispatch
    round-trip is amortized inside one jit; see bench.py rationale)."""

    @jax.jit
    def run(*a):
        def body(c, _):
            s = fn(*((a[0] + c.astype(a[0].dtype)),) + a[1:])
            return s.astype(jnp.float32) * 0.0, ()
        c, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=iters)
        return c

    for _ in range(2):
        float(run(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def autotune_attention(
    *,
    kernel_type: str = "forward",
    n: int = 4096,
    head_dim: int = 128,
    heads: int = 8,
    dtype=jnp.bfloat16,
    causal: bool = False,
    candidates: Sequence[tuple[int, int]] = DEFAULT_CANDIDATES,
    iters: int = 16,
    repeats: int = 3,
    cache: Optional[KernelConfigCache] = None,
    verbose: bool = False,
) -> tuple[tuple[int, int], dict[tuple[int, int], float]]:
    """Measure candidate (block_q, block_kv) pairs for the attention
    kernels on the current device; returns (winner, latency table) and
    records the winner in the config cache."""
    from metal_flash_attention_tpu.ops.flash_attention import (
        flash_attention,
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, heads, n, head_dim)), dtype)
    k = jnp.asarray(rng.standard_normal((1, heads, n, head_dim)), dtype)
    v = jnp.asarray(rng.standard_normal((1, heads, n, head_dim)), dtype)
    if kernel_type != "forward":
        do = jnp.asarray(rng.standard_normal((1, heads, n, head_dim)), dtype)

    results: dict[tuple[int, int], float] = {}
    for bq, bkv in candidates:
        if bq > round_up(n, 128) or bkv > round_up(n, 128):
            continue

        if kernel_type == "forward":
            def one(q, k, v, bq=bq, bkv=bkv):
                o = flash_attention(
                    q, k, v, causal=causal, block_q=bq, block_kv=bkv)
                return o[0, 0, 0, :1].astype(jnp.float32).sum()
        else:
            def one(q, k, v, bq=bq, bkv=bkv):
                def loss(q_):
                    return jnp.sum(
                        (flash_attention(q_, k, v, causal=causal,
                                         block_q=bq, block_kv=bkv) * do)
                        .astype(jnp.float32))
                g = jax.grad(loss)(q)
                return g[0, 0, 0, :1].sum()

        try:
            results[(bq, bkv)] = _loop_timed(
                one, (q, k, v), iters=iters, repeats=repeats)
        except Exception as e:  # candidate may exceed VMEM
            if verbose:
                print(f"  ({bq},{bkv}) failed: {type(e).__name__}")
            continue
        if verbose:
            print(f"  ({bq},{bkv}): {results[(bq, bkv)] * 1e3:.3f} ms")

    assert results, "no autotune candidate compiled"
    winner = min(results, key=results.get)
    cache = cache or KernelConfigCache.get()
    key = cache.attention_key(kernel_type, head_dim, dtype,
                              q_len_bucket=1 << (n - 1).bit_length())
    cache.insert(key, winner)
    return winner, results


GEMM_CANDIDATES: tuple[tuple[int, int], ...] = (
    (256, 256), (256, 512), (512, 256), (512, 512), (128, 512),
    (512, 1024), (1024, 512),
)


def autotune_gemm(
    *,
    m: int = 1024,
    n: int = 1024,
    k: int = 1024,
    dtype=jnp.bfloat16,
    transpose_a: bool = False,
    transpose_b: bool = False,
    candidates: Sequence[tuple[int, int]] = GEMM_CANDIDATES,
    iters: int = 32,
    repeats: int = 3,
    cache: Optional[KernelConfigCache] = None,
    verbose: bool = False,
) -> tuple[tuple[int, int], dict[tuple[int, int], float]]:
    """Measure candidate (block_m, block_n) pairs for the GEMM kernel
    (block_k resolves from the descriptor heuristic); record the
    winner under the problem's canonical key."""
    from metal_flash_attention_tpu.descriptors.gemm_descriptor import (
        GEMMDescriptor,
    )
    from metal_flash_attention_tpu.descriptors.precision import (
        OperandPrecision,
    )
    from metal_flash_attention_tpu.ops.gemm import gemm

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(
        (k, m) if transpose_a else (m, k)), dtype)
    b = jnp.asarray(rng.standard_normal(
        (n, k) if transpose_b else (k, n)), dtype)
    desc = GEMMDescriptor(
        m=m, n=n, k=k,
        precision_a=OperandPrecision.from_dtype(dtype),
        precision_b=OperandPrecision.from_dtype(dtype),
        transpose_a=transpose_a, transpose_b=transpose_b)

    results: dict[tuple[int, int], float] = {}
    for bm, bn in candidates:
        bk = desc._pick_block_k(bm, bn)

        def one(a, b, bm=bm, bn=bn, bk=bk):
            out = gemm(a, b, transpose_a=transpose_a,
                       transpose_b=transpose_b,
                       block_m=bm, block_n=bn, block_k=bk)
            return out[0, :1].astype(jnp.float32).sum()

        try:
            results[(bm, bn)] = _loop_timed(
                one, (a, b), iters=iters, repeats=repeats)
        except Exception as e:
            if verbose:
                print(f"  ({bm},{bn}) failed: {type(e).__name__}")
            continue
        if verbose:
            print(f"  ({bm},{bn}): {results[(bm, bn)] * 1e3:.3f} ms")

    assert results, "no autotune candidate compiled"
    winner = min(results, key=results.get)
    cache = cache or KernelConfigCache.get()
    cache.insert(desc.cache_key(), winner)
    return winner, results


def lookup_tuned_blocks(
    kernel_type: str, head_dim: int, dtype, n: int,
) -> Optional[tuple[int, int]]:
    """Check the config cache for a measured winner before falling back
    to the static tables (reference: pipeline-cache early return,
    `GEMMDescriptor+PipelineCache.swift:25-27`)."""
    cache = KernelConfigCache.get()
    key = cache.attention_key(kernel_type, head_dim, dtype,
                              q_len_bucket=1 << (max(n, 1) - 1).bit_length())
    return cache.lookup(key)
