"""Profiling and roofline accounting.

TPU analog of the reference's observability (SURVEY.md §5): the
reference times command buffers with gpuStartTime/gpuEndTime deltas
and reports GINSTRS = work / latency against an ALU roofline
(`SquareAttentionTest.swift:374-378, 741-757`; `README.md:104-129`).
Here the same GINSTRS accounting rides either wall-clock measurement
(amortized in-jit loops — the only sound method through a dispatch
tunnel) or a `jax.profiler` trace for per-kernel inspection.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from metal_flash_attention_tpu.runtime.context import DeviceContext


def measure_dispatch_floor(repeats: int = 10) -> float:
    """Best-case dispatch + scalar-readback latency of this
    environment (subtracted from loop timings)."""
    f = jax.jit(lambda x: (x * 1.0).sum())
    x = jnp.zeros((8, 128), jnp.float32)
    for _ in range(3):
        float(f(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def time_scalar_fn(fn: Callable, args: tuple, *, iters: int = 128,
                   repeats: int = 4,
                   dispatch_floor: Optional[float] = None) -> float:
    """Seconds per call of ``fn(*args) -> scalar-reducible array``,
    measured as `iters` in-jit iterations (a scalar carry perturbs the
    first argument so iterations cannot be CSE'd), minus the dispatch
    floor.  This is the timing methodology every number in
    BASELINE/bench.py uses; at ~25 ms tunnel round-trip anything less
    amortized shows +/-10pp utilization noise.
    """
    if dispatch_floor is None:
        dispatch_floor = measure_dispatch_floor()

    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*((a[0] + c.astype(a[0].dtype)),) + a[1:])
            first = out[0] if isinstance(out, (tuple, list)) else out
            return first.ravel()[:1].astype(jnp.float32).sum() * 0.0, ()
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
    return max((best - dispatch_floor) / iters, 1e-12)


@dataclass(frozen=True)
class RooflineReport:
    """One measurement against the chip roofline (the reference's
    CSV perf rows, `SquareAttentionTest.swift:149-181`)."""
    seconds: float
    ginstrs: float
    ginstrs_per_s: float
    utilization: float

    def __str__(self) -> str:
        return (f"{self.ginstrs_per_s:,.0f} GINSTRS/s "
                f"({self.utilization:.1%} of roofline, "
                f"{self.seconds * 1e6:.1f} us)")


def attention_roofline(
    fn: Callable, args: tuple, *, n: int, d: int, heads: int = 1,
    batch: int = 1, with_backward: bool = False, causal: bool = False,
    iters: int = 128, dispatch_floor: Optional[float] = None,
) -> RooflineReport:
    """Measure ``fn`` and report it against the (2D+5)/(9D+15) work
    model and the chip's FMA roofline."""
    ctx = DeviceContext.get()
    work = ctx.attention_ginstrs(
        n, d, heads=heads * batch, with_backward=with_backward,
        causal=causal)
    secs = time_scalar_fn(fn, args, iters=iters,
                          dispatch_floor=dispatch_floor)
    gps = work / secs / 1e9
    return RooflineReport(
        seconds=secs, ginstrs=work / 1e9, ginstrs_per_s=gps,
        utilization=gps / ctx.roofline_ginstrs_per_s)


@contextlib.contextmanager
def trace(path: str = "/tmp/mfa_tpu_trace"):
    """jax.profiler trace scope for per-kernel timeline inspection
    (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()
