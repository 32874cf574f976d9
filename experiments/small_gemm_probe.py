"""Small-GEMM latency probe: where does 512^3 lose its 2/3?

Roofline context (v5e): a 512^3 bf16 GEMM moves 1.0 MB of operands +
0.5 MB of output for 0.27 GFLOP — arithmetic intensity 171 FLOP/byte
vs the chip's 240 FLOP/byte balance point, so even PERFECT DMA/compute
overlap caps it at ~71% of the MXU peak.  BENCH_r01 measured 34.9%
through XLA.  Candidate recoveries probed here, all timed with the
floor-amortized in-jit loop (utils/profiling.time_scalar_fn):

  xla            jax.lax.dot_general (the gemm() default route)
  pallas-1       one Pallas program, whole problem in VMEM (no grid:
                 zero pipelining, pure launch baseline)
  pallas-k       K-grid only (m=n=512, k=128): DMA of the next K-block
                 overlaps the current dot, out-block written once
  pallas-mn      the autotune-heuristic block choice via gemm(backend=
                 "pallas")
  fused-chain    8 dependent 512^3 GEMMs inside one jit: measures
                 whether XLA keeps intermediates in VMEM when the
                 chain is compiler-visible (the realistic serving
                 shape for small GEMMs: back-to-back layers, not
                 isolated dispatches)

Run on the real chip:  PYTHONPATH=. python experiments/small_gemm_probe.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_tpu.ops.gemm import gemm
from metal_flash_attention_tpu.runtime.context import DeviceContext
from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor, time_scalar_fn)

ctx = DeviceContext.get()
PEAK = ctx.info.peak_bf16_flops
floor = measure_dispatch_floor()
print(f"# peak {PEAK/1e12:.0f} TFLOPS, floor {floor*1e3:.1f} ms",
      flush=True)


def report(label, secs, size, chain=1):
    fl = 2 * size**3 * chain / secs
    print(f"{label:12s} {secs*1e6:8.1f} us  {fl/1e12:7.1f} TFLOPS "
          f"({fl/PEAK:6.1%})", flush=True)


def pallas_single(a, b):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT).astype(o_ref.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[1]),
                                       jnp.bfloat16),
    )(a, b)


def pallas_kgrid(a, b, bk=128):
    m, k = a.shape
    n = b.shape[1]
    nk = k // bk

    def kernel(a_ref, b_ref, o_ref, acc):
        kk = pl.program_id(0)

        @pl.when(kk == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        acc[...] += jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

        @pl.when(kk == nk - 1)
        def _():
            o_ref[...] = acc[...].astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(nk,),
        in_specs=[pl.BlockSpec((m, bk), lambda kk: (0, kk)),
                  pl.BlockSpec((bk, n), lambda kk: (kk, 0))],
        out_specs=pl.BlockSpec((m, n), lambda kk: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(a, b)


for size in (512, 1024, 1489):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((size, size)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((size, size)), jnp.bfloat16)
    iters = max(128, int(4e13 / (2 * size**3)))
    print(f"## {size}^3  (iters={iters})", flush=True)

    def xla(a, b):
        return gemm(a, b)[0, :1].astype(jnp.float32).sum()
    report("xla", time_scalar_fn(xla, (a, b), iters=iters,
                                 dispatch_floor=floor), size)

    if size <= 1024:
        def p1(a, b):
            return pallas_single(a, b)[0, :1].astype(jnp.float32).sum()
        try:
            report("pallas-1", time_scalar_fn(p1, (a, b), iters=iters,
                                              dispatch_floor=floor), size)
        except Exception as e:
            print(f"pallas-1     FAIL {type(e).__name__}: {e}")

        def pk(a, b):
            return pallas_kgrid(a, b)[0, :1].astype(jnp.float32).sum()
        try:
            report("pallas-k", time_scalar_fn(pk, (a, b), iters=iters,
                                              dispatch_floor=floor), size)
        except Exception as e:
            print(f"pallas-k     FAIL {type(e).__name__}: {e}")

    def pmn(a, b):
        return gemm(a, b, backend="pallas")[0, :1].astype(
            jnp.float32).sum()
    try:
        report("pallas-mn", time_scalar_fn(pmn, (a, b), iters=iters,
                                           dispatch_floor=floor), size)
    except Exception as e:
        print(f"pallas-mn    FAIL {type(e).__name__}: {e}")

    CHAIN = 8

    def chain(a, b):
        x = a
        for _ in range(CHAIN):
            x = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT).astype(jnp.bfloat16)
        return x[0, :1].astype(jnp.float32).sum()
    report("fused-chain",
           time_scalar_fn(chain, (a, b), iters=max(iters // CHAIN, 32),
                          dispatch_floor=floor),
           size, chain=CHAIN)
