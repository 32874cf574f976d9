"""In-kernel MXU rate probe: depth-64 vs depth-128 contractions.

The XLA-level probe (d64_probe.py) is confounded by the fp32 output
write (67 MB out vs 2 MB in).  This one times a Pallas kernel that
loops matmuls over VMEM-resident operands and writes one small tile,
isolating the raw MXU issue rate for the shapes attention uses:

  QK at D:    [bq, D]   x [D, bkv]   (depth = D)
  PV at D:    [bq, bkv] x [bkv, D]   (lanes = D)

Run on the real chip:  PYTHONPATH=. python experiments/d64_mxu_probe.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor, time_scalar_fn)
from metal_flash_attention_tpu.runtime.context import DeviceContext

ctx = DeviceContext.get()
floor = measure_dispatch_floor()
PEAK = 2 * ctx.roofline_ginstrs_per_s * 1e9  # bf16 FLOPS
print(f"# peak {PEAK/1e12:.0f} TFLOPS, floor {floor*1e3:.1f} ms",
      flush=True)

INNER = 1024  # matmuls per kernel invocation


def probe(m, k, n, *, contract_last=True):
    """Time INNER matmuls of [m,k]x[k,n] on VMEM operands."""
    nt = min(n, 128)

    def kernel(a_ref, b_ref, o_ref):
        a0 = a_ref[...]
        b0 = b_ref[...]

        def body(c, acc):
            # Data-dependence on the carry stops hoisting/CSE: one
            # scalar broadcast-add on the small operand per iteration.
            a = a0 + acc[0, 0].astype(a0.dtype)
            s = jax.lax.dot_general(
                a, b0, (((1,), (1 if contract_last else 0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            # Full-output scalar reduce: a sliced consumption lets
            # Mosaic compute only the consumed rows/cols of the dot
            # (QK shapes "measured" 4-9x peak with s[:8, :128]).  The
            # [m, n] VPU reduce adds ~5-10% — rates here are a hair
            # pessimistic, never optimistic.
            return acc * 0.5 + jnp.sum(s)

        acc = jnp.zeros((8, nt), jnp.float32)
        o_ref[...] = jax.lax.fori_loop(0, INNER, body, acc)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    bshape = (n, k) if contract_last else (k, n)
    b = jnp.asarray(rng.standard_normal(bshape), jnp.bfloat16)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, nt), jnp.float32),
    )
    secs = time_scalar_fn(lambda a, b: fn(a, b), (a, b), iters=64,
                          dispatch_floor=floor) / INNER
    flops = 2 * m * k * n
    return flops / secs / 1e12, flops / secs / PEAK


print("# in-kernel matmul rates (bf16, VMEM-resident):", flush=True)
for (m, k, n, cl, label) in [
    (1024, 128, 2048, True,  "QK D=128"),
    (1024, 64, 2048, True,   "QK D=64"),
    (2048, 64, 2048, True,   "QK D=64 2x rows"),
    (1024, 2048, 128, False, "PV D=128"),
    (1024, 2048, 64, False,  "PV D=64"),
    (1024, 2048, 128, True,  "PV D=128 (B pre-transposed)"),
    (1024, 1024, 1024, True, "square 1024"),
]:
    try:
        tf, util = probe(m, k, n, contract_last=cl)
        print(f"#  {label:28s} [{m},{k}]x[{k},{n}]: {tf:7.1f} TFLOPS "
              f"({util:6.1%})", flush=True)
    except Exception as e:
        print(f"#  {label:28s} FAIL {type(e).__name__}: {e}", flush=True)
