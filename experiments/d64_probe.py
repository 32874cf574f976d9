"""D=64 wall probe (VERDICT r1 item 1).

Measures raw MXU throughput of thin matmuls to establish whether the
claimed 'half depth-utilization at 64-deep contraction' is a measured
hardware property of v5e, and sweeps D=64 forward-attention block
configs looking for pipeline-efficiency headroom under that wall.

Run on the real chip:  python experiments/d64_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp

from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor, time_scalar_fn)
from metal_flash_attention_tpu.runtime.context import DeviceContext

ctx = DeviceContext.get()
floor = measure_dispatch_floor()
ROOF = ctx.roofline_ginstrs_per_s  # GINSTRS/s (= GFLOPS/2)
print(f"# roofline {ROOF:.0f} GINSTRS/s, floor {floor*1e3:.1f} ms",
      flush=True)


def matmul_rate(m, k, n, dtype=jnp.bfloat16, iters=512):
    import numpy as np
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), dtype)
    b = jnp.asarray(rng.standard_normal((k, n)), dtype)
    # Full-output sum: consuming only out[0, :1] lets XLA slice the
    # whole matmul down to one row.
    fn = lambda a, b: jnp.sum(jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT))
    secs = time_scalar_fn(fn, (a, b), iters=iters, dispatch_floor=floor)
    flops = 2 * m * k * n
    tflops = flops / secs / 1e12
    # utilization vs bf16 MXU peak (2*ROOF GFLOPS)
    util = (flops / 2 / secs / 1e9) / ROOF
    return tflops, util


print("# raw matmul rates (bf16):", flush=True)
for (m, k, n) in [
    (4096, 128, 4096),   # QK-shaped, D=128
    (4096, 64, 4096),    # QK-shaped, D=64
    (8192, 64, 4096),    # QK D=64, 2x rows
    (4096, 4096, 128),   # PV-shaped, D=128
    (4096, 4096, 64),    # PV-shaped, D=64
    (8192, 4096, 64),    # PV D=64, 2x rows
    (4096, 4096, 4096),  # square control
]:
    tf, util = matmul_rate(m, k, n)
    print(f"#  [{m},{k}]x[{k},{n}]: {tf:7.1f} TFLOPS  ({util:6.1%} "
          f"of bf16 peak)", flush=True)
