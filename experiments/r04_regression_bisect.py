"""Bisect the r03 attention regression (VERDICT r3 weak #1).

BENCH_r02 -> BENCH_r03 dropped every attention row (fwd D=256
99.2% -> 73.8%) while same-session GEMM held (98.5% -> 96.1%).
Candidate causes, in order of prior:

  A. The r03 persistent-cache re-tune picked fwd D=256 (1024, 2048)
     over the checked-in r02 table row (512, 2048)
     (chip_session_r03.log:33 vs parameters.py ParameterRow(256, 512,
     2048)).  The cache was wiped by the machine reset, so TODAY's
     dispatch uses the r02 table again -> measure both explicitly.
  B. A code change between 65db6e9 (r02 bench state) and b68f37d.
     Audit says no non-causal kernel change exists (single_body
     defaults off; skip-prefetch is gated on causal/window), so if A
     shows no gap and today's numbers match r03, the change is
     environmental (chip/tunnel session drift that hits
     attention-shaped programs harder than GEMM).

This probe measures, in ONE session, with bench.py's exact harness:
  - GEMM 4096^3 control (the same-session compute-bound yardstick)
  - fwd D=256 N=2048 h8 at table blocks / (512,2048) / (1024,2048)
  - fwd D=128 N=4096 h8 at table blocks / (512,2048)
  - causal D=128 N=4096 h8 at table blocks (1024,1024)

Interpretation key (r02 vs r03 recorded utils):
  fwd D=256: 99.2% vs 73.8% | fwd D=128: 87.3% vs 82.2%
  causal D=128: 58.0% vs 50.4% | gemm 4096^3: 98.5% vs 96.1%
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from metal_flash_attention_tpu.ops.flash_attention import flash_attention
from metal_flash_attention_tpu.runtime.context import DeviceContext
from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor,
    time_scalar_fn,
)


def attn_row(n, d, heads, *, floor, causal=False, blocks=None):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, heads, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, heads, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, heads, n, d)), jnp.bfloat16)
    bq, bkv = blocks if blocks else (None, None)

    def one(q, k, v):
        o = flash_attention(q, k, v, causal=causal, block_q=bq,
                            block_kv=bkv)
        return o[0, 0, 0, :1].astype(jnp.float32).sum()

    ctx = DeviceContext.get()
    ginstrs = ctx.attention_ginstrs(n, d, heads=heads, causal=causal)
    est = ginstrs / (0.5 * ctx.roofline_ginstrs_per_s)
    iters = int(np.clip(0.3 / max(est, 1e-9), 128, 4096))
    secs = time_scalar_fn(one, (q, k, v), iters=iters,
                          dispatch_floor=floor)
    gps = ginstrs / secs / 1e9
    return gps, gps / ctx.roofline_ginstrs_per_s


def gemm_control(*, floor):
    rng = np.random.default_rng(0)
    m = 4096
    a = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)

    def one(a, b):
        return jnp.dot(a, b)[0, :1].astype(jnp.float32).sum()

    flops = 2 * m**3
    secs = time_scalar_fn(one, (a, b), iters=128, dispatch_floor=floor)
    peak = DeviceContext.get().info.peak_bf16_flops
    return flops / secs / 1e12, flops / secs / peak


def main():
    floor = measure_dispatch_floor()
    ctx = DeviceContext.get()
    print(f"device={ctx.device_kind} floor={floor * 1e3:.1f}ms "
          f"roofline={ctx.roofline_ginstrs_per_s:.0f}", flush=True)

    tf, util = gemm_control(floor=floor)
    print(f"CONTROL gemm 4096^3: {tf:.1f} TFLOPS ({util:.1%}) "
          f"[r02 98.5% r03 96.1%]", flush=True)

    cases = [
        ("fwd D=256 table", 2048, 256, False, None),
        ("fwd D=256 (512,2048)=r02", 2048, 256, False, (512, 2048)),
        ("fwd D=256 (1024,2048)=r03cache", 2048, 256, False, (1024, 2048)),
        ("fwd D=256 (1024,1024)", 2048, 256, False, (1024, 1024)),
        ("fwd D=128 table", 4096, 128, False, None),
        ("fwd D=128 (512,2048)", 4096, 128, False, (512, 2048)),
        ("causal D=128 table", 4096, 128, True, None),
        ("causal D=256 table", 2048, 256, True, None),
    ]
    for name, n, d, causal, blocks in cases:
        try:
            gps, util = attn_row(n, d, 8, floor=floor, causal=causal,
                                 blocks=blocks)
            print(f"{name:34s} {gps:9.0f} GINSTRS/s ({util:.1%})",
                  flush=True)
        except Exception as e:
            print(f"{name:34s} FAIL {type(e).__name__}: {e}",
                  flush=True)

    tf, util = gemm_control(floor=floor)
    print(f"CONTROL gemm 4096^3 (end): {tf:.1f} TFLOPS ({util:.1%})",
          flush=True)


if __name__ == "__main__":
    main()
