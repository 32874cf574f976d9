"""r05: why does the driver-bench fwd D=256 row read 74.1% when the
session-drift memo probes read 82-84% (VERDICT r4 next #5)?  Measure
the bench's own harness at explicit block configs, same session, plus
the D=128 lse-free-primal attribution (next #6)."""

import numpy as np
import jax
import jax.numpy as jnp

import bench
from metal_flash_attention_tpu.ops.flash_attention import flash_attention
from metal_flash_attention_tpu.runtime.context import DeviceContext
from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor,
    time_scalar_fn,
)

floor = measure_dispatch_floor()
ctx = DeviceContext.get()
roof = ctx.roofline_ginstrs_per_s
print(f"floor {floor * 1e3:.1f} ms  roofline {roof:,.0f} GINSTRS/s")

fl = bench.bench_gemm(4096, floor=floor)
print(f"CONTROL gemm 4096^3: {fl / ctx.info.peak_bf16_flops:5.1%}")


def run(n, d, heads, *, blocks=None, residuals=False, iters=None):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, heads, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, heads, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, heads, n, d)), jnp.bfloat16)
    bq, bkv = blocks if blocks else (None, None)

    def one(q, k, v):
        out = flash_attention(q, k, v, block_q=bq, block_kv=bkv,
                              return_residuals=residuals)
        o = out[0] if residuals else out
        return o[0, 0, 0, :1].astype(jnp.float32).sum()

    g = ctx.attention_ginstrs(n, d, heads=heads)
    if iters is None:
        est = g / (0.5 * roof)
        iters = int(np.clip(0.3 / max(est, 1e-9), 128, 4096))
    secs = time_scalar_fn(one, (q, k, v), iters=iters,
                          dispatch_floor=floor)
    return g / secs / 1e9 / roof * 100


for blocks in (None, (512, 2048), (1024, 2048), (1024, 1024),
               (512, 1024)):
    u = run(2048, 256, 8, blocks=blocks)
    print(f"fwd d256 n2048 blocks={blocks}: {u:5.1f}%")

for tag, kw in (("lse-free (default)", {}),
                ("with-lse (residuals)", {"residuals": True})):
    u = run(4096, 128, 8, **kw)
    print(f"fwd d128 n4096 {tag}: {u:5.1f}%")
