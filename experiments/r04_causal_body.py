"""Single vs dual body under the r04 tiled-broadcast regime.

The r03 lean-body matrix tied single/dual — but that was measured
when the per-step cost was dominated by the slice-broadcast lowering.
With full-lane tiles the guarded program is smaller and the balance
may flip; ours loses ~16% beyond diagonal waste on causal vs its own
non-causal rate, where jax-flash loses ~nothing.
"""

import importlib

import numpy as np
import jax
import jax.numpy as jnp

fa = importlib.import_module(
    "metal_flash_attention_tpu.ops.flash_attention")
from metal_flash_attention_tpu.runtime.context import DeviceContext
from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor,
    time_scalar_fn,
)

ctx = DeviceContext.get()
ROOF = ctx.roofline_ginstrs_per_s
floor = measure_dispatch_floor()
print(f"# roofline {ROOF:.0f}, floor {floor*1e3:.1f} ms", flush=True)
HEADS = 8


def measure(n, d, blocks, single):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)

    def fn(q, k, v):
        o = fa.flash_attention(q, k, v, causal=True, block_q=blocks[0],
                               block_kv=blocks[1])
        return o[0, 0, 0, :1].astype(jnp.float32).sum()

    gi = ctx.attention_ginstrs(n, d, heads=HEADS, causal=True)
    est = gi / (0.5 * ROOF)
    iters = int(np.clip(0.3 / max(est / 1e9, 1e-9), 128, 4096))
    fa._SINGLE_BODY = single
    fa.flash_attention.clear_cache()
    try:
        return gi / time_scalar_fn(fn, (q, k, v), iters=iters,
                                   dispatch_floor=floor) / 1e9 / ROOF
    finally:
        fa._SINGLE_BODY = None
        fa.flash_attention.clear_cache()


if __name__ == "__main__":
    for n, d in ((4096, 128), (2048, 256), (4096, 64)):
        for blocks in ((512, 512), (1024, 1024), (1024, 512)):
            row = []
            for single in (False, True):
                try:
                    u = measure(n, d, blocks, single)
                    row.append(f"{'single' if single else 'dual'}:"
                               f" {100*u:5.1f}%")
                except Exception as e:
                    row.append(f"FAIL {type(e).__name__}")
            print(f"N={n} D={d} {blocks}: " + "  ".join(row),
                  flush=True)
