"""Fourth causal redesign probe: single always-masked body vs the
dual interior/masked body pair (ops/flash_attention._SINGLE_BODY).

The r03 external cross-check localized the mid-N causal gap to
per-block fixed cost at small blocks: a tuned jax-flash at (512,512)
reads 53.9% where this kernel reads 29%, and its block body is lean —
one body, always masked.  Our dual-body form instantiates the full
body TWICE under two `pl.when`s, doubling the guarded program; this
probe measures whether halving the instantiated code (at the price of
mask compares on interior blocks) moves the wall shapes.

Matrix: {dual, single} x {(1024,1024), (512,512), (512,1024)} at the
three causal wall shapes + the non-causal padded-N shape (the only
non-causal user of the guard path).  Plus a bitwise check single==dual.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/causal_lean_probe.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import importlib

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
print(f"# roofline {ROOF:.0f} GINSTRS/s, floor {floor*1e3:.1f} ms",
      flush=True)

HEADS = 8


def timed_util(fn, args, *, n, d, causal):
    gi = ctx.attention_ginstrs(n, d, heads=HEADS, causal=causal)
    est = gi / (0.5 * ROOF)
    iters = int(np.clip(0.3 / max(est / 1e9, 1e-9), 128, 4096))
    secs = time_scalar_fn(fn, args, iters=iters, dispatch_floor=floor)
    return gi / secs / 1e9 / ROOF


def run(n, d, causal, blocks):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)

    def fn(q, k, v):
        o = fa.flash_attention(q, k, v, causal=causal,
                               block_q=blocks[0], block_kv=blocks[1])
        return o[0, 0, 0, :1].astype(jnp.float32).sum()

    outs = {}
    for name, flag in (("dual", False), ("single", True)):
        # The flag is read at trace time, NOT part of the jit cache
        # key — identical shapes would silently reuse the other
        # variant's executable without this.
        fa._SINGLE_BODY = flag
        fa.flash_attention.clear_cache()
        try:
            outs[name] = timed_util(fn, (q, k, v), n=n, d=d,
                                    causal=causal)
        finally:
            fa._SINGLE_BODY = None
    fa.flash_attention.clear_cache()
    return outs


def check_equal(n, d, causal, blocks):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.bfloat16)
    res = {}
    for name, flag in (("dual", False), ("single", True)):
        fa._SINGLE_BODY = flag
        fa.flash_attention.clear_cache()
        try:
            res[name] = np.asarray(fa.flash_attention(
                q, k, v, causal=causal, block_q=blocks[0],
                block_kv=blocks[1]).astype(jnp.float32))
        finally:
            fa._SINGLE_BODY = None
    fa.flash_attention.clear_cache()
    same = np.array_equal(res["dual"], res["single"])
    print(f"  bitwise single==dual (N={n} D={d} causal={causal} "
          f"{blocks}): {same}")
    assert same or np.max(np.abs(res["dual"] - res["single"])) < 1e-6


if __name__ == "__main__":
    # The dynamic-traversal kernel owns N>=8192; the grid kernel owns
    # the wall shapes below.  Pin the grid kernel explicitly anyway.
    fa._FORCE_DYNAMIC = False
    check_equal(1024, 128, True, (512, 512))
    check_equal(777, 128, False, (512, 512))   # kv_pad guard path

    for (n, d, causal) in ((4096, 128, True), (2048, 256, True),
                           (4096, 64, True), (4096 + 128, 128, False)):
        for blocks in ((1024, 1024), (512, 512), (512, 1024),
                       (256, 512)):
            if blocks[0] > n or blocks[1] > n:
                continue
            r = run(n, d, causal, blocks)
            tag = f"N={n} D={d} causal={causal} bq,bkv={blocks}"
            print(f"{tag:46s} dual {100*r['dual']:5.1f}%  "
                  f"single {100*r['single']:5.1f}%", flush=True)
    fa._FORCE_DYNAMIC = None
