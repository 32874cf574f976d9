"""Per-block fixed-cost hunt, round 4 (VERDICT r3 next #1).

The lean-body matrix (causal_lean_probe) REFUTED body duplication as
the per-block cost: single vs dual tied everywhere.  The telling datum
instead: non-causal (1024, 1024) reads 45.5% where (1024, 2048) reads
78% — and PIPELINE_HALF = 1024 means blocks at bkv <= 1024 run with
num_halves = 1, i.e. NO MXU/VPU overlap.  The "512-wide halves
regress" note was measured at bkv = 2048 (4 halves); nobody measured
2 halves of 512 at bkv = 1024, which is exactly what mid-N causal
(winner (1024, 1024)) needs.

Matrix: PIPELINE_HALF in {256, 512, 1024} x blocks in {(1024, 1024),
(512, 512), (1024, 512)} at the causal wall shapes + the non-causal
control, plus a (1024, 2048) x {512, 1024} sanity row (the tuned fwd
config must not regress).
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


def run(n, d, causal, blocks, half):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)

    def fn(q, k, v):
        o = fa.flash_attention(q, k, v, causal=causal,
                               block_q=blocks[0], block_kv=blocks[1])
        return o[0, 0, 0, :1].astype(jnp.float32).sum()

    gi = ctx.attention_ginstrs(n, d, heads=HEADS, causal=causal)
    est = gi / (0.5 * ROOF)
    iters = int(np.clip(0.3 / max(est / 1e9, 1e-9), 128, 4096))
    prev = fa.PIPELINE_HALF
    fa.PIPELINE_HALF = half
    fa.flash_attention.clear_cache()
    try:
        util = gi / time_scalar_fn(fn, (q, k, v), iters=iters,
                                   dispatch_floor=floor) / 1e9 / ROOF
    finally:
        fa.PIPELINE_HALF = prev
        fa.flash_attention.clear_cache()
    return util


def check_equal(half):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 1024, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 1024, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 1024, 128)), jnp.bfloat16)
    outs = {}
    for h in (1024, half):
        prev = fa.PIPELINE_HALF
        fa.PIPELINE_HALF = h
        fa.flash_attention.clear_cache()
        try:
            outs[h] = np.asarray(fa.flash_attention(
                q, k, v, causal=True, block_q=512,
                block_kv=1024).astype(jnp.float32))
        finally:
            fa.PIPELINE_HALF = prev
            fa.flash_attention.clear_cache()
    err = np.max(np.abs(outs[1024] - outs[half]))
    print(f"  half={half} vs 1024 max err: {err:.2e}", flush=True)
    # Half splitting reorders the online-softmax m/l updates, so bf16
    # outputs drift at rounding level — not bitwise-equal by design.
    assert err < 2e-2


if __name__ == "__main__":
    check_equal(512)
    check_equal(256)
    cases = [
        (4096, 128, True, (1024, 1024)),
        (4096, 128, False, (1024, 1024)),
        (2048, 256, True, (1024, 1024)),
        (4096, 64, True, (1024, 1024)),
        (4096, 128, True, (512, 512)),
        (4096, 128, True, (1024, 512)),
        (4096, 128, False, (1024, 2048)),
        (4096, 128, True, (1024, 2048)),
    ]
    for n, d, causal, blocks in cases:
        halves = [h for h in (256, 512, 1024)
                  if h <= blocks[1]]
        row = []
        for h in halves:
            try:
                u = run(n, d, causal, blocks, h)
                row.append(f"half={h}: {100*u:5.1f}%")
            except Exception as e:
                row.append(f"half={h}: FAIL {type(e).__name__}")
        tag = f"N={n} D={d} causal={causal} {blocks}"
        print(f"{tag:42s} " + "  ".join(row), flush=True)
