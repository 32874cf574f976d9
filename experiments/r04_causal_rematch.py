"""Causal rematch after the full-lane broadcast fix (r04).

The per-step plateau was the Mosaic lowering of [bq, 1] slice
broadcasts (r04_perstep_ablation.py); with jnp.tile'd residuals the
(512, 512) body runs at ~70% non-causal — above jax-flash's 64.9%.
This probe re-fights the three causal walls with small blocks enabled,
against same-session tuned jax-flash.
"""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from metal_flash_attention_tpu.ops.flash_attention import flash_attention
from metal_flash_attention_tpu.ops.reference import attention_reference
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


def measure(fn, n, d, causal):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, HEADS, n, d)), jnp.bfloat16)
    gi = ctx.attention_ginstrs(n, d, heads=HEADS, causal=causal)
    est = gi / (0.5 * ROOF)
    iters = int(np.clip(0.3 / max(est / 1e9, 1e-9), 128, 4096))
    secs = time_scalar_fn(fn, (q, k, v), iters=iters,
                          dispatch_floor=floor)
    return gi / secs / 1e9 / ROOF


def ours(blocks, causal):
    def fn(q, k, v):
        o = flash_attention(q, k, v, causal=causal, block_q=blocks[0],
                            block_kv=blocks[1])
        return o[0, 0, 0, :1].astype(jnp.float32).sum()
    return fn


def jf(blocks, causal, d):
    from jax.experimental.pallas.ops.tpu import flash_attention as jfa
    bs = jfa.BlockSizes(block_q=blocks[0], block_k_major=blocks[1],
                        block_k=blocks[1], block_b=1)

    def fn(q, k, v):
        o = jfa.flash_attention(q, k, v, causal=causal,
                                sm_scale=1.0 / math.sqrt(d),
                                block_sizes=bs)
        return o[0, 0, 0, :1].astype(jnp.float32).sum()
    return fn


def correctness():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((1, 2, 1024, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 1024, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 1024, 128)), jnp.bfloat16)
    o = flash_attention(q, k, v, causal=True, block_q=512, block_kv=512)
    ref = jax.vmap(jax.vmap(functools.partial(
        attention_reference, causal=True)))(q, k, v)
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref)))
    print(f"# tiled-bcast causal (512,512) max err vs golden: {err:.3e}",
          flush=True)
    assert err < 3e-2


if __name__ == "__main__":
    correctness()
    shapes = ((4096, 128, True), (2048, 256, True), (4096, 64, True),
              (4096, 128, False))
    for n, d, causal in shapes:
        rows = []
        for blocks in ((512, 512), (1024, 512), (512, 1024),
                       (1024, 1024)):
            try:
                u = measure(ours(blocks, causal), n, d, causal)
                rows.append(f"ours{blocks}: {100*u:5.1f}%")
            except Exception as e:
                rows.append(f"ours{blocks}: FAIL {type(e).__name__}")
        for blocks in ((512, 512), (1024, 1024)):
            try:
                u = measure(jf(blocks, causal, d), n, d, causal)
                rows.append(f"jf{blocks}: {100*u:5.1f}%")
            except Exception as e:
                rows.append(f"jf{blocks}: FAIL {type(e).__name__}")
        tag = f"N={n} D={d} {'causal' if causal else 'fwd'}"
        print(f"{tag:24s} " + "  ".join(rows), flush=True)
