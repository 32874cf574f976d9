"""Per-grid-step fixed-cost ablation (VERDICT r3 next #1, continued).

Facts so far (r04, same session): our fwd kernel reads 78.7% at
(1024, 2048) but 70.0% at (1024, 1024) and ~30% at (512, 512) — while
a tuned jax-flash read 53.9% CAUSAL at (512, 512) in r03 (i.e. its
per-step cost is far lower).  The lean-body toggle (dual vs single)
and pipeline-half width have been measured and are NOT the cause.

This probe isolates the per-step cost structurally:
  1. ours, production kernel
  2. jax-flash, same blocks (same-session yardstick)
  3. a MINIMAL skeleton kernel (same grid/scratch/blockspec shape as
     ours, body = dot + online softmax + acc, no masks, no residual
     output, no prescale, no options) — if the skeleton is as slow as
     production, the cost is structural (grid/pipeline), not feature
     creep; if it matches jax-flash, binary-search the features.

All non-causal N=4096 D=128 h8 (the simplest path — the same cliff
exists there, so causal complexity is excluded by design).
"""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_tpu.ops.flash_attention import flash_attention
from metal_flash_attention_tpu.runtime.context import DeviceContext
from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor,
    time_scalar_fn,
)

ctx = DeviceContext.get()
ROOF = ctx.roofline_ginstrs_per_s
floor = measure_dispatch_floor()
print(f"# roofline {ROOF:.0f}, floor {floor*1e3:.1f} ms", flush=True)

N, D, HEADS = 4096, 128, 8
LOG2E = math.log2(math.e)


def make_skeleton(block_q, block_kv, *, store_l=False, prescale=True,
                  defer_norm=True, tile_m=False, gridspec=False,
                  tile_alpha=False):
    nq, nkv = N // block_q, N // block_kv
    scale = 1.0 / math.sqrt(D)

    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0, 0]
        if prescale:
            q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
        s = jax.lax.dot_general(
            q, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        if not prescale:
            s = s * (scale * LOG2E)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_next)
        if tile_m:
            # jax-flash style: materialize m as full-lane tiles and
            # subtract the tiled matrix (no 1-lane slice broadcast).
            p = jnp.exp2(s - jnp.tile(m_next, (1, block_kv // 128)))
        else:
            p = jnp.exp2(s - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        if defer_norm:
            if tile_alpha:
                acc_scr[...] = (acc_scr[...]
                                * jnp.tile(alpha, (1, D // 128)) + pv)
            else:
                acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv
        elif False:
            pass
        else:
            l_new = l_scr[...]
            inv = jnp.where(l_new == 0.0, 1.0, 1.0 / l_new)
            acc_scr[...] = (acc_scr[...] * (alpha * l_prev * inv)[:, :1]
                            + pv * inv[:, :1])

        @pl.when(j == nkv - 1)
        def _store():
            acc = acc_scr[...]
            if defer_norm:
                l_final = l_scr[:, :1]
                acc = acc / jnp.where(l_final == 0.0, 1.0, l_final)
            o_ref[0, 0] = acc.astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D),
                     lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_kv, D),
                     lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_kv, D),
                     lambda b, h, i, j: (b, h, j, 0)),
    ]
    out_specs = pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, i, j: (b, h, i, 0))
    scratch = [
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, D), jnp.float32),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel",
                             "arbitrary"))
    kwargs = dict(out_shape=jax.ShapeDtypeStruct((1, HEADS, N, D),
                                                 jnp.bfloat16),
                  compiler_params=params)
    if gridspec:
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(1, HEADS, nq, nkv),
                in_specs=in_specs, out_specs=[out_specs],
                scratch_shapes=scratch),
            out_shape=[jax.ShapeDtypeStruct((1, HEADS, N, D),
                                            jnp.bfloat16)],
            compiler_params=params)
    else:
        call = pl.pallas_call(
            kernel, grid=(1, HEADS, nq, nkv), in_specs=in_specs,
            out_specs=out_specs, scratch_shapes=scratch, **kwargs)

    def fn(q, k, v):
        o = call(q, k, v)
        if gridspec:
            o = o[0]
        return o[0, 0, 0, :1].astype(jnp.float32).sum()

    return fn


def ours_fn(blocks):
    def fn(q, k, v):
        o = flash_attention(q, k, v, block_q=blocks[0],
                            block_kv=blocks[1])
        return o[0, 0, 0, :1].astype(jnp.float32).sum()
    return fn


def jf_fn(blocks):
    from jax.experimental.pallas.ops.tpu import flash_attention as jf
    bs = jf.BlockSizes(block_q=blocks[0], block_k_major=blocks[1],
                       block_k=blocks[1], block_b=1)

    def fn(q, k, v):
        o = jf.flash_attention(q, k, v, causal=False,
                               sm_scale=1.0 / math.sqrt(D),
                               block_sizes=bs)
        return o[0, 0, 0, :1].astype(jnp.float32).sum()
    return fn


def measure(fn):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, HEADS, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, HEADS, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, HEADS, N, D)), jnp.bfloat16)
    gi = ctx.attention_ginstrs(N, D, heads=HEADS)
    est = gi / (0.5 * ROOF)
    iters = int(np.clip(0.3 / max(est / 1e9, 1e-9), 128, 4096))
    secs = time_scalar_fn(fn, (q, k, v), iters=iters,
                          dispatch_floor=floor)
    return gi / secs / 1e9 / ROOF


if __name__ == "__main__":
    for blocks in ((512, 512), (1024, 1024), (1024, 2048)):
        rows = [
            ("tile-m", make_skeleton(*blocks, tile_m=True)),
            ("tile-m+a", make_skeleton(*blocks, tile_m=True,
                                       tile_alpha=True)),
            ("tile-m+a+spec", make_skeleton(*blocks, tile_m=True,
                                            tile_alpha=True,
                                            gridspec=True)),
            ("tile-m+a nopre", make_skeleton(*blocks, tile_m=True,
                                             tile_alpha=True,
                                             prescale=False)),
        ]
        out = []
        for name, fn in rows:
            try:
                out.append(f"{name}: {100*measure(fn):5.1f}%")
            except Exception as e:
                out.append(f"{name}: FAIL {type(e).__name__}")
        print(f"{blocks}: " + "  ".join(out), flush=True)
