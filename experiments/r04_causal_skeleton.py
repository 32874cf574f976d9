"""Causal skeleton bisect (r04): a minimal causal kernel with tiled
broadcasts + skip guard + iota mask.  Production reads 50.4% at
(512, 512) D=128 causal where jax-flash reads 54.1; non-causal we BEAT
them (67.4 vs 61.8) — so ~18% of per-visible-step cost appears only
under causal in our kernel.  If this skeleton reads ~54+, the cost is
a production causal feature (dual-when nesting, index-map closures,
L-residual, mask style); if ~50, it is structural and shared.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_tpu.runtime.context import DeviceContext
from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor,
    time_scalar_fn,
)

ctx = DeviceContext.get()
ROOF = ctx.roofline_ginstrs_per_s
floor = measure_dispatch_floor()
print(f"# roofline {ROOF:.0f}, floor {floor*1e3:.1f} ms", flush=True)
N, HEADS = 4096, 8
LOG2E = math.log2(math.e)
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_causal_skel(block_q, block_kv, D, *, mask_every=False,
                     where_mask=True, skip_index=True, store_l=False,
                     prod_idx=False, l_fullwidth=False):
    nq, nkv = N // block_q, N // block_kv
    scale = 1.0 / math.sqrt(D)
    LN2 = math.log(2.0)

    def kernel(q_ref, k_ref, v_ref, o_ref, *rest):
        if store_l:
            l_ref, m_scr, l_scr, acc_scr = rest
        else:
            m_scr, l_scr, acc_scr = rest
        i = pl.program_id(2)
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        should_run = j * block_kv <= (i + 1) * block_q - 1

        @pl.when(should_run)
        def _body():
            q = q_ref[0, 0]
            q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
            s = jax.lax.dot_general(
                q, k_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            interior = (j + 1) * block_kv - 1 <= i * block_q
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            em = (cols - rows) <= (i * block_q - j * block_kv)
            if mask_every:
                s = jnp.where(em, s, MASK_VALUE)
            else:
                masked = jnp.where(em, s, MASK_VALUE)
                s = jnp.where(interior, s, masked)
            if where_mask:
                pass
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_next = jnp.maximum(m_prev,
                                 jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - jnp.tile(m_next, (1, block_kv // 128)))
            l_scr[...] = (alpha * l_prev
                          + jnp.sum(p, axis=1, keepdims=True))
            m_scr[...] = m_next
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, 0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc_scr[...] = (acc_scr[...]
                            * jnp.tile(alpha, (1, D // 128)) + pv)

        @pl.when(j == nkv - 1)
        def _store():
            l_final = l_scr[:, :1]
            acc = acc_scr[...] / jnp.where(l_final == 0.0, 1.0, l_final)
            o_ref[0, 0] = acc.astype(o_ref.dtype)
            if store_l:
                lse2 = jnp.where(
                    l_scr[:, 0] > 0.0,
                    m_scr[:, 0] + jnp.log2(l_scr[:, 0]), -jnp.inf)
                if l_fullwidth:
                    l_ref[0, 0, :, pl.ds(i * block_q, block_q)] = \
                        jnp.broadcast_to((lse2 * LN2)[None, :],
                                         (8, block_q))
                else:
                    l_ref[0, 0] = jnp.broadcast_to(
                        (lse2 * LN2)[None, :], l_ref.shape[2:])

    def kv_index(b, h, i, j):
        if prod_idx:
            # Production-style clamp arithmetic (forward prefetch).
            last = jnp.clip(((i + 1) * block_q - 1) // block_kv,
                            0, nkv - 1)
            jj = jnp.where(j > last, 0, jnp.maximum(j, 0))
            return (b, h, jj, 0)
        if skip_index:
            last = ((i + 1) * block_q - 1) // block_kv
            jj = jnp.where(j > last, 0, j)
            return (b, h, jj, 0)
        return (b, h, j, 0)

    out_specs = pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, i, j: (b, h, i, 0))
    out_shape = jax.ShapeDtypeStruct((1, HEADS, N, D), jnp.bfloat16)
    if store_l:
        if l_fullwidth:
            l_spec = pl.BlockSpec((1, 1, 8, N),
                                  lambda b, h, i, j: (b, h, 0, 0))
        else:
            l_spec = pl.BlockSpec((1, 1, 8, block_q),
                                  lambda b, h, i, j: (b, h, 0, i))
        out_specs = [out_specs, l_spec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((1, HEADS, 8, N),
                                          jnp.float32)]
    call = pl.pallas_call(
        kernel,
        grid=(1, HEADS, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, D), kv_index),
            pl.BlockSpec((1, 1, block_kv, D), kv_index),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )

    def fn(q, k, v):
        o = call(q, k, v)
        if store_l:
            o = o[0]
        return o[0, 0, 0, :1].astype(jnp.float32).sum()

    return fn


def measure(fn, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, HEADS, N, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, HEADS, N, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, HEADS, N, d)), jnp.bfloat16)
    gi = ctx.attention_ginstrs(N, d, heads=HEADS, causal=True)
    est = gi / (0.5 * ROOF)
    iters = int(np.clip(0.3 / max(est / 1e9, 1e-9), 128, 4096))
    secs = time_scalar_fn(fn, (q, k, v), iters=iters,
                          dispatch_floor=floor)
    return gi / secs / 1e9 / ROOF


if __name__ == "__main__":
    D = 128
    for blocks in ((512, 512), (1024, 1024)):
        rows = []
        for name, kw in (("mask-sel", dict(mask_every=False)),
                         ("+L-out", dict(mask_every=False,
                                         store_l=True)),
                         ("+L-fullwidth", dict(mask_every=False,
                                               store_l=True,
                                               l_fullwidth=True))):
            try:
                u = measure(make_causal_skel(*blocks, D, **kw), D)
                rows.append(f"{name}: {100*u:5.1f}%")
            except Exception as e:
                rows.append(f"{name}: FAIL {type(e).__name__}: {e}")
        print(f"{blocks}: " + "  ".join(rows), flush=True)
