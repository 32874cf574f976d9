"""r05: sink_decode vs full decode at the bench config (VERDICT r4
next #4 — sink shipped at 0.6x of FULL; target >= 2.5x after the
sliced-sink + span-limited-window redesign)."""

import numpy as np
import jax
import jax.numpy as jnp

from metal_flash_attention_tpu.models.serving import sink_decode
from metal_flash_attention_tpu.ops.flash_decode import flash_decode
from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor,
    time_scalar_fn,
)

floor = measure_dispatch_floor()
print(f"floor {floor * 1e3:.1f} ms")

rng = np.random.default_rng(0)
batch, qh, kvh, d, s = 8, 32, 8, 128, 8192
window, sink = 1024, 4
q = jnp.asarray(rng.standard_normal((batch, qh, d)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.bfloat16)
lens = jnp.full((batch,), s, jnp.int32)


def one_full(q, k, v):
    o = flash_decode(q, k, v, kv_lens=lens)
    return o[0, 0, :1].astype(jnp.float32).sum()


full_s = time_scalar_fn(one_full, (q, k, v), iters=256,
                        dispatch_floor=floor)
print(f"full:  {batch / full_s:,.0f} tok/s")

for blk in (256, 512, 1024):
    def one_sink(q, k, v, blk=blk):
        o_s, lse_s = flash_decode(
            q, jax.lax.slice_in_dim(k, 0, 128, axis=2),
            jax.lax.slice_in_dim(v, 0, 128, axis=2),
            kv_lens=jnp.minimum(lens, sink), return_residuals=True,
            block_kv=128)
        starts = jnp.maximum(lens - window, sink)
        o_w, lse_w = flash_decode(q, k, v, kv_lens=lens,
                                  kv_starts=starts, max_span=window,
                                  block_kv=blk, return_residuals=True)
        from metal_flash_attention_tpu.models.serving import (
            _merge_partials,
        )
        o = _merge_partials(o_s.astype(jnp.float32), lse_s,
                            o_w.astype(jnp.float32), lse_w)
        return o[0, 0, :1].sum()

    sink_s = time_scalar_fn(one_sink, (q, k, v), iters=1024,
                            dispatch_floor=floor)
    print(f"sink blk={blk}: {batch / sink_s:,.0f} tok/s "
          f"({full_s / sink_s:.2f}x full)")


# The shipped path (default window-partial block choice).
def one_ship(q, k, v):
    o = sink_decode(q, k, v, lens, window=window, sink=sink)
    return o[0, 0, :1].astype(jnp.float32).sum()


ship_s = time_scalar_fn(one_ship, (q, k, v), iters=1024,
                        dispatch_floor=floor)
print(f"sink shipped: {batch / ship_s:,.0f} tok/s "
      f"({full_s / ship_s:.2f}x full)")
