"""r05: why is paged INT8 decode 0.68x of dense INT8 (29.8k vs 43.8k
tok/s) while paged bf16 is 0.89x of dense?  Sweep pages_per_chunk and
page-table order to separate per-DMA fixed cost from in-kernel work."""

import numpy as np
import jax
import jax.numpy as jnp

from metal_flash_attention_tpu.descriptors.precision import OperandPrecision
from metal_flash_attention_tpu.ops.paged_attention import (
    PagedKVCache,
    paged_decode,
    quantize_paged,
)
from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor,
    time_scalar_fn,
)

floor = measure_dispatch_floor()
print(f"floor {floor * 1e3:.1f} ms", flush=True)

rng = np.random.default_rng(0)
batch, qh, kvh, d, s, ps = 8, 32, 8, 128, 8192, 128
pages_per_seq = s // ps
num_pages = batch * pages_per_seq
q = jnp.asarray(rng.standard_normal((batch, qh, d)), jnp.bfloat16)
kp = jnp.asarray(rng.standard_normal((num_pages, kvh, ps, d)),
                 jnp.bfloat16)
vp = jnp.asarray(rng.standard_normal((num_pages, kvh, ps, d)),
                 jnp.bfloat16)
lens = jnp.full((batch,), s, jnp.int32)

seq_table = jnp.arange(num_pages, dtype=jnp.int32).reshape(
    batch, pages_per_seq)
perm = rng.permutation(num_pages).astype(np.int32)
shuf_table = jnp.asarray(perm).reshape(batch, pages_per_seq)

for name, table in (("sequential", seq_table), ("shuffled", shuf_table)):
    cache = PagedKVCache(kp, vp, table, lens)
    qcache = quantize_paged(cache, OperandPrecision.INT8)
    for prec, c in (("bf16", cache), ("int8", qcache)):
        gs = (8, 16, 32, 64) if prec == "int8" else (8, 16, 32)
        for g in gs:
            def one(q, c=c, g=g):
                o = paged_decode(q, c, pages_per_chunk=g)
                return o[0, 0, :1].astype(jnp.float32).sum()
            try:
                secs = time_scalar_fn(one, (q,), iters=512,
                                      dispatch_floor=floor)
                print(f"{name:10s} {prec:5s} G={g:3d}: "
                      f"{batch / secs:9,.0f} tok/s", flush=True)
            except Exception as e:
                print(f"{name:10s} {prec:5s} G={g:3d}: FAIL "
                      f"{type(e).__name__}", flush=True)
