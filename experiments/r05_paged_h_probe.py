"""r05: heads_per_chunk sweep — H-wide page descriptors vs the H=1
baseline (see the kernel docstring in ops/paged_attention.py).
Correctness vs dense flash_decode first, then perf."""

import numpy as np
import jax
import jax.numpy as jnp

from metal_flash_attention_tpu.descriptors.precision import OperandPrecision
from metal_flash_attention_tpu.ops.flash_decode import flash_decode
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
perm = rng.permutation(num_pages).astype(np.int32)
table = jnp.asarray(perm).reshape(batch, pages_per_seq)

# Correctness: gather the shuffled pages into a dense cache.
kd = kp[jnp.asarray(perm).reshape(batch, pages_per_seq)]  # [b,pp,kvh,ps,d]
kd = kd.transpose(0, 2, 1, 3, 4).reshape(batch, kvh, s, d)
vd = vp[jnp.asarray(perm).reshape(batch, pages_per_seq)]
vd = vd.transpose(0, 2, 1, 3, 4).reshape(batch, kvh, s, d)
o_ref = flash_decode(q, kd, vd, kv_lens=lens)
cache = PagedKVCache(kp, vp, table, lens)
for h in (1, 2, 4, 8):
    o = paged_decode(q, cache, heads_per_chunk=h)
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                - o_ref.astype(jnp.float32))))
    print(f"bf16 H={h} correctness err vs dense: {err:.4f}", flush=True)
    assert err < 3e-2, err

qcache = quantize_paged(cache, OperandPrecision.INT8)
fcache = quantize_paged(cache, OperandPrecision.FP8_E4M3)

for prec, c in (("bf16", cache), ("int8", qcache), ("fp8", fcache)):
    for h in (1, 2, 4, 8):
        for g in (8, 16, 32):
            def one(q, kpg, vpg, c=c, h=h, g=g):
                cc = c._replace(k_pages=kpg, v_pages=vpg)
                o = paged_decode(q, cc, pages_per_chunk=g,
                                 heads_per_chunk=h)
                return o[0, 0, :1].astype(jnp.float32).sum()
            try:
                secs = time_scalar_fn(one, (q, c.k_pages, c.v_pages),
                                      iters=512, dispatch_floor=floor)
                print(f"{prec:5s} H={h} G={g:3d}: "
                      f"{batch / secs:9,.0f} tok/s", flush=True)
            except Exception as e:
                print(f"{prec:5s} H={h} G={g:3d}: FAIL "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
