"""Where does the engine's decode step time go? (r03 chip probe)

BENCH_r02 showed the int8-KV engine step ~45 ms slower than bf16 while
raw int8 decode is 2x faster than bf16 — the regression is in the
serving path (VERDICT r2 weak #2).  Decompose on hardware:

  raw-burst        jit(lax.scan(paged_decode_step, k)) — bf16 model
                   step alone, floor amortized over k
  raw-burst-q      quantized (INT8 pages + bf16 tail) step scan
  raw-burst-q-nf   same but with the page flush stubbed out — isolates
                   the per-step masked quantize+scatter cost
  flush-only       jit(_flush_full_pages) alone
  attn-q / attn-bf one layer's paged_decode partial on the quantized
                   pool vs the bf16 pool (+ the tail flash_decode)
  lm-head          the [b, d] x [d, vocab] logits GEMM alone
  engine-burst     eng.step_burst(k) wall, bf16 vs INT8

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/engine_step_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from metal_flash_attention_tpu.descriptors.precision import OperandPrecision
from metal_flash_attention_tpu.models import llama, serving
from metal_flash_attention_tpu.models.engine import ServingEngine
from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor,
)

floor = measure_dispatch_floor()
print(f"# floor {floor*1e3:.1f} ms", flush=True)

cfg = llama.LlamaConfig(vocab_size=32000, dim=2048, n_layers=4,
                        n_heads=16, n_kv_heads=4, hidden_dim=5632)
params = llama.init_params(jax.random.PRNGKey(0), cfg)
batch, prompt_len = 4, 128
rng = np.random.default_rng(0)
prompts = rng.integers(1, cfg.vocab_size, (batch, prompt_len))

K = 16
ROUNDS = 16


def wall(fn, *args):
    """Best-of-3 wall time of fn(*args) with a blocking readback."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


# --- raw burst: scan of paged_decode_step (bf16) ---------------------
cache = serving.init_paged_model_cache(cfg, batch, 1024)
chunk = jax.jit(serving.paged_chunk_step, static_argnames=("cfg",))
logits, cache = chunk(params, jnp.asarray(prompts, jnp.int32), cfg, cache)
token = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)


@jax.jit
def raw_burst(params, token, cache):
    def body(carry, _):
        tok, cache = carry
        logits, cache = serving.paged_decode_step(params, tok, cfg, cache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return (tok, cache), tok
    (tok, cache), toks = jax.lax.scan(
        body, (token, cache), None, length=K)
    return toks, cache


raw_burst(params, token, cache)   # compile
t = wall(raw_burst, params, token, cache)
print(f"raw-burst       k={K}: {t*1e3:7.2f} ms wall "
      f"({(t-floor)/K*1e3:6.2f} ms/step after floor)", flush=True)

# --- raw burst over the QUANTIZED cache ------------------------------
qcache = serving.init_quantized_paged_model_cache(
    cfg, batch, 1024, precision=OperandPrecision.INT8)
chunk_q = jax.jit(serving.paged_chunk_step_q, static_argnames=("cfg",))
logits_q, qcache = chunk_q(params, jnp.asarray(prompts, jnp.int32),
                           cfg, qcache)
token_q = jnp.argmax(logits_q[:, -1], -1).astype(jnp.int32)


@jax.jit
def raw_burst_q(params, token, qc):
    def body(carry, _):
        tok, qc = carry
        logits, qc = serving.paged_decode_step_q(params, tok, cfg, qc)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return (tok, qc), tok
    (tok, qc), toks = jax.lax.scan(
        body, (token, qc), None, length=K)
    return toks, qc


raw_burst_q(params, token_q, qcache)
t = wall(raw_burst_q, params, token_q, qcache)
print(f"raw-burst-q     k={K}: {t*1e3:7.2f} ms wall "
      f"({(t-floor)/K*1e3:6.2f} ms/step after floor)", flush=True)


# --- same, flush stubbed out (tails still written) -------------------
@jax.jit
def raw_burst_q_noflush(params, token, qc):
    real_flush = serving._flush_full_pages
    try:
        serving._flush_full_pages = lambda c, tk, tv, added: \
            c._replace(tail_k=tuple(tk), tail_v=tuple(tv),
                       tail_len=jnp.minimum(
                           c.tail_len + added, c.page_size - 1))
        def body(carry, _):
            tok, qc = carry
            logits, qc = serving.paged_decode_step_q(params, tok, cfg, qc)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            return (tok, qc), tok
        (tok, qc), toks = jax.lax.scan(
            body, (token, qc), None, length=K)
    finally:
        serving._flush_full_pages = real_flush
    return toks, qc


raw_burst_q_noflush(params, token_q, qcache)
t = wall(raw_burst_q_noflush, params, token_q, qcache)
print(f"raw-burst-q-nf  k={K}: {t*1e3:7.2f} ms wall "
      f"({(t-floor)/K*1e3:6.2f} ms/step after floor)", flush=True)


# --- flush alone ------------------------------------------------------
@jax.jit
def flush_only(qc):
    out = serving._flush_full_pages(
        qc, qc.tail_k, qc.tail_v,
        jnp.ones((batch,), jnp.int32))
    return out


flush_only(qcache)
t = wall(flush_only, qcache)
print(f"flush-only x1     : {t*1e3:7.2f} ms wall "
      f"({(t-floor)*1e3:6.2f} ms after floor)", flush=True)


# --- per-layer attention partials ------------------------------------
from metal_flash_attention_tpu.ops.paged_attention import paged_decode
from metal_flash_attention_tpu.ops.flash_decode import flash_decode

qv2 = jnp.asarray(rng.standard_normal((batch, cfg.n_heads, cfg.head_dim)),
                  jnp.bfloat16)


@jax.jit
def attn_q(qv2, qc):
    def body(c, _):
        o, lse = paged_decode(qv2 + c, serving._q_layer_cache(qc, 0),
                              return_residuals=True)
        return c * 0 + o[0, 0, 0] * 0, ()
    c, _ = jax.lax.scan(body, jnp.zeros((), jnp.bfloat16), None, length=K)
    return c


@jax.jit
def attn_bf(qv2, cache):
    from metal_flash_attention_tpu.ops.paged_attention import PagedKVCache

    def body(c, _):
        o, lse = paged_decode(
            qv2 + c,
            PagedKVCache(cache.k[0], cache.v[0], cache.page_table,
                         cache.lengths),
            return_residuals=True)
        return c * 0 + o[0, 0, 0] * 0, ()
    c, _ = jax.lax.scan(body, jnp.zeros((), jnp.bfloat16), None, length=K)
    return c


@jax.jit
def attn_tail(qv2, qc):
    def body(c, _):
        o, lse = flash_decode(qv2 + c, qc.tail_k[0], qc.tail_v[0],
                              kv_lens=qc.tail_len + 1,
                              return_residuals=True, block_kv=128)
        return c * 0 + o[0, 0, 0] * 0, ()
    c, _ = jax.lax.scan(body, jnp.zeros((), jnp.bfloat16), None, length=K)
    return c


cache_after = raw_burst(params, token, cache)[1]
for name, fn, arg in (("attn-q   (pool)", attn_q, qcache),
                      ("attn-bf  (pool)", attn_bf, cache_after),
                      ("attn-tail      ", attn_tail, qcache)):
    fn(qv2, arg)
    t = wall(fn, qv2, arg)
    print(f"{name} x{K}: {t*1e3:7.2f} ms wall "
          f"({(t-floor)/K*1e3:6.2f} ms/call after floor)", flush=True)


# --- lm head ----------------------------------------------------------
x = jnp.asarray(rng.standard_normal((batch, cfg.dim)), jnp.bfloat16)
w_head = params["lm_head"]


@jax.jit
def lm_head(x, w):
    def body(c, _):
        lg = (x + c) @ w
        return c * 0 + lg[0, 0].astype(jnp.bfloat16) * 0, ()
    c, _ = jax.lax.scan(body, jnp.zeros((), jnp.bfloat16), None, length=K)
    return c


lm_head(x, w_head)
t = wall(lm_head, x, w_head)
print(f"lm-head     x{K}: {t*1e3:7.2f} ms wall "
      f"({(t-floor)/K*1e3:6.2f} ms/call after floor)", flush=True)


# --- engine bursts ----------------------------------------------------
for prec, tag in ((None, "bf16"), (OperandPrecision.INT8, "INT8")):
    eng = ServingEngine(params, cfg, max_batch=batch, num_pages=128,
                        max_seq=1024, kv_precision=prec)
    for i in range(batch):
        eng.submit(prompts[i], 640)
    for _ in range(batch + 2):
        eng.step()
    eng.step_burst(K)                                # compile
    best = float("inf")
    n = 0
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        n = len(eng.step_burst(K))
        best = min(best, time.perf_counter() - t0)
    print(f"engine-burst {tag} k={K}: {best*1e3:7.2f} ms wall "
          f"({(best-floor)/K*1e3:6.2f} ms/step after floor, "
          f"{n} toks/round)", flush=True)
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        eng.step()
        best = min(best, time.perf_counter() - t0)
    print(f"engine-step  {tag}     : {best*1e3:7.2f} ms wall/step",
          flush=True)
