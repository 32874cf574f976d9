"""Where does the engine's decode step time go? (r02 chip probe)

The r02 bench printed engine burst at ~460 tok/s wall (4L d2048 b=4,
k=16), i.e. ~8.7 ms per in-jit step — far above what the shape's FLOPs
justify. Decompose on hardware:

  raw-burst      jit(lax.scan(paged_decode_step, k)) — the model step
                 alone, floor amortized over k
  engine-burst   eng.step_burst(k) wall (adds sampling, logprob skip,
                 stop scan, host bookkeeping)
  raw-burst-q    quantized (INT8 pages) step scan
  lm-head        the [b, d] x [d, vocab] logits GEMM alone
  attn-only      paged_attention for the same pools/tables
  mlp-only       one transformer layer without attention

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/engine_step_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

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


# --- raw burst: scan of paged_decode_step ---------------------------
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


toks, cache2 = raw_burst(params, token, cache)   # compile
t = wall(raw_burst, params, token, cache)
print(f"raw-burst    k={K}: {t*1e3:7.2f} ms wall "
      f"({(t-floor)/K*1e3:6.2f} ms/step after floor)", flush=True)

# --- engine burst ----------------------------------------------------
eng = ServingEngine(params, cfg, max_batch=batch, num_pages=128,
                    max_seq=1024)
for i in range(batch):
    eng.submit(prompts[i], 900)
for _ in range(batch + 2):
    eng.step()
eng.step_burst(K)                                # compile
best = float("inf")
for _ in range(ROUNDS):
    t0 = time.perf_counter()
    n = len(eng.step_burst(K))
    best = min(best, time.perf_counter() - t0)
print(f"engine-burst k={K}: {best*1e3:7.2f} ms wall "
      f"({(best-floor)/K*1e3:6.2f} ms/step after floor, "
      f"{n} toks/round)", flush=True)

# --- engine single-step (what bench_engine 'raw' loop competes with) -
best = float("inf")
for _ in range(8):
    t0 = time.perf_counter()
    eng.step()
    best = min(best, time.perf_counter() - t0)
print(f"engine-step      : {best*1e3:7.2f} ms wall/step", flush=True)

# --- lm head / layer decomposition -----------------------------------
x = jnp.asarray(rng.standard_normal((batch, cfg.dim)), jnp.bfloat16)
w = params["output"] if "output" in params else None
print("# params keys:", list(params.keys())[:8], flush=True)


# --- quantized burst --------------------------------------------------
engq = ServingEngine(params, cfg, max_batch=batch, num_pages=128,
                     max_seq=1024,
                     kv_precision=__import__(
                         "metal_flash_attention_tpu.descriptors.precision",
                         fromlist=["OperandPrecision"],
                     ).OperandPrecision.INT8)
for i in range(batch):
    engq.submit(prompts[i], 900)
for _ in range(batch + 2):
    engq.step()
best = float("inf")
for _ in range(8):
    t0 = time.perf_counter()
    engq.step()
    best = min(best, time.perf_counter() - t0)
print(f"engine-step INT8 : {best*1e3:7.2f} ms wall/step", flush=True)
engq.step_burst(K)
best = float("inf")
for _ in range(8):
    t0 = time.perf_counter()
    engq.step_burst(K)
    best = min(best, time.perf_counter() - t0)
print(f"engine-burst INT8: {best*1e3:7.2f} ms wall "
      f"({(best-floor)/K*1e3:6.2f} ms/step after floor)", flush=True)
