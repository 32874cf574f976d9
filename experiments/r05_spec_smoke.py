"""r05: tiny on-chip smoke of the in-jit speculative burst — prints
per-phase wall times so a hang can be localized (compile vs loop)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from metal_flash_attention_tpu.models import llama, serving

cfg = llama.LlamaConfig.tiny(n_layers=2)
params = llama.init_params(jax.random.PRNGKey(0), cfg)
prompt = jnp.asarray(
    np.random.default_rng(0).integers(1, cfg.vocab_size, (2, 16)),
    jnp.int32)

t0 = time.perf_counter()
out = serving.speculative_generate_model(
    params, prompt, cfg, draft_params=params, draft_cfg=cfg,
    draft_len=3, max_new_tokens=12, rounds_per_dispatch=2)
print(f"tiny burst done in {time.perf_counter() - t0:.1f}s "
      f"out={out.shape}", flush=True)

ref = serving.paged_generate(params, prompt, cfg, max_new_tokens=12)
print("matches paged greedy:", out.tolist() == ref.tolist(), flush=True)

# Bench-sized model, ONE burst dispatch timed.
cfg2 = llama.LlamaConfig(vocab_size=32000, dim=2048, n_layers=4,
                         n_heads=16, n_kv_heads=4, hidden_dim=5632)
params2 = llama.init_params(jax.random.PRNGKey(0), cfg2)
prompt2 = jnp.asarray(
    np.random.default_rng(0).integers(1, cfg2.vocab_size, (4, 128)),
    jnp.int32)
t0 = time.perf_counter()
out2 = serving.speculative_generate_model(
    params2, prompt2, cfg2, draft_params=params2, draft_cfg=cfg2,
    draft_len=4, max_new_tokens=16, rounds_per_dispatch=4)
t1 = time.perf_counter() - t0
print(f"bench-model burst (16 new): {t1:.1f}s incl compile", flush=True)
t0 = time.perf_counter()
out2 = serving.speculative_generate_model(
    params2, prompt2, cfg2, draft_params=params2, draft_cfg=cfg2,
    draft_len=4, max_new_tokens=16, rounds_per_dispatch=4)
t1 = time.perf_counter() - t0
print(f"bench-model burst warm: {t1:.2f}s -> "
      f"{4 * 16 / t1:,.0f} tok/s", flush=True)
