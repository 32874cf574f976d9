"""Quantized paged serving: full pages quantized in-jit at the page
boundary (masked flush), bf16 tail, logsumexp partial merge.  Logits
must track the bf16 paged path within the INT8/FP8 KV tolerance at
EVERY decode step — a wrong flush (bad page id, bad mask, bad scale)
diverges wildly right after the first page boundary."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.descriptors.precision import OperandPrecision
from metal_flash_attention_tpu.models import llama, serving


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(31)
    prompt = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (2, 40)), jnp.int32)
    return cfg, params, prompt


def _bf16_steps(cfg, params, prompt, page, n_steps):
    """Greedy bf16 paged loop, returning per-step logits + tokens."""
    b, s = prompt.shape
    cache = serving.init_paged_model_cache(cfg, b, s + n_steps + 1,
                                           page_size=page)
    chunk = jax.jit(serving.paged_chunk_step, static_argnames=("cfg",))
    for i in range(0, s, page):
        logits, cache = chunk(params, prompt[:, i:i + page], cfg,
                              cache)
    step = jax.jit(serving.paged_decode_step, static_argnames=("cfg",))
    out = [np.asarray(logits[:, -1])]
    token = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    toks = [np.asarray(token)]
    for _ in range(n_steps - 1):
        logits, cache = step(params, token, cfg, cache)
        out.append(np.asarray(logits))
        token = jnp.argmax(logits, -1).astype(jnp.int32)
        toks.append(np.asarray(token))
    return out, toks


@pytest.mark.parametrize("precision,tol", [
    (OperandPrecision.INT8, 0.5),
    (OperandPrecision.FP8_E4M3, 0.8),
])
def test_quantized_paged_tracks_bf16(setup, precision, tol):
    """40-token prompt at page=16 (2 flushed pages + 8-token tail),
    then 20 greedy decode steps — the tail fills and flushes at
    least twice.  Every step's logits stay inside the quantization
    tolerance of the bf16 path when fed the SAME token stream."""
    cfg, params, prompt = setup
    page, n_steps = 16, 20
    ref_logits, ref_toks = _bf16_steps(cfg, params, prompt, page,
                                       n_steps)

    b, s = prompt.shape
    cache = serving.init_quantized_paged_model_cache(
        cfg, b, s + n_steps + 1, precision=precision, page_size=page)
    chunk = jax.jit(serving.paged_chunk_step_q,
                    static_argnames=("cfg",))
    for i in range(0, s, page):
        logits, cache = chunk(params, prompt[:, i:i + page], cfg,
                              cache)
    assert cache.full_len.tolist() == [32, 32]
    assert cache.tail_len.tolist() == [8, 8]

    err = float(np.max(np.abs(np.asarray(logits[:, -1])
                              - ref_logits[0])))
    assert err < tol, f"prefill logits diverged: {err}"

    # Decode with the REFERENCE token stream so trajectories stay
    # comparable even if one argmax flips inside the tolerance band.
    step = jax.jit(serving.paged_decode_step_q,
                   static_argnames=("cfg",))
    for t in range(1, n_steps):
        logits, cache = step(params, jnp.asarray(ref_toks[t - 1]),
                             cfg, cache)
        err = float(np.max(np.abs(np.asarray(logits)
                                  - ref_logits[t])))
        assert err < tol, f"step {t} diverged: {err} " \
            f"(full={cache.full_len.tolist()}, " \
            f"tail={cache.tail_len.tolist()})"
    # Crossed the 48-token boundary: pages flushed during decode.
    assert cache.full_len.tolist() == [48, 48]
    lengths = int(cache.full_len[0] + cache.tail_len[0])
    assert lengths == s + n_steps - 1


def test_quantized_paged_generate_runs(setup):
    """End-to-end generate: finite, prompt echoed, page accounting
    consistent, and the first generated token matches bf16 greedy
    (prefill logit gaps far exceed the INT8 shift for this model)."""
    cfg, params, prompt = setup
    out = serving.paged_generate_quantized(
        params, prompt, cfg, max_new_tokens=6,
        precision=OperandPrecision.INT8, page_size=16)
    assert out.shape == (2, 46)
    assert out[:, :40].tolist() == prompt.tolist()
    ref = serving.paged_generate(params, prompt, cfg,
                                 max_new_tokens=6, page_size=16)
    assert out[:, 40].tolist() == np.asarray(ref)[:, 40].tolist()
