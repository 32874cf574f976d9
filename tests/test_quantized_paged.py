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
    (OperandPrecision.NF4, 1.6),
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


def test_engine_quantized_kv_matches_standalone(setup):
    """ServingEngine(kv_precision=INT8) at max_batch=1 reproduces the
    standalone paged_generate_quantized stream bitwise — same batch
    shape, so the whole flush/view/copyback bookkeeping is exercised
    with a bit-exact oracle.  (Across DIFFERENT batch shapes XLA fuses
    the jnp-level quantized step differently and reassociates at bf16
    scale, so cross-batch bitwise equality is deliberately not part of
    the quantized contract — unlike the Pallas-kernel-dominated bf16
    path.  The cross-slot contract is composition invariance, next
    test.)"""
    from metal_flash_attention_tpu.models.engine import ServingEngine

    cfg, params, _ = setup
    rng = np.random.default_rng(33)
    page = 16
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (40, 21)]
    max_new = [12, 9]
    refs = [serving.paged_generate_quantized(
        params, jnp.asarray(p[None]), cfg, max_new_tokens=m,
        precision=OperandPrecision.INT8, page_size=page)[0]
        for p, m in zip(prompts, max_new)]

    eng = ServingEngine(params, cfg, max_batch=1, num_pages=32,
                        page_size=page, max_seq=128,
                        kv_precision=OperandPrecision.INT8)
    rids = [eng.submit(p, m) for p, m in zip(prompts, max_new)]
    steps = 0
    while not eng.idle:
        eng.step()
        steps += 1
        assert steps < 120
    for rid, ref in zip(rids, refs):
        assert eng.result(rid).tolist() == np.asarray(ref).tolist(), rid
    assert eng.alloc.free_pages == 32 - 1


def test_engine_quantized_kv_batch_composition_invariant(setup):
    """At a fixed max_batch the quantized engine is batch-composition
    invariant: a request's stream is identical whether it runs alone
    (companion slot riding along frozen) or alongside a staggered
    second request — the in-jit active-mask freeze keeps ride-along
    rows from perturbing anything."""
    from metal_flash_attention_tpu.models.engine import ServingEngine

    cfg, params, _ = setup
    rng = np.random.default_rng(35)
    page = 16
    p_main = rng.integers(0, cfg.vocab_size, (40,)).astype(np.int32)
    p_side = rng.integers(0, cfg.vocab_size, (21,)).astype(np.int32)

    def run(with_side):
        eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                            page_size=page, max_seq=128,
                            kv_precision=OperandPrecision.INT8)
        rid = eng.submit(p_main, 12)
        if with_side:
            rid_s = eng.submit(p_side, 9)
        steps = 0
        while not eng.idle:
            eng.step()
            steps += 1
            assert steps < 80
        return eng.result(rid).tolist()

    assert run(False) == run(True)


def test_engine_quantized_kv_with_prefix_cache(setup):
    """Quantized KV + automatic prefix caching compose: per-page
    scales keep quantized pages shareable, so a repeated prompt
    borrows them and still reproduces the first run bitwise."""
    from metal_flash_attention_tpu.models.engine import ServingEngine

    cfg, params, _ = setup
    rng = np.random.default_rng(34)
    page = 16
    prompt = rng.integers(0, cfg.vocab_size, (40,)).astype(np.int32)

    eng = ServingEngine(params, cfg, max_batch=1, num_pages=32,
                        page_size=page, max_seq=128,
                        kv_precision=OperandPrecision.INT8,
                        prefix_cache=True)

    def run():
        rid = eng.submit(prompt, 8)
        steps = 0
        while not eng.idle:
            eng.step()
            steps += 1
            assert steps < 60
        return eng.result(rid).tolist(), steps

    out1, steps1 = run()
    out2, steps2 = run()
    assert out2 == out1
    assert eng.prefix_cache.hit_tokens == 32   # 2 quantized pages hit
    assert steps2 < steps1


def test_engine_quantized_burst_matches_single_step(setup):
    """Quantized burst (scan over paged_decode_step_q with the
    live-row mask in the carry) reproduces single-step streams —
    flushes land mid-burst exactly as across single steps."""
    from metal_flash_attention_tpu.models.engine import ServingEngine

    cfg, params, _ = setup
    rng = np.random.default_rng(71)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (20, 9)]

    def run(burst):
        eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                            page_size=16, max_seq=128,
                            kv_precision=OperandPrecision.INT8,
                            admissions_per_step=2)
        rids = [eng.submit(p, 10) for p in prompts]
        steps = 0
        while not eng.idle:
            (eng.step_burst(4) if burst else eng.step())
            steps += 1
            assert steps < 80
        return [eng.result(r).tolist() for r in rids]

    assert run(True) == run(False)
