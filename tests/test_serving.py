"""Serving loop: prefill + flash_decode generation matches the full
recompute path token for token."""

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
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)),
        jnp.int32)
    return cfg, params, prompt


def reference_greedy(params, prompt, cfg, n_new):
    """Teacher-forced full recompute: argmax over forward(all tokens)."""
    toks = prompt
    for _ in range(n_new):
        logits, _ = llama.forward(params, toks, cfg)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        toks = jnp.concatenate([toks, nxt[:, None]], axis=1)
    return toks


def test_generate_matches_full_recompute(setup):
    cfg, params, prompt = setup
    n_new = 5
    got = serving.generate(params, prompt, cfg, max_new_tokens=n_new,
                           max_seq=64)
    want = reference_greedy(params, prompt, cfg, n_new)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_prefill_logits_match_forward(setup):
    cfg, params, prompt = setup
    cache = serving.init_cache(cfg, prompt.shape[0], 64)
    logits, cache2 = serving.prefill(params, prompt, cfg, cache)
    full, _ = llama.forward(params, prompt, cfg)
    assert float(jnp.max(jnp.abs(logits - full[:, -1]))) < 1e-2
    assert cache2.lengths.tolist() == [16, 16]


def test_quantized_decode_close_to_full(setup):
    cfg, params, prompt = setup
    cache = serving.init_cache(cfg, prompt.shape[0], 64)
    logits, cache = serving.prefill(params, prompt, cfg, cache)
    token = jnp.argmax(logits, -1).astype(jnp.int32)

    lf, cache_f = serving.decode_step(params, token, cfg, cache)
    qcache = serving.quantize_cache(cache, OperandPrecision.INT8,
                                    tail_capacity=16)
    lq, qcache = serving.decode_step_quantized(params, token, cfg, qcache)
    # INT8 cache shifts logits slightly; ranking of the top token
    # should survive and the magnitude gap stay small.
    assert float(jnp.max(jnp.abs(lq - lf))) < 0.5
    lq2, qcache = serving.decode_step_quantized(
        params, jnp.argmax(lq, -1).astype(jnp.int32), cfg, qcache)
    assert bool(jnp.all(jnp.isfinite(lq2)))
    assert qcache.tail_len.tolist() == [2, 2]


def test_sampling_degenerates_to_greedy(setup):
    """temperature=0 and top_k=1 sampling reproduce greedy exactly;
    finite temperature with top_k stays inside the top-k support."""
    cfg, params, prompt = setup
    from metal_flash_attention_tpu.models.serving import (
        generate_sampled,
        sample_token,
    )

    greedy = serving.generate(params, prompt, cfg, max_new_tokens=6)
    g0 = generate_sampled(params, prompt, cfg, max_new_tokens=6,
                          rng=jax.random.PRNGKey(0), temperature=0.0)
    assert g0.tolist() == greedy.tolist()
    g1 = generate_sampled(params, prompt, cfg, max_new_tokens=6,
                          rng=jax.random.PRNGKey(0), top_k=1)
    assert g1.tolist() == greedy.tolist()

    logits = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, cfg.vocab_size)),
        jnp.float32)
    for trial in range(3):
        tok = sample_token(logits, jax.random.PRNGKey(trial),
                           temperature=0.8, top_k=5)
        top5 = jnp.argsort(logits, axis=-1)[:, -5:]
        for b in range(4):
            assert int(tok[b]) in top5[b].tolist()
    # nucleus: top_p ~ 0 keeps only the argmax
    tok = sample_token(logits, jax.random.PRNGKey(9), top_p=1e-6)
    assert tok.tolist() == jnp.argmax(logits, -1).tolist()


def test_sample_token_per_row_semantics():
    """Per-row sampler: greedy rows reproduce argmax, filtered rows
    stay in-support, and filters compose k-THEN-p exactly like
    sample_token (the nucleus mass is computed over the top-k
    survivors, not the raw distribution)."""
    from metal_flash_attention_tpu.models.serving import (
        sample_token,
        sample_token_per_row,
    )

    vocab = 64
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal((4, vocab)), jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4, dtype=jnp.uint32))

    # Row 0 greedy (temp=0), row 1 top_k=1, row 2 top_p~0: all argmax.
    tok = sample_token_per_row(
        logits, keys,
        jnp.asarray([0.0, 0.9, 0.7, 0.8], jnp.float32),
        jnp.asarray([0, 1, 0, 5], jnp.int32),
        jnp.asarray([1.0, 1.0, 1e-6, 1.0], jnp.float32))
    am = jnp.argmax(logits, -1)
    assert int(tok[0]) == int(am[0])
    assert int(tok[1]) == int(am[1])
    assert int(tok[2]) == int(am[2])
    # Row 3: top_k=5 support.
    top5 = set(jnp.argsort(logits[3])[-5:].tolist())
    for trial in range(4):
        keys_t = jax.vmap(jax.random.PRNGKey)(
            jnp.full((4,), 100 + trial, jnp.uint32))
        tok_t = sample_token_per_row(
            logits, keys_t,
            jnp.full((4,), 0.8, jnp.float32),
            jnp.full((4,), 5, jnp.int32),
            jnp.ones((4,), jnp.float32))
        assert int(tok_t[3]) in top5

    # k-then-p composition: logits [3,2,1,0,-50,...] with top_k=2,
    # top_p=0.7.  Over the k-truncated distribution, p(3)=0.731 > 0.7
    # so the nucleus keeps ONLY index 0; over the raw distribution
    # p(3)=0.645 < 0.7 and index 1 would survive.  Both samplers must
    # always return 0.
    comp = np.full((1, vocab), -50.0, np.float32)
    comp[0, :4] = [3.0, 2.0, 1.0, 0.0]
    comp = jnp.asarray(comp)
    for trial in range(8):
        t1 = sample_token(comp, jax.random.PRNGKey(trial),
                          temperature=1.0, top_k=2, top_p=0.7)
        t2 = sample_token_per_row(
            comp, jax.random.PRNGKey(trial)[None],
            jnp.ones((1,), jnp.float32),
            jnp.full((1,), 2, jnp.int32),
            jnp.full((1,), 0.7, jnp.float32))
        assert int(t1[0]) == 0
        assert int(t2[0]) == 0


def test_sampling_actually_samples():
    """Regression for the nucleus-cutoff bug (max over kept logits ==
    always argmax): finite temperature with permissive filters must
    produce MORE than the greedy token across keys, and top_p must
    keep exactly the smallest >= p prefix."""
    from metal_flash_attention_tpu.models.serving import (
        sample_token,
        sample_token_per_row,
    )

    vocab = 64
    logits = np.full((1, vocab), -50.0, np.float32)
    logits[0, :4] = [3.0, 2.0, 1.0, 0.0]
    logits = jnp.asarray(logits)
    # probs ~ [.645, .237, .087, .032]: top_p=0.95 keeps {0,1,2}.
    seen_single, seen_row = set(), set()
    for trial in range(24):
        t1 = sample_token(logits, jax.random.PRNGKey(trial),
                          temperature=1.0, top_p=0.95)
        seen_single.add(int(t1[0]))
        t2 = sample_token_per_row(
            logits, jax.random.PRNGKey(100 + trial)[None],
            jnp.ones((1,), jnp.float32), jnp.zeros((1,), jnp.int32),
            jnp.full((1,), 0.95, jnp.float32))
        seen_row.add(int(t2[0]))
    assert seen_single <= {0, 1, 2} and len(seen_single) >= 2, \
        seen_single
    assert seen_row <= {0, 1, 2} and len(seen_row) >= 2, seen_row
    # permissive default (top_p=1.0, top_k off) must not be greedy
    seen = set()
    for trial in range(24):
        t = sample_token_per_row(
            logits, jax.random.PRNGKey(200 + trial)[None],
            jnp.ones((1,), jnp.float32), jnp.zeros((1,), jnp.int32),
            jnp.ones((1,), jnp.float32))
        seen.add(int(t[0]))
    assert len(seen) >= 2, seen
