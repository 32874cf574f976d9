"""Speculative decoding over paged pools: the output must equal the
plain greedy sequence for ANY draft; only the round count varies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.models import llama, serving


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)),
        jnp.int32)
    greedy = serving.generate(params, prompt, cfg, max_new_tokens=12)
    return cfg, params, prompt, greedy


def test_paged_chunk_prefill_matches_dense(setup):
    """paged_chunk_step over the prompt reproduces dense prefill
    logits."""
    cfg, params, prompt, _ = setup
    b, s = prompt.shape
    dense_cache = serving.init_cache(cfg, b, s + 4)
    dense_logits, _ = serving.prefill(params, prompt, cfg, dense_cache)

    cache = serving.init_paged_model_cache(cfg, b, s + 4)
    logits, cache = serving.paged_chunk_step(params, prompt, cfg, cache)
    err = float(jnp.max(jnp.abs(logits[:, -1] - dense_logits)))
    assert err < 2e-2, err
    assert cache.lengths.tolist() == [s, s]


def test_speculative_zero_draft_equals_greedy(setup):
    """A useless draft (all zeros): every round emits exactly the
    correction token; output == greedy."""
    cfg, params, prompt, greedy = setup

    def draft_fn(last, buf):
        return jnp.zeros((last.shape[0], 3), jnp.int32)

    out = serving.speculative_generate(
        params, prompt, cfg, draft_fn=draft_fn, draft_len=3,
        max_new_tokens=12)
    assert out[:, :greedy.shape[1]].tolist() == greedy.tolist()


def test_speculative_oracle_draft_equals_greedy(setup):
    """An oracle draft (the greedy continuation itself): full accepts,
    output == greedy, and it takes fewer rounds than tokens."""
    cfg, params, prompt, greedy = setup
    s = prompt.shape[1]
    rounds = 0

    def draft_fn(last, buf):
        nonlocal rounds
        rounds += 1
        # Look up where `last` sits in the known greedy stream and
        # propose the next 3 tokens (batch rows handled separately).
        outs = []
        for b in range(last.shape[0]):
            row = greedy[b, s:]
            # position of the current write head: count of emitted
            # tokens = number of non(-1) entries in buf
            n = int(jnp.sum(buf[b] != -1))
            nxt = row[n:n + 3]
            nxt = jnp.pad(nxt, (0, 3 - nxt.shape[0]))
            outs.append(nxt)
        return jnp.stack(outs).astype(jnp.int32)

    out = serving.speculative_generate(
        params, prompt, cfg, draft_fn=draft_fn, draft_len=3,
        max_new_tokens=12)
    assert out[:, :greedy.shape[1]].tolist() == greedy.tolist()
    # 12 tokens at up to 4/round with full accepts: strictly fewer
    # rounds than tokens.
    assert rounds <= 5, rounds


def test_speculative_random_draft_equals_greedy(setup):
    cfg, params, prompt, greedy = setup
    rng = np.random.default_rng(3)

    def draft_fn(last, buf):
        return jnp.asarray(rng.integers(0, cfg.vocab_size,
                                        (last.shape[0], 2)), jnp.int32)

    out = serving.speculative_generate(
        params, prompt, cfg, draft_fn=draft_fn, draft_len=2,
        max_new_tokens=10)
    assert out[:, :prompt.shape[1] + 10].tolist() == \
        greedy[:, :prompt.shape[1] + 10].tolist()


def test_paged_generate_equals_dense_generate(setup):
    cfg, params, prompt, greedy = setup
    out = serving.paged_generate(params, prompt, cfg, max_new_tokens=12)
    assert out.tolist() == greedy.tolist()


def test_speculative_ragged_acceptance_budget(setup):
    """Regression: one sequence's drafts always accepted, the other's
    always rejected — the accepted sequence finishes early and must
    FREEZE (its page usage stops growing) while the slow one drains;
    pre-fix the fast sequence overran the page budget and corrupted
    its cache.

    The reference here is speculative generation with all-reject
    drafts (same chunk kernel path), not the dense greedy loop: the
    two decode paths can flip bf16 near-tie argmaxes (observed one-ULP
    logit gaps at ~24 tokens on this seed), while two runs through the
    same chunk kernel are bitwise-deterministic."""
    cfg, params, prompt, _ = setup
    s = prompt.shape[1]
    max_new = 24

    def reject_fn(last, buf):
        return jnp.full((last.shape[0], 3), cfg.vocab_size - 1,
                        jnp.int32)

    ref = serving.speculative_generate(
        params, prompt, cfg, draft_fn=reject_fn, draft_len=3,
        max_new_tokens=max_new)

    def draft_fn(last, buf):
        outs = []
        for b in range(last.shape[0]):
            if b == 0:
                outs.append(jnp.full((3,), cfg.vocab_size - 1, jnp.int32))
            else:
                # Seq 1: oracle drafts from the reference stream —
                # always accepted, finishes in ~1/4 the rounds.
                row = ref[b, s:]
                n = int(jnp.sum(buf[b] != -1))
                nxt = row[n:n + 3]
                outs.append(jnp.pad(nxt, (0, 3 - nxt.shape[0])))
        return jnp.stack(outs).astype(jnp.int32)

    out = serving.speculative_generate(
        params, prompt, cfg, draft_fn=draft_fn, draft_len=3,
        max_new_tokens=max_new)
    assert out.tolist() == ref.tolist()


def test_gemma_paged_chunk_prefill_matches_dense():
    from metal_flash_attention_tpu.models import gemma

    cfg = gemma.GemmaConfig.tiny(sliding_window=32)
    params = gemma.init_params(jax.random.PRNGKey(1), cfg)
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 48)),
        jnp.int32)
    dense_cache = serving.init_cache(cfg, 2, 64)
    dense_logits, _ = serving.gemma_prefill(params, prompt, cfg,
                                            dense_cache)

    cache = serving.init_paged_model_cache(cfg, 2, 64)
    logits, cache = serving.gemma_paged_chunk_step(params, prompt, cfg,
                                                   cache)
    err = float(jnp.max(jnp.abs(logits[:, -1] - dense_logits)))
    assert err < 5e-2, err


def test_gemma_speculative_draft_invariance():
    """Gemma speculative decoding (windowed local layers + softcap
    through the paged chunk kernel): any two drafts must produce the
    identical sequence — the chunk path is deterministic, so this is
    exact (the tiny random model has EXACT logit ties, so comparing
    against the token-by-token gemma_generate path would be
    tie-break-order dependent)."""
    from metal_flash_attention_tpu.models import gemma

    cfg = gemma.GemmaConfig.tiny(sliding_window=32)
    params = gemma.init_params(jax.random.PRNGKey(1), cfg)
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 16)),
        jnp.int32)

    def reject_fn(last, buf):
        return jnp.full((last.shape[0], 2), cfg.vocab_size - 1,
                        jnp.int32)

    def zero_fn(last, buf):
        return jnp.zeros((last.shape[0], 2), jnp.int32)

    ref = serving.speculative_generate(
        params, prompt, cfg, draft_fn=reject_fn, draft_len=2,
        max_new_tokens=8, chunk_step=serving.gemma_paged_chunk_step)
    out = serving.speculative_generate(
        params, prompt, cfg, draft_fn=zero_fn, draft_len=2,
        max_new_tokens=8, chunk_step=serving.gemma_paged_chunk_step)
    assert out.tolist() == ref.tolist()


def test_model_draft_fn_same_model_accepts_fully(setup):
    """Draft-model speculation with the TARGET as its own drafter:
    perfect acceptance — output == greedy in strictly fewer rounds
    than tokens (the drafter's paged cache stays synced through the
    ragged accept/rollback cycle)."""
    cfg, params, prompt, greedy = setup
    rounds = 0
    inner = serving.make_model_draft_fn(
        params, cfg, prompt=prompt, draft_len=3, max_new_tokens=12)

    def counting(last, buf):
        nonlocal rounds
        rounds += 1
        return inner(last, buf)

    out = serving.speculative_generate(
        params, prompt, cfg, draft_fn=counting, draft_len=3,
        max_new_tokens=12)
    assert out[:, :greedy.shape[1]].tolist() == greedy.tolist()
    assert rounds <= 5, rounds     # 12 tokens at up to 4/round


def test_model_draft_fn_weak_drafter_still_greedy(setup):
    """A different (random-weight) drafter: acceptance may be poor,
    output must still equal plain greedy."""
    cfg, params, prompt, greedy = setup
    weak_cfg = type(cfg).tiny(n_layers=1)
    weak = __import__(
        "metal_flash_attention_tpu.models.llama",
        fromlist=["init_params"]).init_params(
        jax.random.PRNGKey(9), weak_cfg)
    draft_fn = serving.make_model_draft_fn(
        weak, weak_cfg, prompt=prompt, draft_len=2, max_new_tokens=10)
    out = serving.speculative_generate(
        params, prompt, cfg, draft_fn=draft_fn, draft_len=2,
        max_new_tokens=10)
    assert out[:, :prompt.shape[1] + 10].tolist() == \
        greedy[:, :prompt.shape[1] + 10].tolist()


def test_speculative_burst_self_draft_equals_greedy(setup):
    """In-jit burst rounds (`speculative_generate_model`) with the
    target as its own drafter: output == the dense greedy stream, all
    round machinery (drafter sync, ragged consume, emission scatter)
    on device."""
    cfg, params, prompt, greedy = setup
    out = serving.speculative_generate_model(
        params, prompt, cfg, draft_params=params, draft_cfg=cfg,
        draft_len=3, max_new_tokens=12, rounds_per_dispatch=3)
    assert out[:, :greedy.shape[1]].tolist() == greedy.tolist()


def test_speculative_burst_draft_invariance(setup):
    """Burst output is drafter-invariant (the verify chunk's logits at
    accepted positions depend only on the verified prefix): a weak
    1-layer drafter and the self-drafter must emit identical
    sequences, ragged acceptance and all."""
    cfg, params, prompt, _ = setup
    weak_cfg = type(cfg).tiny(n_layers=1)
    weak = llama.init_params(jax.random.PRNGKey(9), weak_cfg)
    ref = serving.speculative_generate_model(
        params, prompt, cfg, draft_params=params, draft_cfg=cfg,
        draft_len=2, max_new_tokens=16, rounds_per_dispatch=4)
    out = serving.speculative_generate_model(
        params, prompt, cfg, draft_params=weak, draft_cfg=weak_cfg,
        draft_len=2, max_new_tokens=16, rounds_per_dispatch=4)
    assert out.tolist() == ref.tolist()
