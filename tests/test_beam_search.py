"""Beam search: k=1 reduces to greedy; claimed scores match an
independent teacher-forced rescoring; eos freezes beams and pads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.models import llama, serving


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(41)
    prompt = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)
    return cfg, params, prompt


def _rescore(cfg, params, prompt, seq):
    """Teacher-forced sum of log P(generated token | prefix)."""
    s = prompt.shape[-1]
    cache = serving.init_cache(cfg, 1, seq.shape[-1] + 1)
    logits, cache = jax.jit(serving.prefill, static_argnames=("cfg",))(
        params, seq[None, :s], cfg, cache)
    step = jax.jit(serving.decode_step, static_argnames=("cfg",))
    total = 0.0
    for t in range(s, seq.shape[-1]):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        total += float(logp[0, int(seq[t])])
        logits, cache = step(params, jnp.asarray([int(seq[t])],
                                                 jnp.int32), cfg,
                             cache)
    return total


def test_beam_one_equals_greedy(setup):
    cfg, params, prompt = setup
    greedy = serving.generate(params, prompt, cfg, max_new_tokens=6)
    seqs, scores = serving.beam_generate(
        params, prompt, cfg, num_beams=1, max_new_tokens=6)
    assert seqs.shape == (2, 1, 18)
    assert seqs[:, 0].tolist() == greedy.tolist()


def test_beam_scores_match_rescoring(setup):
    cfg, params, prompt = setup
    m = 5
    seqs, scores = serving.beam_generate(
        params, prompt, cfg, num_beams=3, max_new_tokens=m)
    # Ordered best-first.
    assert np.all(np.diff(np.asarray(scores), axis=1) <= 1e-6)
    # Distinct hypotheses per batch row.
    for b in range(2):
        assert len({tuple(np.asarray(seqs)[b, j].tolist())
                    for j in range(3)}) == 3
    # Claimed (length-normalized) scores equal independent rescoring.
    for b in range(2):
        for j in range(3):
            expect = _rescore(cfg, params, np.asarray(prompt[b]),
                              np.asarray(seqs[b, j])) / m
            assert abs(float(scores[b, j]) - expect) < 5e-3, (b, j)


def test_beam_eos_freezes_and_pads(setup):
    cfg, params, prompt = setup
    greedy = serving.generate(params, prompt, cfg, max_new_tokens=8)
    eos = int(greedy[0, 12 + 3])         # forces an early finish
    seqs, scores = serving.beam_generate(
        params, prompt, cfg, num_beams=2, max_new_tokens=8,
        eos_token=eos)
    seqs = np.asarray(seqs)
    for b in range(2):
        for j in range(2):
            gen = seqs[b, j, 12:]
            hits = np.nonzero(gen == eos)[0]
            if len(hits):
                # everything after the first eos is eos padding
                assert np.all(gen[hits[0]:] == eos), (b, j, gen)
