"""Speculative continuous batching: every active slot verifies its
draft in one batched fixed-shape paged chunk per engine step, emitting
1..draft_len+1 tokens.  Streams must equal the plain greedy engine for
any draft function; an oracle draft must finish in fewer steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.models import llama, serving
from metal_flash_attention_tpu.models.engine import ServingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (10, 15)]
    return cfg, params, prompts


def _drain(eng, rids, max_steps=200):
    steps = 0
    while not eng.idle:
        eng.step()
        steps += 1
        assert steps < max_steps
    return [eng.result(r).tolist() for r in rids], steps


def test_speculative_engine_random_draft_equals_greedy(setup):
    cfg, params, prompts = setup
    plain = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                          max_seq=128, admissions_per_step=2)
    rids = [plain.submit(p, 9) for p in prompts]
    ref, _ = _drain(plain, rids)

    rng = np.random.default_rng(5)

    def draft_fn(last, history):
        return jnp.asarray(
            rng.integers(0, cfg.vocab_size, (last.shape[0], 3)),
            jnp.int32)

    eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                        max_seq=128, admissions_per_step=2,
                        draft_fn=draft_fn, draft_len=3)
    rids = [eng.submit(p, 9) for p in prompts]
    out, _ = _drain(eng, rids)
    assert out == ref


def test_speculative_engine_oracle_draft_fewer_steps(setup):
    """An oracle draft (reads the known greedy continuation out of the
    engine-provided history alignment) accepts fully — same streams,
    strictly fewer engine steps than the plain engine."""
    cfg, params, prompts = setup
    plain = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                          max_seq=128, admissions_per_step=2)
    rids = [plain.submit(p, 9) for p in prompts]
    ref, plain_steps = _drain(plain, rids)

    def draft_fn(last, history):
        # Locate each row's history tail inside a known full stream,
        # then propose the next 3 greedy tokens (oracle).
        hist = np.asarray(history)
        out = np.zeros((hist.shape[0], 3), np.int32)
        for b in range(hist.shape[0]):
            tail = [int(t) for t in hist[b] if t >= 0]
            if not tail:
                continue
            n = len(tail)
            done = False
            for i, full in enumerate(ref):
                for pos in range(n, len(full) + 1):
                    if full[pos - n:pos] == tail:
                        nxt = full[pos:pos + 3]
                        out[b, :len(nxt)] = nxt
                        done = True
                        break
                if done:
                    break
        return jnp.asarray(out)

    eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                        max_seq=128, admissions_per_step=2,
                        draft_fn=draft_fn, draft_len=3)
    rids = [eng.submit(p, 9) for p in prompts]
    out, spec_steps = _drain(eng, rids)
    assert out == ref
    assert spec_steps < plain_steps, (spec_steps, plain_steps)


def test_speculative_engine_stop_tokens_and_validation(setup):
    """Stop tokens truncate inside an accepted run; sampled/logprobs
    submissions are rejected in speculative mode."""
    cfg, params, prompts = setup
    plain = ServingEngine(params, cfg, max_batch=1, num_pages=32,
                          max_seq=128)
    rid = plain.submit(prompts[0], 9)
    ref, _ = _drain(plain, [rid])
    gen = ref[0][len(prompts[0]):]
    stop = gen[4]
    first_hit = gen.index(stop)

    def draft_fn(last, history):
        return jnp.zeros((last.shape[0], 2), jnp.int32)

    eng = ServingEngine(params, cfg, max_batch=1, num_pages=32,
                        max_seq=128, draft_fn=draft_fn, draft_len=2)
    with pytest.raises(ValueError):
        eng.submit(prompts[0], 4, temperature=0.5)
    with pytest.raises(ValueError):
        eng.submit(prompts[0], 4, logprobs=True)
    rid = eng.submit(prompts[0], 9, stop_tokens=[stop])
    out, _ = _drain(eng, [rid])
    assert out[0] == ref[0][:len(prompts[0]) + first_hit + 1]
    assert eng.alloc.free_pages == 32 - 1


def test_speculative_engine_with_prefix_cache(setup):
    """Speculative verify rounds compose with automatic prefix
    caching: rounds only write at positions >= len(prompt), so
    borrowed pages stay read-only, and the repeated prompt reuses its
    pages while streams still equal plain greedy."""
    cfg, params, prompts = setup
    plain = ServingEngine(params, cfg, max_batch=1, num_pages=32,
                          max_seq=128)
    rid = plain.submit(prompts[1], 8)     # 15-token prompt
    steps = 0
    while not plain.idle:
        plain.step()
        steps += 1
        assert steps < 60
    ref = plain.result(rid).tolist()

    def draft_fn(last, history):
        return jnp.zeros((last.shape[0], 2), jnp.int32)

    eng = ServingEngine(params, cfg, max_batch=1, num_pages=32,
                        max_seq=128, page_size=8,
                        draft_fn=draft_fn, draft_len=2,
                        prefix_cache=True)

    def run():
        r = eng.submit(prompts[1], 8)
        n = 0
        while not eng.idle:
            eng.step()
            n += 1
            assert n < 60
        return eng.result(r).tolist()

    out1 = run()
    out2 = run()
    assert out1 == ref
    assert out2 == ref
    assert eng.prefix_cache.hit_tokens == 8   # 1 page (page_size=8)
