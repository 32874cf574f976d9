"""Continuous-batching engine: staggered requests through shared paged
pools must each reproduce their standalone paged_generate output."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.models import llama, serving
from metal_flash_attention_tpu.models.engine import ServingEngine

# On the real chip, greedy streams are only bitwise-comparable between
# IDENTICAL traces: XLA fuses each program shape differently and bf16
# one-ULP logit ties flip argmaxes across different programs (the
# CLAUDE.md trace-shape note; measured: engine step() != step_burst(k)
# streams on v5e while step_burst(1) == step_burst(4) exactly).  The
# engine's fixed-shape jits make engine-vs-engine comparisons safe on
# both backends; engine-vs-paged_generate is CPU-only.
REAL = bool(os.environ.get("MFA_TPU_TEST_REAL"))


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_engine_matches_paged_generate(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (16, 9, 24)]
    max_new = [8, 11, 5]

    refs = [serving.paged_generate(
        params, jnp.asarray(p[None]), cfg, max_new_tokens=m)[0]
        for p, m in zip(prompts, max_new)]

    eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                        max_seq=256)
    rids = [eng.submit(p, m) for p, m in zip(prompts, max_new)]
    streamed = {r: [] for r in rids}
    steps = 0
    while not eng.idle:
        for rid, tok in eng.step():
            streamed[rid].append(tok)
        steps += 1
        assert steps < 200, "engine did not drain"

    for rid, ref, p, m in zip(rids, refs, prompts, max_new):
        out = eng.result(rid)
        assert out.tolist() == np.asarray(ref).tolist(), rid
        # streamed tokens match the generated suffix
        assert streamed[rid] == out[len(p):].tolist()
    # all pages returned (only the engine's scratch page stays)
    assert eng.alloc.free_pages == 32 - 1  # null page only


def test_engine_multi_admission(setup):
    """admissions_per_step=max_batch fills every slot in the first
    step and still reproduces the standalone outputs."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (10, 17, 7)]
    refs = [serving.paged_generate(
        params, jnp.asarray(p[None]), cfg, max_new_tokens=6)[0]
        for p in prompts]

    eng = ServingEngine(params, cfg, max_batch=3, num_pages=32,
                        max_seq=256, admissions_per_step=3)
    rids = [eng.submit(p, 6) for p in prompts]
    emitted = eng.step()
    # all three prefills ran in the first step (each request emits its
    # prefill token plus the first batched-decode token)
    assert sorted(set(r for r, _ in emitted)) == sorted(rids)
    steps = 1
    while not eng.idle:
        eng.step()
        steps += 1
        assert steps < 50
    for rid, ref in zip(rids, refs):
        assert eng.result(rid).tolist() == np.asarray(ref).tolist()


def test_engine_chunked_prefill_interleaves(setup):
    """A long prompt prefills one chunk per step WITHOUT stalling the
    decode cadence of an already-streaming request, and both requests
    still reproduce their standalone outputs."""
    cfg, params = setup
    rng = np.random.default_rng(4)
    page = 16
    short = rng.integers(0, cfg.vocab_size, (6,)).astype(np.int32)
    long_p = rng.integers(0, cfg.vocab_size, (40,)).astype(np.int32)
    # Reference: the SAME engine configuration run without
    # interleaving pressure (one request at a time) — identical traces
    # on every backend, so the comparison below is bitwise even on the
    # real chip.  The independent paged_generate cross-check is a
    # different program and only bitwise on CPU.
    ref_eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                            page_size=page, max_seq=128)
    rs = ref_eng.submit(short, 12)
    while not ref_eng.idle:
        ref_eng.step()
    ref_short = ref_eng.result(rs)
    rl = ref_eng.submit(long_p, 4)
    while not ref_eng.idle:
        ref_eng.step()
    ref_long = ref_eng.result(rl)
    if not REAL:
        assert ref_short.tolist() == serving.paged_generate(
            params, jnp.asarray(short[None]), cfg, max_new_tokens=12,
            page_size=page)[0].tolist()
        assert ref_long.tolist() == serving.paged_generate(
            params, jnp.asarray(long_p[None]), cfg, max_new_tokens=4,
            page_size=page)[0].tolist()

    eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                        page_size=page, max_seq=128)
    rid_s = eng.submit(short, 12)
    first = eng.step()           # short: 1-chunk prefill + decode
    assert {r for r, _ in first} == {rid_s}
    rid_l = eng.submit(long_p, 4)
    # 40-token prompt at page_size=16 -> 3 chunks -> first two steps
    # emit nothing for the long request, but the short one must keep
    # streaming exactly one decode token per step throughout.
    for expect_long in (False, False, True):
        out = eng.step()
        by_rid = {}
        for r, t in out:
            by_rid.setdefault(r, []).append(t)
        assert len(by_rid.get(rid_s, [])) == 1, out
        assert (rid_l in by_rid) == expect_long, out
    while not eng.idle:
        eng.step()
    assert eng.result(rid_s).tolist() == np.asarray(ref_short).tolist()
    assert eng.result(rid_l).tolist() == np.asarray(ref_long).tolist()


def test_engine_interleaves_with_limited_slots(setup):
    """max_batch=1: requests run strictly one at a time, still correct."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, cfg.vocab_size, (8,)).astype(np.int32)
               for _ in range(2)]
    refs = [serving.paged_generate(
        params, jnp.asarray(p[None]), cfg, max_new_tokens=4)[0]
        for p in prompts]

    eng = ServingEngine(params, cfg, max_batch=1, num_pages=8,
                        max_seq=128)
    rids = [eng.submit(p, 4) for p in prompts]
    while not eng.idle:
        eng.step()
    for rid, ref in zip(rids, refs):
        assert eng.result(rid).tolist() == np.asarray(ref).tolist()


def test_gemma_engine_batch_composition_invariance():
    """Gemma family through the engine: per-request outputs must not
    depend on what else shares the batch (ride-along slots, staggered
    admission) — run the same requests at max_batch=2 and max_batch=1
    and compare."""
    from metal_flash_attention_tpu.models import gemma, serving

    cfg = gemma.GemmaConfig.tiny(sliding_window=32)
    params = gemma.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (12, 20)]

    def run(max_batch):
        eng = ServingEngine(
            params, cfg, max_batch=max_batch, num_pages=16,
            max_seq=128,
            chunk_step=serving.gemma_paged_chunk_step,
            decode_step=serving.gemma_paged_decode_step)
        rids = [eng.submit(p, 6) for p in prompts]
        steps = 0
        while not eng.idle:
            eng.step()
            steps += 1
            assert steps < 100
        return [eng.result(r).tolist() for r in rids]

    assert run(2) == run(1)


def test_engine_sampled_stream_batch_invariant(setup):
    """A sampled (temperature>0) request's token stream is a pure
    function of (engine seed, request id, position): running it alone
    vs. alongside a greedy ride-along request yields the identical
    stream, and the greedy companion still matches its standalone
    paged_generate output."""
    cfg, params = setup
    rng = np.random.default_rng(7)
    p_sampled = rng.integers(0, cfg.vocab_size, (11,)).astype(np.int32)
    p_greedy = rng.integers(0, cfg.vocab_size, (14,)).astype(np.int32)

    def drain(eng):
        steps = 0
        while not eng.idle:
            eng.step()
            steps += 1
            assert steps < 100
        return None

    # Alone.
    eng_a = ServingEngine(params, cfg, max_batch=1, num_pages=16,
                          max_seq=128, seed=42)
    rid_a = eng_a.submit(p_sampled, 8, temperature=0.9, top_k=20)
    drain(eng_a)
    alone = eng_a.result(rid_a).tolist()

    # Same request (same rid=0, same seed) + greedy companion.
    eng_b = ServingEngine(params, cfg, max_batch=2, num_pages=16,
                          max_seq=128, seed=42, admissions_per_step=2)
    rid_b = eng_b.submit(p_sampled, 8, temperature=0.9, top_k=20)
    rid_g = eng_b.submit(p_greedy, 8)
    drain(eng_b)

    assert eng_b.result(rid_b).tolist() == alone
    ref_g = serving.paged_generate(
        params, jnp.asarray(p_greedy[None]), cfg, max_new_tokens=8)[0]
    assert eng_b.result(rid_g).tolist() == np.asarray(ref_g).tolist()
    # Sampling must actually sample (regression: the nucleus-cutoff
    # bug silently made every sampled request greedy): across two
    # seeds, at least one stream differs from greedy AND the two
    # seeds differ from each other.
    greedy_ref = np.asarray(serving.paged_generate(
        params, jnp.asarray(p_sampled[None]), cfg,
        max_new_tokens=8)[0]).tolist()
    eng_c = ServingEngine(params, cfg, max_batch=1, num_pages=16,
                          max_seq=128, seed=43)
    rid_c = eng_c.submit(p_sampled, 8, temperature=0.9, top_k=20)
    drain(eng_c)
    other = eng_c.result(rid_c).tolist()
    assert alone != greedy_ref or other != greedy_ref
    assert other != alone


def test_engine_stop_tokens(setup):
    """A request submitted with stop_tokens ends at the first stop hit:
    output truncates right after the stop token, its pages free early,
    and a companion request without stop tokens runs to budget."""
    cfg, params = setup
    rng = np.random.default_rng(9)
    p0 = rng.integers(0, cfg.vocab_size, (10,)).astype(np.int32)
    p1 = rng.integers(0, cfg.vocab_size, (13,)).astype(np.int32)
    ref0 = np.asarray(serving.paged_generate(
        params, jnp.asarray(p0[None]), cfg, max_new_tokens=10)[0])
    ref1 = np.asarray(serving.paged_generate(
        params, jnp.asarray(p1[None]), cfg, max_new_tokens=10)[0])
    # Use the 4th generated token of request 0 as its stop token
    # (guarding against earlier accidental repeats of the same id).
    gen0 = ref0[len(p0):]
    stop = int(gen0[3])
    first_hit = int(np.argmax(gen0 == stop))

    eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                        max_seq=256, admissions_per_step=2)
    r0 = eng.submit(p0, 10, stop_tokens=[stop])
    r1 = eng.submit(p1, 10)
    steps = 0
    while not eng.idle:
        eng.step()
        steps += 1
        assert steps < 60
    out0 = eng.result(r0)
    # truncated right after the first stop hit, prefix matches greedy
    assert out0.tolist() == ref0[:len(p0) + first_hit + 1].tolist()
    assert out0[-1] == stop
    assert len(out0) < len(ref0)
    # companion untouched, full budget
    assert eng.result(r1).tolist() == ref1.tolist()
    # all pages back (null page only outstanding)
    assert eng.alloc.free_pages == 32 - 1


def test_engine_logprobs(setup):
    """logprobs=True records log P(token|context) for every generated
    token; values match a manual paged loop capturing logits, and are
    valid log-probabilities of the emitted greedy tokens."""
    cfg, params = setup
    rng = np.random.default_rng(13)
    prompt = rng.integers(0, cfg.vocab_size, (9,)).astype(np.int32)
    m = 5

    # Reference: manual chunked prefill + decode capturing logits.
    cache = serving.init_paged_model_cache(cfg, 1, 64, page_size=128)
    logits, cache = jax.jit(serving.paged_chunk_step,
                            static_argnames=("cfg",))(
        params, jnp.asarray(prompt[None]), cfg, cache)
    step = jax.jit(serving.paged_decode_step, static_argnames=("cfg",))
    ref_lp = []
    l = logits[:, -1]
    for _ in range(m):
        tok = jnp.argmax(l, -1).astype(jnp.int32)
        lse = jax.nn.logsumexp(l.astype(jnp.float32), -1)
        ref_lp.append(float(l.astype(jnp.float32)[0, int(tok[0])]
                            - lse[0]))
        l, cache = step(params, tok, cfg, cache)

    eng = ServingEngine(params, cfg, max_batch=1, num_pages=8,
                        max_seq=64)
    rid = eng.submit(prompt, m, logprobs=True)
    steps = 0
    while not eng.idle:
        eng.step()
        steps += 1
        assert steps < 40
    lp = eng.result_logprobs(rid)
    assert lp.shape == (m,)
    assert np.all(lp <= 0.0)
    np.testing.assert_allclose(lp, ref_lp, rtol=1e-5, atol=1e-5)
    # requests without the flag reject the accessor
    rid2 = eng.submit(prompt, 2)
    while not eng.idle:
        eng.step()
    with pytest.raises(ValueError):
        eng.result_logprobs(rid2)


def test_engine_stats(setup):
    """Observability: engine counters and per-request lifecycle."""
    cfg, params = setup
    rng = np.random.default_rng(17)
    p = rng.integers(0, cfg.vocab_size, (20,)).astype(np.int32)
    eng = ServingEngine(params, cfg, max_batch=1, num_pages=16,
                        page_size=16, max_seq=96)
    r0 = eng.submit(p, 4)
    r1 = eng.submit(p[:8], 3)
    steps = 0
    while not eng.idle:
        eng.step()
        steps += 1
        assert steps < 60
    st = eng.stats
    assert st["steps"] == steps
    # every generated token was emitted exactly once
    assert st["emitted_tokens"] == 4 + 3
    # 20-token prompt at page=16 -> 2 chunks; 8-token prompt -> 1
    assert st["prefill_chunks"] == 3
    assert st["queue_depth"] == 0 and st["active_slots"] == 0
    assert st["free_pages"] == 16 - 1

    s0 = eng.request_stats(r0)
    assert s0["generated"] == 4
    assert s0["queue_steps"] == 1          # admitted at first step
    assert s0["ttft_steps"] == 2           # two prefill chunks
    assert s0["total_steps"] >= s0["ttft_steps"]
    s1 = eng.request_stats(r1)
    assert s1["queue_steps"] > 1           # waited for the only slot
    assert s1["generated"] == 3


def test_engine_burst_matches_single_step(setup):
    """step_burst(k) — K decode steps in one dispatch — reproduces the
    single-step engine exactly across a mixed workload: greedy +
    sampled + stop-token + short-budget requests, staggered admission,
    logprobs on one request."""
    cfg, params = setup
    rng = np.random.default_rng(23)
    p0 = rng.integers(0, cfg.vocab_size, (12,)).astype(np.int32)
    p1 = rng.integers(0, cfg.vocab_size, (7,)).astype(np.int32)

    def build():
        return ServingEngine(params, cfg, max_batch=2, num_pages=32,
                             max_seq=128, seed=5,
                             admissions_per_step=2)

    def submit_all(eng):
        # greedy w/ logprobs, sampled, then (after first drain) a
        # stop-token request reusing a slot
        r0 = eng.submit(p0, 11, logprobs=True)
        r1 = eng.submit(p1, 6, temperature=0.8, top_k=12)
        return r0, r1

    # Reference: single-step drain on CPU; on the real chip the
    # reference drains with step_burst(1) — the burst(k) contract is
    # "identical to burst(1)" there (same scan-body trace; measured
    # bitwise on v5e), while single-step is a different program whose
    # bf16 near-ties may break differently.
    def drain(e):
        steps = 0
        while not e.idle:
            (e.step_burst(1) if REAL else e.step())
            steps += 1
            assert steps < 80
    ref = build()
    r0, r1 = submit_all(ref)
    drain(ref)
    ref_out = [ref.result(r0).tolist(), ref.result(r1).tolist()]
    ref_lp = ref.result_logprobs(r0).tolist()
    stop = ref_out[0][len(p0) + 4]
    rs = ref.submit(p0, 11, stop_tokens=[stop])
    drain(ref)
    ref_stop = ref.result(rs).tolist()

    # Burst engine: same submissions, drained with step_burst(4).
    eng = build()
    b0, b1 = submit_all(eng)
    steps = 0
    while not eng.idle:
        eng.step_burst(4)
        steps += 1
        assert steps < 80
    assert eng.result(b0).tolist() == ref_out[0]
    assert eng.result(b1).tolist() == ref_out[1]
    np.testing.assert_allclose(eng.result_logprobs(b0), ref_lp,
                               rtol=1e-6, atol=1e-6)
    bs = eng.submit(p0, 11, stop_tokens=[stop])
    while not eng.idle:
        eng.step_burst(4)
    assert eng.result(bs).tolist() == ref_stop
    assert eng.alloc.free_pages == 32 - 1


def test_gemma_engine_burst_matches_single_step():
    """Burst decode drives the family's raw decode step: the Gemma
    engine bursts to the same streams as single-stepping."""
    from metal_flash_attention_tpu.models import gemma, serving as sv

    cfg = gemma.GemmaConfig.tiny(sliding_window=32)
    params = gemma.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (12, 20)]

    def run(burst):
        eng = ServingEngine(
            params, cfg, max_batch=2, num_pages=16, max_seq=128,
            admissions_per_step=2,
            chunk_step=sv.gemma_paged_chunk_step,
            decode_step=sv.gemma_paged_decode_step)
        rids = [eng.submit(p, 7) for p in prompts]
        steps = 0
        while not eng.idle:
            (eng.step_burst(3) if burst else eng.step())
            steps += 1
            assert steps < 100
        return [eng.result(r).tolist() for r in rids]

    assert run(True) == run(False)


def test_engine_logit_bias_and_priority(setup):
    """OpenAI-style logit_bias: -inf-like bias bans the greedy token
    (single-step and burst paths agree); +100 forces one.  Priority:
    a later high-priority submission admits before an earlier
    low-priority one."""
    cfg, params = setup
    rng = np.random.default_rng(29)
    p = rng.integers(0, cfg.vocab_size, (10,)).astype(np.int32)

    def drain(eng, burst=False):
        steps = 0
        while not eng.idle:
            (eng.step_burst(3) if burst else eng.step())
            steps += 1
            assert steps < 60
        return steps

    plain = ServingEngine(params, cfg, max_batch=1, num_pages=16,
                          max_seq=64)
    r = plain.submit(p, 5)
    drain(plain)
    greedy = plain.result(r).tolist()
    banned = greedy[len(p)]                # first generated token

    for burst in (False, True):
        eng = ServingEngine(params, cfg, max_batch=1, num_pages=16,
                            max_seq=64)
        r = eng.submit(p, 5, logit_bias={banned: -1e9},
                       logprobs=True)
        drain(eng, burst)
        out = eng.result(r).tolist()
        assert banned not in out[len(p):], (burst, out)
        # logprobs still describe the UNBIASED distribution: the
        # banned-token run's first logprob must be <= greedy's max.
        assert eng.result_logprobs(r)[0] <= 0.0
    # forcing: +1e9 on an arbitrary token makes every emission it
    forced = int((banned + 7) % cfg.vocab_size)
    eng = ServingEngine(params, cfg, max_batch=1, num_pages=16,
                        max_seq=64)
    r = eng.submit(p, 4, logit_bias={forced: 1e9})
    drain(eng)
    assert eng.result(r).tolist()[len(p):] == [forced] * 4

    # Priority: submit low first, high second; high runs first.
    eng = ServingEngine(params, cfg, max_batch=1, num_pages=16,
                        max_seq=64)
    lo = eng.submit(p, 3, priority=0)
    hi = eng.submit(p, 3, priority=5)
    drain(eng)
    assert eng.request_stats(hi)["queue_steps"] < \
        eng.request_stats(lo)["queue_steps"]


def test_engine_abort(setup):
    """abort(): queued requests drop; running requests free their slot
    and pages immediately, partial output stays readable, and the
    freed slot admits the next request."""
    cfg, params = setup
    rng = np.random.default_rng(31)
    p = rng.integers(0, cfg.vocab_size, (18,)).astype(np.int32)
    eng = ServingEngine(params, cfg, max_batch=1, num_pages=16,
                        page_size=16, max_seq=96)
    r0 = eng.submit(p, 20)
    r1 = eng.submit(p[:9], 3)
    # run a few steps so r0 is mid-decode
    for _ in range(4):
        eng.step()
    assert eng.abort(r1)                  # still queued
    assert eng.result(r1).tolist() == p[:9].tolist()  # no output yet
    partial = len(eng.result(r0))
    assert partial > len(p)               # r0 already streaming
    assert eng.abort(r0)                  # running
    assert eng.alloc.free_pages == 16 - 1
    assert len(eng.result(r0)) == partial
    assert not eng.abort(r0)              # already done -> no-op
    assert eng.idle
    r2 = eng.submit(p, 3)                 # freed slot admits again
    steps = 0
    while not eng.idle:
        eng.step()
        steps += 1
        assert steps < 30
    ref = serving.paged_generate(params, jnp.asarray(p[None]), cfg,
                                 max_new_tokens=3, page_size=16)
    assert eng.result(r2).tolist() == np.asarray(ref)[0].tolist()
