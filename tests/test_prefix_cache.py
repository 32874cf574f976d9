"""Automatic prefix caching: refcounted page sharing, chained-digest
lookup, LRU-leaf eviction, and end-to-end engine reuse (a repeated
prompt skips the shared prefill and still reproduces the uncached
output bitwise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.models import llama, serving
from metal_flash_attention_tpu.models.engine import ServingEngine
from metal_flash_attention_tpu.models.prefix_cache import PrefixCache
from metal_flash_attention_tpu.native.page_allocator import (
    NativePageAllocator,
    PagerError,
    PythonPageAllocator,
)


@pytest.mark.parametrize("cls", [NativePageAllocator,
                                 PythonPageAllocator])
def test_allocator_refcounts(cls):
    try:
        a = cls(8, 16)
    except Exception:
        pytest.skip("no native toolchain")
    pgs = a.reserve(seq=0, num_tokens=32)
    assert len(pgs) == 2 and a.free_pages == 5
    a.retain(pgs)                       # cache pins both
    a.release(0)                        # seq refs drop; pages survive
    assert a.free_pages == 5
    assert a.refcount(pgs[0]) == 1
    a.release_pages(pgs)                # last refs -> freed
    assert a.free_pages == 7
    assert a.refcount(pgs[0]) == 0
    with pytest.raises(PagerError):
        a.release_pages([pgs[0]])       # double free rejected
    with pytest.raises(PagerError):
        a.retain([pgs[0]])              # retaining a free page rejected
    # failed retain must have no side effects
    b = cls(8, 16)
    live = b.reserve(seq=1, num_tokens=16)
    free_pg = (set(range(1, 8)) - set(live)).pop()
    with pytest.raises(PagerError):
        b.retain([live[0], free_pg])
    assert b.refcount(live[0]) == 1


def test_prefix_cache_unit():
    """Chained lookup, exact-token verification, last-token-recompute
    cap, and leaves-first LRU eviction — against a real allocator, no
    model."""
    alloc = PythonPageAllocator(16, 4)
    cache = PrefixCache(alloc)
    prompt = np.arange(13, dtype=np.int32)          # 3 complete pages
    pages = alloc.reserve(seq=0, num_tokens=16)     # 4 pages
    assert cache.register(prompt, pages) == 3
    alloc.release(0)                                # request retires
    assert alloc.free_pages == 15 - 4 + 1           # 3 stay cached

    # Full-chain hit is capped at len(prompt)-1 tokens: same 13-token
    # prompt hits 3 pages only if 3*4 <= 12 -> yes, 12 tokens.
    hit_pages, n = cache.lookup(prompt)
    assert n == 12 and hit_pages == [int(p) for p in pages[:3]]
    for p in hit_pages:
        assert alloc.refcount(p) == 2               # cache + borrower
    alloc.release_pages(hit_pages)

    # A 12-token prompt shares only 2 pages (the 12th token recomputes).
    hp, n = cache.lookup(prompt[:12])
    assert n == 8
    alloc.release_pages(hp)

    # Diverging tokens stop the walk exactly at the divergence page.
    div = prompt.copy()
    div[6] = 99                                     # inside page 1
    hp, n = cache.lookup(div)
    assert n == 4 and hp == [int(pages[0])]
    alloc.release_pages(hp)

    # Eviction removes leaves first: after evicting one page the chain
    # root must still be reachable.
    freed = cache.evict(1)
    assert freed == 1 and len(cache) == 2
    hp, n = cache.lookup(prompt)
    assert n == 8                                   # pages 0,1 remain
    alloc.release_pages(hp)
    cache.flush()
    assert alloc.free_pages == 15


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_engine_prefix_reuse_bitwise(setup):
    """Second submission of the same prompt reuses the cached prefix
    pages (prefill skips the shared 32 tokens) and produces the exact
    uncached token stream; a partially shared prompt reuses one page."""
    cfg, params = setup
    rng = np.random.default_rng(11)
    page = 16
    prompt = rng.integers(0, cfg.vocab_size, (40,)).astype(np.int32)
    ref = np.asarray(serving.paged_generate(
        params, jnp.asarray(prompt[None]), cfg, max_new_tokens=6,
        page_size=page)[0])

    eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                        page_size=page, max_seq=128, prefix_cache=True)

    def run(p, m=6):
        rid = eng.submit(p, m)
        steps = 0
        while not eng.idle:
            eng.step()
            steps += 1
            assert steps < 60
        return eng.result(rid), steps

    out1, steps1 = run(prompt)
    assert out1.tolist() == ref.tolist()
    assert eng.prefix_cache.hit_tokens == 0
    cached = len(eng.prefix_cache)
    assert cached == 2                       # 40 tokens -> 2 full pages

    out2, steps2 = run(prompt)
    assert out2.tolist() == ref.tolist()     # bitwise reuse
    assert eng.prefix_cache.hit_tokens == 32 # both pages borrowed
    # 3-chunk prefill collapsed to 1 chunk -> strictly fewer steps
    assert steps2 < steps1

    # Prompt sharing only the first page.
    p3 = prompt.copy()
    p3[20] = (p3[20] + 1) % cfg.vocab_size
    ref3 = np.asarray(serving.paged_generate(
        params, jnp.asarray(p3[None]), cfg, max_new_tokens=6,
        page_size=page)[0])
    out3, _ = run(p3)
    assert out3.tolist() == ref3.tolist()
    assert eng.prefix_cache.hit_tokens == 32 + 16

    # Page accounting: only cache-pinned pages outstanding (+ null).
    # prompt-chain (2 pages, second chain shares them) + p3's own
    # diverged page-1 entry (page 0 entry dedups onto the first chain).
    assert len(eng.prefix_cache) == 3
    assert eng.alloc.free_pages == 32 - 1 - 3
    eng.prefix_cache.flush()
    assert eng.alloc.free_pages == 32 - 1


def test_engine_prefix_cache_eviction_under_pressure(setup):
    """A tiny pool: cold cached chains evict automatically when a new
    request cannot reserve its span."""
    cfg, params = setup
    rng = np.random.default_rng(12)
    page = 16
    # Pool: 9 usable pages.  Each 40-token prompt + 6 new needs 3
    # pages and caches 2.
    eng = ServingEngine(params, cfg, max_batch=1, num_pages=10,
                        page_size=page, max_seq=64, prefix_cache=True)

    def run(p):
        rid = eng.submit(p, 6)
        steps = 0
        while not eng.idle:
            eng.step()
            steps += 1
            assert steps < 60
        return eng.result(rid)

    prompts = [rng.integers(0, cfg.vocab_size, (40,)).astype(np.int32)
               for _ in range(4)]
    refs = [np.asarray(serving.paged_generate(
        params, jnp.asarray(p[None]), cfg, max_new_tokens=6,
        page_size=page)[0]) for p in prompts]
    for p, r in zip(prompts, refs):
        assert run(p).tolist() == r.tolist()
    # The cache never blocked progress and stayed within the pool.
    assert eng.alloc.free_pages >= 1
    assert eng.prefix_cache.hit_tokens == 0   # all prompts distinct


@pytest.mark.parametrize("cls", [NativePageAllocator,
                                 PythonPageAllocator])
def test_allocator_concurrent_stress(cls):
    """Thread-safety under mixed reserve/retain/release traffic:
    page conservation holds (free + live == total) and no page is
    ever double-owned."""
    import threading

    try:
        alloc = cls(257, 16)
    except Exception:
        pytest.skip("no native toolchain")
    errors = []

    def worker(tid):
        try:
            rng = np.random.default_rng(tid)
            for it in range(60):
                seq = tid * 1000 + (it % 7)
                pages = alloc.reserve(
                    seq=seq, num_tokens=int(rng.integers(1, 64)))
                if pages:
                    alloc.retain(pages)          # cache-style pin
                    alloc.release_pages(pages)   # unpin
                if it % 3 == 2:
                    alloc.release(seq)
        except PagerError:
            pass          # pool pressure is fine; corruption is not
        except Exception as e:            # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    # Drain every sequence and verify full conservation.
    for tid in range(8):
        for k in range(7):
            try:
                alloc.release(tid * 1000 + k)
            except Exception:
                pass
    assert alloc.free_pages == 256
    for pg in range(1, 257):
        assert alloc.refcount(pg) == 0, pg
