"""Page-granular automatic prefix caching for the paged serving path.

vLLM calls this "automatic prefix caching": when a new request's
prompt starts with token pages an earlier request already prefilled
(system prompts, few-shot preambles, multi-turn history), the engine
reuses those KV pages instead of recomputing them — prefill cost drops
to the unshared suffix.  The reference framework stops at kernels and
has no serving layer; this is the cache-management obligation a
framework that ships continuous batching takes on (the same reason
`native/src/page_allocator.cpp` exists).

Design:

- **Page-granular, chained keys.** A cache entry maps
  ``digest(parent_digest || page_tokens)`` to a KV page id.  Chaining
  makes a page's key depend on its entire prefix, so lookup is a walk:
  page k hits only if pages 0..k-1 hit.  Entries also store the raw
  page tokens and are compared exactly on lookup — a digest collision
  can never serve wrong KV.
- **Refcounted pages.** Cached pages hold one reference in the (native
  C++) page allocator; borrowing requests hold one more for their
  lifetime.  A page returns to the free pool only when the last
  co-owner drops it, so cache eviction, request retirement, and new
  admissions cannot race a page into two owners.
- **Read-only sharing, no copy-on-write.** Only COMPLETE prompt pages
  are ever cached, and a borrowing request starts its own prefill at
  the page-aligned hit boundary: every KV write it performs lands in
  its freshly reserved pages.  Shared pages are immutable by
  construction, which is what makes lock-free multi-request sharing
  safe.
- **Leaves-first LRU eviction.** Evicting a chain interior would leave
  descendants unreachable (their lookup walk dies at the missing
  parent) while still pinning pages.  Eviction therefore only removes
  entries no other entry chains from, oldest first — cold chains
  dissolve from the tail up.

The engine (models/engine.py) turns this on with ``prefix_cache=True``
and re-registers every retired request's complete prompt pages, so the
cache warms itself with zero API surface for the caller.
"""

from __future__ import annotations

import hashlib

import numpy as np


def _digest(parent: bytes, page_tokens: bytes) -> bytes:
    return hashlib.blake2b(parent + page_tokens,
                           digest_size=16).digest()


class PrefixCache:
    """Maps chained prompt-page digests to live KV page ids.

    Not thread-safe by itself; the owning engine serializes access
    (the allocator underneath is independently thread-safe).
    """

    def __init__(self, alloc) -> None:
        self._alloc = alloc
        self.page_size = int(alloc.page_size)
        # digest -> [page_id, page_tokens, parent_digest, last_use]
        self._entries: dict[bytes, list] = {}
        self._tick = 0
        self.hit_tokens = 0        # cumulative stats
        self.miss_tokens = 0

    def __len__(self) -> int:
        return len(self._entries)

    def lookup(self, prompt: np.ndarray) -> tuple[list[int], int]:
        """Longest cached page chain covering at most
        ``len(prompt) - 1`` tokens; the final prompt token always
        recomputes so the caller gets last-token logits even on a
        full-prompt hit.  Hit pages are RETAINED for the caller (one
        allocator ref each — release them when the request retires).
        Returns ``(pages, n_tokens_covered)``."""
        prompt = np.asarray(prompt, np.int32)
        ps = self.page_size
        max_pages = max(len(prompt) - 1, 0) // ps
        pages: list[int] = []
        parent = b""
        for k in range(max_pages):
            tb = prompt[k * ps:(k + 1) * ps].tobytes()
            d = _digest(parent, tb)
            e = self._entries.get(d)
            if e is None or e[1] != tb:
                break
            self._tick += 1
            e[3] = self._tick
            pages.append(e[0])
            parent = d
        if pages:
            self._alloc.retain(pages)
        # NOTE: hit/miss counters are NOT updated here — a caller that
        # retries lookup (the engine's pool-exhausted admission path)
        # would inflate them; the engine adds to .hit_tokens /
        # .miss_tokens once per successful admission.
        return pages, len(pages) * ps

    def register(self, prompt: np.ndarray, pages) -> int:
        """Insert every COMPLETE page of ``prompt`` (whose KV lives in
        ``pages[k]``) into the cache, pinning newly cached pages with
        one allocator ref.  Pages already cached under the same chain
        key are kept (identical KV by construction — the duplicate
        page simply frees with its request).  Returns the number of
        new entries."""
        prompt = np.asarray(prompt, np.int32)
        ps = self.page_size
        n_full = len(prompt) // ps
        parent = b""
        added = 0
        for k in range(n_full):
            tb = prompt[k * ps:(k + 1) * ps].tobytes()
            d = _digest(parent, tb)
            e = self._entries.get(d)
            if e is None:
                self._alloc.retain([int(pages[k])])
                self._tick += 1
                self._entries[d] = [int(pages[k]), tb, parent,
                                    self._tick]
                added += 1
            parent = d
        return added

    def evict(self, n_pages: int) -> int:
        """Drop entries, leaves first in LRU order, until at least
        ``n_pages`` allocator pages have actually returned to the free
        pool or the cache is empty.  (An evicted page still borrowed
        by a live request only sheds the cache's ref — it doesn't
        count toward ``n_pages`` until the borrower retires, so
        callers should re-check ``alloc.free_pages``.)  Returns the
        number of pages freed to the pool."""
        freed = 0
        # Child counts built once; evicting a leaf decrements its
        # parent's count (may free a new leaf) — linear, not the
        # O(entries^2) rebuild-per-eviction scan.
        children: dict[bytes, int] = {}
        for e in self._entries.values():
            children[e[2]] = children.get(e[2], 0) + 1
        import heapq
        heap = [(e[3], d) for d, e in self._entries.items()
                if children.get(d, 0) == 0]
        heapq.heapify(heap)
        while freed < n_pages and heap:
            tick, victim = heapq.heappop(heap)
            e = self._entries.get(victim)
            if e is None or e[3] != tick:
                continue                      # stale heap entry
            del self._entries[victim]
            before = self._alloc.refcount(e[0])
            self._alloc.release_pages([e[0]])
            if before == 1:
                freed += 1
            parent = e[2]
            if parent:
                children[parent] -= 1
                if children[parent] == 0 and parent in self._entries:
                    heapq.heappush(
                        heap, (self._entries[parent][3], parent))
        return freed

    def flush(self) -> None:
        """Release every cache ref and forget all entries."""
        pages = [e[0] for e in self._entries.values()]
        if pages:
            self._alloc.release_pages(pages)
        self._entries.clear()
