"""Host-side training data pipeline: memmapped token shards with
double-buffered device prefetch.

The training loop's input side, built for the TPU execution model:

- **Token shards** are flat binary files of token ids (any integer
  dtype) read through `np.memmap` — zero-copy on the host, no
  dependency beyond numpy.  `write_shard` produces them.
- **Sampling** cuts fixed-length windows (`seq_len + 1`, inputs and
  shifted targets in one draw) at positions from a seeded
  `np.random.Generator` — deterministic and resumable: the loader's
  state is (seed, step) and `state()`/`from_state` round-trips it,
  pairing with `utils/checkpoint` for fault-tolerant training.
- **Prefetch** overlaps host batch assembly and H2D transfer with
  device compute: `jax.device_put` of batch k+1 is issued *before*
  batch k is consumed, so the transfer rides under the step's compute
  (the single-chip analog of an input pipeline; a sharded `device_put`
  with a `NamedSharding` does the same onto a mesh).

No reference analog (the Metal reference stops at kernels); this is
the input layer its users would otherwise write by hand.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import numpy as np


def write_shard(path: str, tokens: np.ndarray) -> None:
    """Write a flat token array as a raw shard (dtype preserved in the
    filename-independent header)."""
    tokens = np.ascontiguousarray(tokens)
    with open(path, "wb") as f:
        header = f"MFATOK1 {tokens.dtype.str} {tokens.size}\n".encode()
        f.write(header.ljust(64, b" "))
        f.write(tokens.tobytes())


def open_shard(path: str) -> np.ndarray:
    """Memmap a shard written by :func:`write_shard`."""
    with open(path, "rb") as f:
        header = f.read(64).decode().split()
    assert header[0] == "MFATOK1", f"not a token shard: {path}"
    dtype, size = np.dtype(header[1]), int(header[2])
    return np.memmap(path, dtype=dtype, mode="r", offset=64,
                     shape=(size,))


class TokenLoader:
    """Deterministic, resumable batch sampler over token shards.

    >>> loader = TokenLoader(["shard0.bin"], batch=8, seq_len=4096,
    ...                      seed=0)
    >>> for batch in loader:          # jax.Array [batch, seq_len + 1]
    ...     params, state, loss = step(params, state, batch)

    Batches are `[batch, seq_len + 1]` int32 on device (the +1 lets
    `loss_fn` slice inputs/targets).  Iteration prefetches one batch
    ahead.  `state()` -> (seed, step) captures the exact stream
    position; `TokenLoader.from_state` resumes it.
    """

    def __init__(self, shard_paths, batch: int, seq_len: int, *,
                 seed: int = 0, step: int = 0,
                 sharding: Optional[jax.sharding.Sharding] = None):
        assert shard_paths, "need at least one shard"
        self.paths = list(shard_paths)
        self.shards = [open_shard(p) for p in self.paths]
        self.sizes = np.asarray([s.size for s in self.shards], np.int64)
        assert all(self.sizes >= seq_len + 1), \
            "every shard must hold at least seq_len + 1 tokens"
        self.batch = batch
        self.seq_len = seq_len
        self.seed = seed
        self.step = step
        self.sharding = sharding

    # -- resumability ----------------------------------------------------

    def state(self) -> tuple[int, int]:
        return (self.seed, self.step)

    @classmethod
    def from_state(cls, shard_paths, batch, seq_len,
                   state: tuple[int, int], **kw):
        seed, step = state
        return cls(shard_paths, batch, seq_len, seed=seed, step=step,
                   **kw)

    # -- sampling --------------------------------------------------------

    def _host_batch(self, step: int) -> np.ndarray:
        """Assemble batch `step` on the host (pure function of
        (seed, step): resuming re-derives the identical stream)."""
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, step]))
        span = self.seq_len + 1
        # Shards weighted by size so tokens are uniform across them.
        probs = self.sizes / self.sizes.sum()
        out = np.empty((self.batch, span), np.int32)
        for i in range(self.batch):
            s = rng.choice(len(self.shards), p=probs)
            start = rng.integers(0, self.sizes[s] - span + 1)
            out[i] = self.shards[s][start:start + span]
        return out

    def _put(self, arr: np.ndarray) -> jax.Array:
        if self.sharding is not None:
            return jax.device_put(arr, self.sharding)
        return jax.device_put(arr)

    def __iter__(self) -> Iterator[jax.Array]:
        # Double buffering: issue batch k+1's device_put before
        # yielding batch k, so H2D overlaps the consumer's compute.
        nxt = self._put(self._host_batch(self.step))
        while True:
            cur = nxt
            self.step += 1
            nxt = self._put(self._host_batch(self.step))
            yield cur

    def take(self, n: int) -> Iterator[jax.Array]:
        it = iter(self)
        for _ in range(n):
            yield next(it)
