"""Two-level kernel-config cache.

TPU analog of the reference's pipeline cache
(`GEMM/GEMMDescriptor/GEMMDescriptor+PipelineCache.swift:10-20` — a
library cache keyed on source-level identity plus a pipeline cache
keyed on problem identity) and its C++ twin `GEMMShaderCache`
(`Documentation/CppReference/GEMM/GEMMShaderCache.hpp:28-44`).

On TPU the compiled executable itself is cached by `jax.jit`, so the
two levels here are:

- **config level** — problem key -> resolved block configuration
  (the reference's kernel descriptor), either from the checked-in
  parameter tables or from a measured autotune winner;
- **persistent level** — autotune winners survive the process in a
  small store so re-runs skip measurement, the way the reference's
  parameter tables are its autotuner's outputs checked in as text
  (`AttentionDescriptor+Parameters.swift:77-285`).

Unlike the reference's cache, which is documented *not thread safe*
(`GEMMShaderCache.hpp:29-35`), this one takes a lock — and when the
C++ native store is built (`metal_flash_attention_tpu.native`), the
persistent level lives in a lock-free C++ hash table shared by every
thread in the process.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Optional

from metal_flash_attention_tpu.runtime.context import DeviceContext


def _default_store_path() -> str:
    base = os.environ.get("MFA_TPU_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "mfa_tpu")
    return os.path.join(base, "autotune.json")


class KernelConfigCache:
    """Process-wide config cache with optional native (C++) backing.

    Keys are canonical strings built from the problem descriptor — the
    analog of the reference's packed `GEMMKey`/`GEMMKernelKey` simd
    hashes (`GEMMDescriptor.swift:49-90`,
    `CppReference/ccv_nnc_mfa_hash.hpp:39-72`).
    """

    _instance: "KernelConfigCache | None" = None

    def __init__(self, store_path: Optional[str] = None) -> None:
        self._lock = threading.Lock()
        self._configs: dict[str, tuple[int, int]] = {}
        self._store_path = store_path or _default_store_path()
        self._native = None
        # The process-wide native (C++) level backs only the DEFAULT
        # store: an instance built on an explicit path is a private,
        # isolated cache (tests, embedders) — sharing the native
        # singleton there leaked user-level entries into fresh
        # tmp-path instances (order-dependent test failure once the
        # chip autotune had populated ~/.cache).
        if store_path is None:
            try:
                from metal_flash_attention_tpu.native import config_store
                self._native = config_store.ConfigStore.get()
            except Exception:
                self._native = None
        self._load()

    @classmethod
    def get(cls) -> "KernelConfigCache":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    @classmethod
    def reset(cls) -> None:
        cls._instance = None

    # ---- canonical keys ------------------------------------------------

    @staticmethod
    def attention_key(kernel_type: str, head_dim: int, dtype,
                      *, q_len_bucket: int = 0,
                      generation: Optional[str] = None) -> str:
        """Canonical problem key.  Sequence length is bucketed (block
        choice is insensitive to it beyond pow2 scale), matching the
        reference keying rows only by head-dim range."""
        import jax.numpy as jnp
        gen = generation or DeviceContext.get().generation
        return (f"attn|{kernel_type}|d{head_dim}|{jnp.dtype(dtype).name}"
                f"|n{q_len_bucket}|{gen}")

    @staticmethod
    def gemm_key(m_bucket: int, n_bucket: int, k_bucket: int, dtype,
                 transpose_a: bool, transpose_b: bool,
                 *, generation: Optional[str] = None) -> str:
        import jax.numpy as jnp
        gen = generation or DeviceContext.get().generation
        return (f"gemm|m{m_bucket}|n{n_bucket}|k{k_bucket}"
                f"|{jnp.dtype(dtype).name}|ta{int(transpose_a)}"
                f"|tb{int(transpose_b)}|{gen}")

    # ---- lookup / insert -------------------------------------------------

    def lookup(self, key: str) -> Optional[tuple[int, int]]:
        if self._native is not None:
            hit = self._native.lookup(key)
            if hit is not None:
                return hit
        with self._lock:
            return self._configs.get(key)

    def insert(self, key: str, blocks: tuple[int, int],
               *, persist: bool = True) -> None:
        if self._native is not None:
            self._native.insert(key, blocks)
        with self._lock:
            self._configs[key] = tuple(blocks)
        if persist:
            self.save()

    def __len__(self) -> int:
        with self._lock:
            return len(self._configs)

    # ---- persistence -----------------------------------------------------

    def _load(self) -> None:
        try:
            with open(self._store_path) as f:
                data = json.load(f)
            with self._lock:
                self._configs.update(
                    {k: tuple(v) for k, v in data.items()})
            if self._native is not None:
                for k, v in data.items():
                    self._native.insert(k, tuple(v))
        except (OSError, ValueError):
            pass

    def save(self) -> None:
        try:
            os.makedirs(os.path.dirname(self._store_path), exist_ok=True)
            with self._lock:
                payload = dict(self._configs)
            tmp = self._store_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(payload, f, indent=0, sort_keys=True)
            os.replace(tmp, self._store_path)
        except OSError:
            pass
