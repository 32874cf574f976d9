"""GEMM problem descriptor and kernel-config resolution.

TPU-native analog of the reference's GEMM L3 layer
(`GEMM/GEMMDescriptor/GEMMDescriptor.swift:11-47` — the problem
descriptor with batch, M/N/K, memory precisions, transposes,
`loadPreviousC`; and `:106-234` — the problem->kernel heuristic that
parses the device generation, reads the core count, and picks block
dimensions by occupancy; block tables `:240-323`) plus the canonical
`GEMMKey` identity (`:49-90`).

On TPU the heuristic's currency is VMEM footprint and MXU alignment
instead of register pressure and threadgroup occupancy:

- block_m / block_n start at 512 (large tiles amortize the VPU
  accumulator update and grid overhead) and shrink to fit the problem
  and the ~15 MiB VMEM budget (A + B blocks double-buffered + the
  fp32 accumulator).
- block_k defaults to 512: deep contraction per grid step keeps the
  MXU busy between accumulator round-trips.
- A transposed A forces block_m to lane alignment (128), mirroring
  how the reference's transposed operands change the leading-block
  padding (`GEMMKernelDescriptor.swift:118-126`).

A measured autotune winner (runtime.autotune.autotune_gemm) overrides
the static choice, exactly like the reference's 4-candidate
registration-time autotune (`GEMMDescriptor+PipelineCache.swift:75-119`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from metal_flash_attention_tpu.descriptors.precision import OperandPrecision
from metal_flash_attention_tpu.runtime.context import DeviceContext
from metal_flash_attention_tpu.utils.shapes import round_up


@dataclass(frozen=True)
class GEMMKernelConfig:
    """Resolved block geometry (reference:
    GEMMKernelDescriptor.swift:21-181)."""
    block_m: int
    block_n: int
    block_k: int


@dataclass(frozen=True)
class GEMMDescriptor:
    """Problem description; hashable, used as the config-cache key
    (reference: GEMMDescriptor.swift:11-47 + GEMMKey :49-90)."""
    m: int
    n: int
    k: int
    precision_a: OperandPrecision = OperandPrecision.FP32
    precision_b: OperandPrecision = OperandPrecision.FP32
    precision_out: Optional[OperandPrecision] = None
    transpose_a: bool = False
    transpose_b: bool = False
    batch: int = 1
    load_previous_c: bool = False

    def cache_key(self) -> str:
        """Canonical string key; sizes bucketed to powers of two like
        the attention keys (block choice is scale- not value-
        sensitive)."""
        from metal_flash_attention_tpu.runtime.cache import (
            KernelConfigCache,
        )

        def bucket(x: int) -> int:
            return 1 << max(x - 1, 1).bit_length()

        return KernelConfigCache.gemm_key(
            bucket(self.m), bucket(self.n), bucket(self.k),
            self.precision_a.storage_dtype,
            self.transpose_a, self.transpose_b,
        )

    def kernel_config(
        self,
        *,
        vmem_budget: Optional[int] = None,
    ) -> GEMMKernelConfig:
        """Resolve block dimensions (reference heuristic:
        GEMMDescriptor.swift:240-323)."""
        from metal_flash_attention_tpu.runtime.cache import (
            KernelConfigCache,
        )

        tuned = KernelConfigCache.get().lookup(self.cache_key())
        if tuned is not None:
            bm, bn = tuned
            return GEMMKernelConfig(bm, bn, self._pick_block_k(bm, bn,
                                                               vmem_budget))

        cfg = self._heuristic_config(vmem_budget)

        # Autotune-on-miss (reference: registration-time autotune on an
        # unknown pipeline preference, GEMMDescriptor+PipelineCache
        # .swift:75-119): first dispatch of an uncached problem key
        # sweeps the heuristic's choice plus its three half-block
        # neighbors and persists the winner.
        from metal_flash_attention_tpu.descriptors.parameters import (
            _MISS_SWEEP_ACTIVE,
            autotune_on_miss_enabled,
        )
        key = self.cache_key()
        if autotune_on_miss_enabled() and key not in _MISS_SWEEP_ACTIVE:
            _MISS_SWEEP_ACTIVE.add(key)
            try:
                from metal_flash_attention_tpu.runtime.autotune import (
                    autotune_gemm_descriptor,
                )
                bm, bn = cfg.block_m, cfg.block_n
                cands = list(dict.fromkeys([
                    (bm, bn),
                    (max(bm // 2, 128), bn),
                    (bm, max(bn // 2, 128)),
                    (max(bm // 2, 128), max(bn // 2, 128)),
                ]))
                (bm, bn), _ = autotune_gemm_descriptor(self, cands)
                return GEMMKernelConfig(
                    bm, bn, self._pick_block_k(bm, bn, vmem_budget))
            except Exception:
                pass  # fall back to the heuristic choice
            finally:
                _MISS_SWEEP_ACTIVE.discard(key)
        return cfg

    def _heuristic_config(
        self,
        vmem_budget: Optional[int] = None,
    ) -> GEMMKernelConfig:
        """Static block heuristic (reference:
        GEMMDescriptor.swift:240-323), no cache or sweep."""
        if vmem_budget is None:
            vmem_budget = DeviceContext.get().info.vmem_bytes

        itemsize = max(
            1, max(self.precision_a.bits, self.precision_b.bits) // 8)
        m_align = 128 if self.transpose_a else 8
        # Large problems take 1024-wide tiles: at 512 tiles a 3072^3
        # bf16 GEMM is HBM-bound re-reading A/B (measured 67% vs 77%
        # of roofline on v5e); tile area doubles the arithmetic
        # intensity.  The VMEM shrink loop below backs off when the
        # budget disagrees.
        cap = 1024 if min(self.m, self.n) >= 2048 else 512
        block_m = max(min(cap, round_up(self.m, m_align)), m_align)
        block_n = max(min(cap, round_up(self.n, 128)), 128)
        block_k = self._pick_block_k(block_m, block_n, vmem_budget,
                                     itemsize)
        # Shrink M/N tiles until the footprint fits (reference analog:
        # the occupancy-driven 48x48 -> 32x32 fallback).
        while (self._vmem_bytes(block_m, block_n, block_k, itemsize)
               > vmem_budget and block_m > 128):
            block_m //= 2
        while (self._vmem_bytes(block_m, block_n, block_k, itemsize)
               > vmem_budget and block_n > 128):
            block_n //= 2
        return GEMMKernelConfig(block_m, block_n, block_k)

    def _pick_block_k(self, block_m, block_n, vmem_budget=None,
                      itemsize=None) -> int:
        if itemsize is None:
            itemsize = max(1, max(self.precision_a.bits,
                                  self.precision_b.bits) // 8)
        if vmem_budget is None:
            vmem_budget = DeviceContext.get().info.vmem_bytes
        block_k = max(min(512, round_up(self.k, 128)), 128)
        while (self._vmem_bytes(block_m, block_n, block_k, itemsize)
               > vmem_budget and block_k > 128):
            block_k //= 2
        return block_k

    @staticmethod
    def _vmem_bytes(bm, bn, bk, itemsize) -> int:
        """A/B blocks double-buffered by the Pallas pipeline + fp32
        accumulator + output block (the TPU analog of the reference's
        `threadgroupMemoryAllocation`, GEMMKernel.swift:264-269)."""
        return 2 * (bm * bk + bk * bn) * itemsize + 2 * bm * bn * 4

    # ---- work accounting (reference: GINSTRS = FLOPs / 2) -------------

    @property
    def flops(self) -> int:
        return 2 * self.batch * self.m * self.n * self.k
