"""Device context: the TPU analog of the reference's L0 runtime.

The reference keeps a global `MTLDevice` + `MTLCommandQueue` singleton
(`Utilities/MTLContext.swift:10-20`) and queries the GPU core count
from IORegistry to drive its occupancy heuristics
(`GEMM/GEMMDescriptor/GEMMDescriptor+CoreCount.swift:19-80`).  On TPU
the equivalents are: the JAX backend (dispatch queue), the device kind
string (generation parsing, reference analog
`GEMMDescriptor.swift:133-168`), and per-generation hardware constants
— peak bf16 FLOP/s, HBM bandwidth, VMEM capacity — that drive block
sizing and roofline accounting.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax


@dataclass(frozen=True)
class TpuGenerationInfo:
    """Hardware constants per TPU generation (public specs)."""
    name: str
    peak_bf16_flops: float   # per chip
    hbm_bandwidth: float     # bytes/s per chip
    vmem_bytes: int          # per core
    mxu_depth: int = 128     # systolic array contraction depth


# vmem_bytes: measured usable Pallas scratch on the v5e in this
# environment is ~15 MiB (16 MiB allocation fails to compile); assume
# the same order for other generations absent measurement.
_GENERATIONS = {
    "v3": TpuGenerationInfo("v3", 123e12, 0.9e12, 15 * 2**20),
    "v4": TpuGenerationInfo("v4", 275e12, 1.2e12, 15 * 2**20),
    "v5": TpuGenerationInfo("v5", 197e12, 0.8e12, 15 * 2**20),    # v5e
    "v5p": TpuGenerationInfo("v5p", 459e12, 2.8e12, 15 * 2**20),
    "v6": TpuGenerationInfo("v6", 918e12, 1.6e12, 15 * 2**20),    # v6e
    "v7": TpuGenerationInfo("v7", 2307e12, 7.4e12, 15 * 2**20),
    "cpu": TpuGenerationInfo("cpu", 1e12, 0.1e12, 15 * 2**20),
}


class DeviceContext:
    """Global device singleton (reference: `MTLContext.global`).

    Access via :meth:`get`; holds the resolved generation info and
    device bookkeeping the heuristics consume.
    """

    _instance: "DeviceContext | None" = None

    def __init__(self) -> None:
        try:
            dev = jax.devices()[0]
            self.device_kind: str = dev.device_kind
            self.platform: str = dev.platform
            self.num_devices: int = jax.device_count()
            self.num_local_devices: int = jax.local_device_count()
        except Exception:  # pragma: no cover - no backend at all
            self.device_kind = "cpu"
            self.platform = "cpu"
            self.num_devices = 1
            self.num_local_devices = 1
        self.generation: str = self._parse_generation(self.device_kind)
        self.info: TpuGenerationInfo = _GENERATIONS[self.generation]

    @staticmethod
    def _parse_generation(kind: str) -> str:
        """Device-name parsing (reference: createDeviceName,
        `GEMMDescriptor.swift:133-168`)."""
        k = kind.lower()
        for gen in ("v7", "v6", "v5p", "v5", "v4", "v3"):
            if gen in k:
                return gen
        return "cpu"

    @classmethod
    def get(cls) -> "DeviceContext":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    @classmethod
    def reset(cls) -> None:
        """Drop the singleton (tests that swap backends)."""
        cls._instance = None

    # ---- roofline accounting (reference: README.md:104-129) ----------

    @property
    def roofline_ginstrs_per_s(self) -> float:
        """GINSTRS = FLOPS / 2 (one FMA = 2 FLOPs), the reference's
        canonical throughput unit."""
        return self.info.peak_bf16_flops / 2.0 / 1e9

    def attention_ginstrs(self, n: int, d: int, *, heads: int = 1,
                          with_backward: bool = False,
                          causal: bool = False) -> float:
        """Work model: fwd (2D+5)N², fwd+bwd (9D+15)N²
        (reference `README.md:41-46`)."""
        per = (9 * d + 15) if with_backward else (2 * d + 5)
        work = per * n * n * heads
        return work / 2 if causal else work
