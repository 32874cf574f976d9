"""r05: validate the burst-ified speculative/beam rates on chip
BEFORE trusting the perf-guard thresholds (the r04 speculative guard
shipped at 0.45x without hardware validation and failed at 0.21x —
VERDICT r4 weak #1b)."""

from metal_flash_attention_tpu.utils.profiling import (
    measure_dispatch_floor,
)

import bench

floor = measure_dispatch_floor()
print(f"floor {floor * 1e3:.1f} ms", flush=True)

spec, plain = bench.bench_speculative(floor=floor)
print(f"speculative {spec:,.0f} tok/s vs plain paged {plain:,.0f} "
      f"({spec / plain:.2f}x)", flush=True)

beam, bplain = bench.bench_beam(floor=floor)
print(f"beam {beam:,.0f} rows*tok/s vs plain dense {bplain:,.0f} "
      f"({beam / bplain:.2f}x)", flush=True)
