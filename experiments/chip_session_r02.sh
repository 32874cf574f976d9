#!/bin/bash
# Round-2 chip session: run once the TPU tunnel is reachable.
# Covers VERDICT r1 "next round" items 2 (D=128 fwd reconcile) and 3
# (causal D=64/256 measured rows + decode/paged tuned winners), plus
# the small-GEMM latency probe (item 6 tail).  Winners land in the
# persistent config cache (~/.cache/mfa_tpu/autotune.json) where
# lookup_tuned_blocks makes every dispatch consult them; the checked-in
# parameters.py rows are then updated from the printed sweeps.
set -x
cd /root/repo

# Forward sweeps at the bench shapes (D<=128 -> N=4096, D=256 -> N=2048):
# reconciles the r01 77.3%-vs-83% D=128 discrepancy on fresh numbers.
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel forward --head-dims 64,128 --seq 4096
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel forward --head-dims 256 --seq 2048

# Causal sweeps: the single checked-in row (1024,1024) was tuned at
# D=128 only; D=64/256 get their own measured winners.
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel forward --causal --head-dims 64,128 --seq 4096
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel forward --causal --head-dims 256 --seq 2048

# Decode / paged / GEMM winners (decode+paged lookups now fire from
# the dispatch path).
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel forward --head-dims 128 --seq 4096 --decode --paged --gemm

# Small-GEMM latency probe (XLA vs single-program vs K-grid Pallas vs
# compiler-visible chains).
PYTHONPATH=. python experiments/small_gemm_probe.py

# Real-hardware perf regression guards.
MFA_TPU_TEST_REAL=1 python -m pytest tests/test_performance.py -q

# Full bench with the tuned cache in place.
python bench.py
