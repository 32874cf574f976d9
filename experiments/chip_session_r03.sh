#!/bin/bash
# Round-3 chip session.  The persistent autotune cache
# (~/.cache/mfa_tpu/autotune.json) was wiped between rounds (machine
# reset) — only the checked-in parameters.py rows survived.  Re-tune
# the decode/paged/GEMM winners (their tuned rows live ONLY in the
# cache) and re-sweep the attention tables, then run the tightened
# real-hardware guards and the bench.
#
# Env note (ADVICE r2): PYTHONPATH must keep the axon plugin dir —
# use PYTHONPATH=/root/repo:/root/.axon_site, never PYTHONPATH=. .
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# Attention sweeps at the bench shapes.
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel forward --head-dims 64,128 --seq 4096
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel forward --head-dims 256 --seq 2048
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel forward --causal --head-dims 64,128 --seq 4096
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel forward --causal --head-dims 256 --seq 2048
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel backward_query --head-dims 128 --seq 4096
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel backward_key_value --head-dims 128 --seq 4096

# Decode / paged / GEMM winners (all precisions; the NF4 paged row
# especially — its per-program block size moved with the r03
# gather-dequant rework).
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel forward --head-dims 128 --seq 4096 --decode --paged --gemm

# Real-hardware perf regression guards (tightened to 10-15% under
# measured in r03).
MFA_TPU_TEST_REAL=1 python -m pytest tests/test_performance.py -q

# Full bench with the tuned cache in place.
python bench.py
