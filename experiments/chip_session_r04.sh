#!/bin/bash
# Round-4 chip session.  Run near end of round, BEFORE the driver's
# bench.  The persistent autotune cache (~/.cache/mfa_tpu/
# autotune.json) is wiped by machine resets — decode/paged/GEMM tuned
# winners live only there; the attention fwd tables are checked in
# (parameters.py, re-confirmed in r04's bisect) so their sweeps are
# optional.
#
# r04 context: the cross-round attention drop was bisected to the
# ENVIRONMENT (docs/session_drift.md) — bench.py now records paired
# XLA/Pallas controls + library versions in bench_results.json, and
# README regenerates from that file afterwards:
#   python experiments/update_readme_perf.py
#
# Env note (ADVICE r2): PYTHONPATH must keep the axon plugin dir —
# use PYTHONPATH=/root/repo:/root/.axon_site, never PYTHONPATH=. .
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# Backward sweeps per head dim (VERDICT r3 next #8: the bwd tables
# were only tuned at D=128; the sweep now times BOTH backward kernels
# so a dQ-only winner can no longer poison the dKV dispatch).
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel backward_query --head-dims 64,128 --seq 4096
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel backward_query --head-dims 256 --seq 2048
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel backward_key_value --head-dims 64,128 --seq 4096
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel backward_key_value --head-dims 256 --seq 2048

# Decode / paged / GEMM winners (all precisions; NF4 decode moved to
# the full-lane paired kernel in r04 — its block preference may move).
python -m metal_flash_attention_tpu.runtime autotune \
    --kernel forward --head-dims 128 --seq 4096 --decode --paged --gemm

# Real-hardware perf regression guards (incl. the new fwd D=256/D=64
# and speculative-machinery guards).
MFA_TPU_TEST_REAL=1 python -m pytest tests/test_performance.py -q

# External cross-check, same session as the bench (README table).
python experiments/external_crosscheck.py

# Full bench with the tuned cache in place; writes bench_results.json.
python bench.py

# Regenerate the README perf block from the recorded artifact.
python experiments/update_readme_perf.py
