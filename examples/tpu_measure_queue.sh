#!/bin/bash
# Measurements queued for the next session with stable TPU access (or a
# real multi-chip slice). Logs to /tmp/tpu_queue_*.log.
set -u
cd "$(dirname "$0")/.."
run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  timeout 3000 "$@" >"/tmp/tpu_queue_$name.out" 2>"/tmp/tpu_queue_$name.log"
  local rc=$?
  echo "--- $name rc=$rc"
  tail -5 "/tmp/tpu_queue_$name.out"
}
# 1) headline re-verify (round-3 flat kernel: 0.227 s / 130 it / 23.3x)
PREALPS_BENCH_FAST=1 run headline python bench.py
# 2) het LORASC with host-refined pairs (round 3: 2.21 s / 159 it)
PREALPS_BENCH_HET=1 PREALPS_BENCH_PRECOND=lorasc PREALPS_BENCH_FAST=1 \
  run het_lorasc python bench.py
# 3) scalable PRESC (round 3: 2.38 s / 180 it)
PREALPS_BENCH_HET=1 PREALPS_BENCH_PRECOND=presc PREALPS_BENCH_FAST=1 \
  run het_presc python bench.py
# 4) kernel sweep with honest timing (flat 0.275 ms incl. conversions)
run stencil_sweep python examples/bench_stencil_kernel.py
# 5) general/irregular matrix sweep (gather-ceiling study)
run general_spmm python examples/bench_spmm_general.py --npts 80000
# --- multi-chip slice only (not runnable on the single tunnel chip) ---
# OVERLAP_ON_TPU=1 OVERLAP_NDEV=8 python examples/measure_halo_overlap.py
# python examples/weak_scaling.py   # nnz/s vs chips over ICI
