#!/bin/bash
# Measurements queued for the next session with stable TPU access (or a
# real multi-chip slice). Logs to /tmp/tpu_queue_*.log.
# All round-3 numbers below were RE-VERIFIED on the chip in the round-3
# fourth continuation (2026-08-19) — this queue is for regression checks
# next session, not for missing measurements.
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
# 1) headline (round 3: 0.26 s / 130 it / 20.3x, chunk=1536 kernel)
PREALPS_BENCH_FAST=1 run headline python bench.py
# 2) het LORASC, production omin+deflate (round 3: 1.31 s / 90 it)
PREALPS_BENCH_HET=1 PREALPS_BENCH_PRECOND=lorasc PREALPS_BENCH_FAST=1 \
  PREALPS_BENCH_VARIANT=omin PREALPS_BENCH_CORRECTION=deflate \
  run het_lorasc python bench.py
# 3) scalable PRESC omin+deflate (round 3: 1.80 s / 128 it)
PREALPS_BENCH_HET=1 PREALPS_BENCH_PRECOND=presc PREALPS_BENCH_FAST=1 \
  PREALPS_BENCH_VARIANT=omin PREALPS_BENCH_CORRECTION=deflate \
  run het_presc python bench.py
# 4) deep tolerance 1e-8 (round 3: 2.62 s / 176 it / relres 7.3e-10)
PREALPS_BENCH_HET=1 PREALPS_BENCH_PRECOND=lorasc PREALPS_BENCH_FAST=1 \
  PREALPS_BENCH_VARIANT=omin PREALPS_BENCH_CORRECTION=deflate \
  PREALPS_BENCH_TOL=1e-8 PREALPS_BENCH_MAXITER=6000 \
  run het_tol8 python bench.py
# 5) flat-kernel chunk sweep (round 3: 1536 -> 0.172 ms)
run chunk_sweep python examples/sweep_flat_chunk.py
# 6) kernel sweep with honest timing (flat 0.275 ms incl. conversions)
run stencil_sweep python examples/bench_stencil_kernel.py
# --- multi-chip slice only (not runnable on the single tunnel chip) ---
# OVERLAP_ON_TPU=1 OVERLAP_NDEV=8 python examples/measure_halo_overlap.py
# python examples/weak_scaling.py   # nnz/s vs chips over ICI
