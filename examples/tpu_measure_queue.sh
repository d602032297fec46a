#!/bin/bash
# Queued TPU measurements after the relayout work (run when the remote
# backend is stable). Logs to /tmp/tpu_queue_*.log; prints one summary line
# per step.
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
# 1) het LORASC bench with the relayout (was 3.63 s / 154 it)
PREALPS_BENCH_HET=1 PREALPS_BENCH_PRECOND=lorasc run het_lorasc python bench.py
# 2) component profile of the relayouted apply
PREALPS_PROBE_NPARTS=8 run relayout_probe8 python examples/probe_lorasc_relayout.py
# 3) nparts=16: halves the interior factor bytes per solve
PREALPS_BENCH_HET=1 PREALPS_BENCH_PRECOND=lorasc PREALPS_BENCH_NPARTS=16 \
  run het_lorasc_p16 python bench.py
# 4) headline re-verify (bj2l default; was 0.268 s / 130 it)
run headline python bench.py
