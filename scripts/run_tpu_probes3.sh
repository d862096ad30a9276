#!/bin/bash
# Phase-3 TPU measurement batch — run AFTER run_tpu_probes2.sh:
#   bash scripts/run_tpu_probes3.sh [outdir]
# Captures: streaming window A/B (overlapped D2H fetches vs serialized),
# SECOND sparse bf16 re-measure, and the driver contract.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpuprobes3}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

run() {
  name=$1; shift
  echo "=== $name: $* (start $(date +%H:%M:%S)) ==="
  timeout 2400 "$@" > "$OUT/$name.log" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S)); tail:"
  tail -4 "$OUT/$name.log"
}

run stream_w1        python -m pillars_tpu.cli stream --hz 120 --duration 10 --window 1
run stream_w8        python -m pillars_tpu.cli stream --hz 120 --duration 10 --window 8
run stream_w16       python -m pillars_tpu.cli stream --hz 240 --duration 10 --window 16
run second_bf16      python scripts/probe_second_sparse.py --bf16
run depthwise        python scripts/probe_depthwise.py
run graft_entry      python __graft_entry__.py
echo "=== all done ==="
