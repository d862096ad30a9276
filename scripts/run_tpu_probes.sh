#!/bin/bash
# One-shot TPU measurement batch (run when the relay is healthy):
#   bash scripts/run_tpu_probes.sh [outdir]
# Serializes the headline bench + the open perf probes, one log per step,
# so a single healthy relay window captures everything.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpuprobes}
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

run bench            python bench.py
run kitti_e2e        python scripts/probe_kitti_e2e.py
run second_sparse    python scripts/probe_second_sparse.py
run stream120        python -m pillars_tpu.cli stream --hz 120 --duration 10
echo "=== all done ==="
