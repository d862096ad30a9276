#!/bin/bash
# Phase-2 TPU measurement batch — run AFTER run_tpu_probes.sh:
#   bash scripts/run_tpu_probes2.sh [outdir]
# Attribution + experiment probes that depend on phase-1 results being
# captured first (fresh KITTI e2e / SECOND numbers).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpuprobes2}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

run() {
  name=$1; shift
  echo "=== $name: $* (start $(date +%H:%M:%S)) ==="
  timeout 3600 "$@" > "$OUT/$name.log" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S)); tail:"
  tail -6 "$OUT/$name.log"
}

run kitti_fuse    python scripts/probe_fuse.py
run train_flags   python scripts/probe_train_flags.py
echo "=== all done ==="
