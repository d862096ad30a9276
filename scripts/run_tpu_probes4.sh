#!/bin/bash
# Phase-4 TPU measurement batch:
#   bash scripts/run_tpu_probes4.sh [outdir]
# Captures: single-conv backward attribution (dgrad vs wgrad + manual
# wgrad formulations) at KITTI RPN shapes, and the SECOND sparse V-cap
# scaling A/B. Run only on an idle host core (timing trap: TODO.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpuprobes4}
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

run conv_bwd_f32     python scripts/probe_conv_bwd.py
run conv_bwd_bf16    python scripts/probe_conv_bwd.py --bf16
run second_v12k      python scripts/probe_second_sparse.py --vcap 12000
run second_v16k      python scripts/probe_second_sparse.py --vcap 16000
echo "=== all done ==="
