#!/bin/bash
# Phase-5 TPU measurement batch:
#   bash scripts/run_tpu_probes5.sh [outdir]
# Composed-RPN backward attribution: grow the graph one stage at a time
# to locate the fwd+bwd overhead beyond the per-module sum
# (probe_conv_bwd.py exonerated per-op conv schedules).
# Run only on an idle host core (timing trap: TODO.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpuprobes5}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

run() {
  name=$1; shift
  echo "=== $name: $* (start $(date +%H:%M:%S)) ==="
  timeout 3000 "$@" > "$OUT/$name.log" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S)); tail:"
  tail -4 "$OUT/$name.log"
}

run rpn_compose python scripts/probe_rpn_compose.py
echo "=== all done ==="
