#!/bin/bash
# Phase-7 TPU measurement batch: checkpoint-granularity sweep for the
# HBM-bound RPN backward (probe_rpn_compose2.py).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpuprobes7}
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

run rpn_compose2 python scripts/probe_rpn_compose2.py
echo "=== all done ==="
