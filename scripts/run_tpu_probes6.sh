#!/bin/bash
# Phase-6 TPU measurement batch:
#   bash scripts/run_tpu_probes6.sh [outdir]
# Follow-up to probe_rpn_compose.py's finding that remat SPEEDS UP the
# composed RPN fwd+bwd (93.2 -> 78.3 ms at B=2 f32: the graph is
# HBM-bound on activation traffic, recompute beats store): measure the
# FULL fused train step with remat at B=2 (only B=8+bf16+remat was
# previously measured). Run only on an idle host core (TODO.md trap).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpuprobes6}
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

run train_remat_f32_b2   python scripts/probe_kitti_train.py --remat
run train_remat_bf16_b2  python scripts/probe_kitti_train.py --remat --bf16
echo "=== all done ==="
