#!/bin/bash
# Round-3 TPU measurement batch: the bucketed-MAXPTS lever on the KITTI
# e2e graph (VERDICT r2 next #7). The voxelizer's dominant cost is the
# sort over the static max_points axis; real sensors fill a fraction of
# the 131k worst case, so sizing the bucket to the cloud should shrink
# the 3.26 ms voxelize stage superlinearly-to-linearly.
#   bash scripts/run_tpu_probes8.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpuprobes8}
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

# baseline re-measure at the full 131k bucket
run kitti_maxpts_131k python scripts/probe_kitti_e2e.py --iters 16 \
    --npts 100000
# 64k bucket, cloud still 60k points (realistic post-range-filter KITTI)
run kitti_maxpts_64k python scripts/probe_kitti_e2e.py --iters 16 \
    --npts 60000 --maxpts 65536
# 32k bucket (dense-enough sweep for most frames after range filtering)
run kitti_maxpts_32k python scripts/probe_kitti_e2e.py --iters 16 \
    --npts 30000 --maxpts 32768
echo "=== done ==="
