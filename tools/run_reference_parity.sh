#!/usr/bin/env bash
# Turnkey reference-parity runbook (VERDICT r3 #7).
#
# On a machine that can execute the REFERENCE stack (TF 2.2 + numba, see
# pinned versions below) AND has the genuine checkpoint, this script runs
# the full capture -> diff pipeline in one command:
#
#   tools/run_reference_parity.sh \
#       --reference /path/to/3D-Object-Detection-for-autonomous-navigation \
#       --weights   out/model_345/out_dir_checkpoints/model_weights_48.h5 \
#       --cloud     /path/to/cloud.npy        # [N,3|4] lidar frame
#
# Steps it performs:
#   1. capture: tools/capture_reference_activations.py runs the reference
#      forward pass (reference train.py:719-738 load path,
#      model/voxelnet.py:850-905 stage boundaries) and dumps every stage
#      to one npz.
#   2. diff: tests/test_reference_parity.py drives the SAME cloud through
#      pillars_tpu — with the SAME weights via import_reference_h5 when
#      --weights is given — and diffs voxelization / heads / decode stage
#      by stage (pillar order aligned by coordinates).
#   3. h5 round-trip: tests/test_h5_import.py validates the importer's
#      structural matching + Conv2DTranspose orientation resolution.
#
# Reference environment pins (configs/pip/requirements_short.txt in the
# reference repo): python 3.6.9, tensorflow==2.2.0,
# tensorflow-addons==0.11.2, numba==0.51.2, h5py==2.10.0, numpy==1.19.4.
# Step 1 must run under THAT interpreter (set $REF_PYTHON); steps 2-3 run
# under this repo's jax environment (default: python).
#
# --dry-run exercises the whole machinery WITHOUT the reference artifacts
# (this image cannot execute TF2 + numba-CUDA, and the shipped .h5 is
# stripped): it builds a self-check npz from OUR OWN graph and runs the
# same alignment/diff code path plus the h5 import round-trip, proving
# the runbook executes end to end before first contact with a genuine
# checkpoint.
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
REF_PYTHON="${REF_PYTHON:-python}"   # interpreter with TF 2.2 + numba
PYTHON="${PYTHON:-python}"           # interpreter with jax + pillars_tpu

REFERENCE="" WEIGHTS="" CLOUD="" WORKDIR="${WORKDIR:-/tmp/pillars_parity}"
DRY_RUN=0

while [[ $# -gt 0 ]]; do
  case "$1" in
    --reference) REFERENCE="$2"; shift 2 ;;
    --weights)   WEIGHTS="$2";   shift 2 ;;
    --cloud)     CLOUD="$2";     shift 2 ;;
    --workdir)   WORKDIR="$2";   shift 2 ;;
    --dry-run)   DRY_RUN=1;      shift ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

mkdir -p "$WORKDIR"

if [[ "$DRY_RUN" == 1 ]]; then
  echo "== [dry-run] building a self-check npz from our own graph =="
  NPZ="$WORKDIR/selfcheck_activations.npz"
  "$PYTHON" - "$NPZ" <<'EOF'
import sys

import numpy as np

import jax

# host-side capture: force CPU so the dry run neither waits minutes on a
# remote TPU compile nor contends with a live benchmark (this image's
# sitecustomize pre-registers the TPU plugin; env vars are too late)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector

out = sys.argv[1]
cfg = Config.default()
cfg = cfg.override("model.voxel.max_voxels", 2048)
cfg = cfg.override("model.voxel.max_points", 8192)
det = PillarsDetector(cfg)
variables = det.init(jax.random.PRNGKey(3), batch_size=1)
rng = np.random.RandomState(11)
n = 3000
pts = np.zeros((8192, 3), np.float32)
pts[:n, 0] = rng.uniform(0.3, 6.2, n)
pts[:n, 1] = rng.uniform(-2.4, 2.4, n)
pts[:n, 2] = rng.uniform(-2.5, 0.5, n)
vox = jax.jit(det.voxelize_batch)(jnp.asarray(pts[None]),
                                  jnp.asarray([n], jnp.int32))
preds = jax.jit(lambda v: det.apply(variables, v, train=False))(vox)
mask = np.asarray(vox.pillar_mask[0])
perm = rng.permutation(mask.sum())  # reference emits arrival order
np.savez(out, points=pts,
         coors=np.asarray(vox.coords[0])[mask][perm],
         num_points=np.asarray(vox.num_points[0])[mask][perm],
         box_preds=np.asarray(preds["box_preds"]),
         cls_preds=np.asarray(preds["cls_preds"]),
         dir_cls_preds=np.asarray(preds["dir_cls_preds"]))
print(f"self-check npz -> {out}")
EOF
  echo "== [dry-run] running the parity machinery + h5 round-trip =="
  (cd "$REPO_DIR" && "$PYTHON" -m pytest \
      tests/test_reference_parity.py tests/test_h5_import.py -q)
  echo "== [dry-run] OK: capture->align->diff machinery and the h5"
  echo "   importer both execute in this environment. On a reference-"
  echo "   capable machine, re-run without --dry-run and with"
  echo "   --reference/--weights/--cloud to diff the genuine model."
  exit 0
fi

[[ -n "$REFERENCE" && -n "$WEIGHTS" && -n "$CLOUD" ]] || {
  echo "usage: $0 --reference DIR --weights H5 --cloud NPY [--workdir DIR]" >&2
  echo "       $0 --dry-run" >&2
  exit 2
}

NPZ="$WORKDIR/reference_activations.npz"
echo "== step 1/3: capturing reference activations (TF env: $REF_PYTHON) =="
"$REF_PYTHON" "$REPO_DIR/tools/capture_reference_activations.py" \
    --reference "$REFERENCE" --weights "$WEIGHTS" --cloud "$CLOUD" \
    --out "$NPZ"

echo "== step 2/3: stage-by-stage diff against pillars_tpu =="
(cd "$REPO_DIR" && \
 PILLARS_REF_ACTIVATIONS="$NPZ" \
 PILLARS_REF_H5="$REFERENCE/$WEIGHTS" \
 "$PYTHON" -m pytest tests/test_reference_parity.py -q)

echo "== step 3/3: h5 importer round-trip suite =="
(cd "$REPO_DIR" && "$PYTHON" -m pytest tests/test_h5_import.py -q)

echo "== parity runbook complete: activations at $NPZ =="
