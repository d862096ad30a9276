"""Harvest the kitti3 3-class training run into benchmarks/kitti3_synth/.

Copies the best-epoch artifacts (the hard_synth anchor treatment,
benchmarks/hard_synth/README.md) from a live/finished run dir:
  - model_result_{best}.txt   (6-threshold BEV/3D/AOS matrix, 3 classes)
  - weights_{best}.pkl        (full TrainState checkpoint)
  - train.yaml                (archived run config)
  - metrics.csv               (per-step loss + per-epoch eval scalars)
and prints the per-epoch aggregate-score trajectory for the README.

Usage: python scripts/harvest_kitti3_anchor.py [run_dir] [dest]
"""

import glob
import os
import re
import shutil
import sys


def main():
    run = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kitti3_runs/model_400"
    dest = sys.argv[2] if len(sys.argv) > 2 else "benchmarks/kitti3_synth"

    # per-epoch scores from the eval rows of metrics.csv (or stdout log)
    ckpts = sorted(
        glob.glob(os.path.join(run, "checkpoints", "weights_*.pkl")))
    ckpts = [c for c in ckpts if "temp" not in c]
    if not ckpts:
        raise SystemExit(f"no gated checkpoints in {run}/checkpoints")
    best = max(int(re.search(r"weights_(\d+)\.pkl", c).group(1))
               for c in ckpts)
    result = os.path.join(run, "results", f"model_result_{best}.txt")
    if not os.path.exists(result):
        raise SystemExit(f"missing {result}")

    os.makedirs(dest, exist_ok=True)
    shutil.copy(result, os.path.join(dest, f"model_result_{best}.txt"))
    shutil.copy(os.path.join(run, "checkpoints", f"weights_{best}.pkl"),
                os.path.join(dest, f"weights_{best}.pkl"))
    shutil.copy(os.path.join(run, "train.yaml"),
                os.path.join(dest, "train.yaml"))
    csvs = glob.glob(os.path.join(run, "logs", "*.csv"))
    if csvs:
        shutil.copy(csvs[0], os.path.join(dest, "metrics.csv"))

    print(f"best epoch: {best}")
    print(open(result).read())


if __name__ == "__main__":
    main()
