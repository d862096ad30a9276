"""Harvest the kitti3 3-class training run into benchmarks/kitti3_synth/.

Copies the best-epoch artifacts (the hard_synth anchor treatment,
benchmarks/hard_synth/README.md) from a live/finished run dir:
  - model_result_{epoch}.txt  (6-threshold BEV/3D/AOS matrix, 3 classes)
  - weights_{epoch}.pkl       (full TrainState checkpoint; a temp-
                               fallback harvest of an unconverged run is
                               named weights_wip.pkl instead, the name
                               the README's resume runbook references)
and the archived train.yaml + metrics.csv, then prints the harvested
result matrix.

Checkpoint selection: prefer the newest score-gated weights_{epoch}.pkl
(trainer only writes those when the aggregate eval score improves,
trainer.py::_eval_and_gate); while every eval score is still 0.00 —
the pre-liftoff regime this anchor lived in for 20 epochs — no gated
checkpoint exists, so fall back to weights_temp.pkl (always rewritten
after each epoch's gating, carrying the epoch in its ``extra`` dict).

Usage: python scripts/harvest_kitti3_anchor.py [run_dir] [dest]
"""

import glob
import os
import re
import shutil
import sys


def pick_checkpoint(run):
    """Returns (ckpt_path, epoch). Gated best if present, else temp."""
    ckpts = [c for c in glob.glob(
        os.path.join(run, "checkpoints", "weights_*.pkl"))
        if "temp" not in c]
    if ckpts:
        best = max(int(re.search(r"weights_(\d+)\.pkl", c).group(1))
                   for c in ckpts)
        return os.path.join(run, "checkpoints",
                            f"weights_{best}.pkl"), best
    temp = os.path.join(run, "checkpoints", "weights_temp.pkl")
    if not os.path.exists(temp):
        raise SystemExit(f"no checkpoints at all in {run}/checkpoints")
    from pillars_tpu.train.checkpoint import load_checkpoint

    _, extra = load_checkpoint(temp)
    epoch = int(extra.get("epoch", -1))
    if epoch < 0:
        raise SystemExit(f"{temp} carries no epoch in its extra dict")
    print(f"[harvest] no score-gated checkpoint (all eval scores 0.00?); "
          f"falling back to weights_temp.pkl (epoch {epoch})")
    return temp, epoch


def main():
    run = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kitti3_runs/model_400"
    dest = sys.argv[2] if len(sys.argv) > 2 else "benchmarks/kitti3_synth"

    ckpt, epoch = pick_checkpoint(run)
    out_name = ("weights_wip.pkl" if ckpt.endswith("weights_temp.pkl")
                else f"weights_{epoch}.pkl")
    result = os.path.join(run, "results", f"model_result_{epoch}.txt")
    if not os.path.exists(result):
        # temp checkpoints are written BEFORE the epoch's eval; if the run
        # died mid-eval the latest result file is the previous epoch's
        older = sorted(glob.glob(
            os.path.join(run, "results", "model_result_*.txt")),
            key=lambda p: int(re.search(r"_(\d+)\.txt", p).group(1)))
        if not older:
            raise SystemExit(f"missing {result} and no earlier results")
        result = older[-1]
        print(f"[harvest] {os.path.basename(result)} is the newest "
              f"result on disk (epoch {epoch} eval did not finish)")

    os.makedirs(dest, exist_ok=True)
    shutil.copy(result, os.path.join(dest, os.path.basename(result)))
    shutil.copy(ckpt, os.path.join(dest, out_name))
    shutil.copy(os.path.join(run, "train.yaml"),
                os.path.join(dest, "train.yaml"))
    csvs = glob.glob(os.path.join(run, "logs", "*.csv"))
    if csvs:
        shutil.copy(csvs[0], os.path.join(dest, "metrics.csv"))

    print(f"harvested epoch {epoch} ({os.path.basename(ckpt)}) -> {dest}")
    print(open(result).read())


if __name__ == "__main__":
    main()
