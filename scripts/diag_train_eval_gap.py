"""Locate the kitti3 train/eval detection gap: augmented vs raw scenes.

Round-5 follow-up to diag_bn_eval_gap.py: train loss says positives score
~0.5 on (augmented, sampler-pasted) train batches while eval on raw
scenes matches ~4% of GT. This runs the SAME checkpoint + SAME inference
graph over (a) augmented train batches, scored against their own
augmented gt_boxes, and (b) raw train scenes against raw GT, plus (c)
raw scenes with AdaBN-recalibrated stats. Whichever side the quality
collapses on names the culprit: paste/augmentation reliance (a >> b) vs
uniform undertraining (a ~ b, both low).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
  python scripts/diag_train_eval_gap.py <checkpoint.pkl> [n_batches]
"""

import json
import sys

import numpy as np


def match_stats(pred, gt_boxes, gt_valid, radius=2.0):
    """pred: Predictions (host), gt [B, G, 7] lidar. Returns per-GT
    nearest-det distance/score aggregates in the lidar BEV plane."""
    dists, scores, matched, total = [], [], 0, 0
    B = gt_boxes.shape[0]
    for b in range(B):
        g = gt_boxes[b][gt_valid[b]]
        d = pred.boxes_lidar[b][np.asarray(pred.valid[b])]
        s = pred.scores[b][np.asarray(pred.valid[b])]
        total += len(g)
        if len(g) == 0 or len(d) == 0:
            continue
        dd = np.sqrt(((d[:, None, :2] - g[None, :, :2]) ** 2).sum(-1))
        nearest = dd.min(axis=0)          # per-GT nearest det
        idx = dd.argmin(axis=0)
        dists += list(nearest)
        scores += list(s[idx])
        matched += int((nearest <= radius).sum())
    return {"gt_matched_frac": round(matched / max(total, 1), 4),
            "nearest_dist_med": round(float(np.median(dists)), 2) if dists else -1,
            "nearest_score_med": round(float(np.median(scores)), 3) if scores else -1,
            "nearest_score_p90": round(float(np.percentile(scores, 90)), 3) if scores else -1,
            "n_gt": total}


def main():
    ckpt_path = sys.argv[1]
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pillars_tpu.config import Config
    from pillars_tpu.data.pipeline import BatchIterator, PedestrianDataset
    from pillars_tpu.data.sampler import DataBaseSampler
    from pillars_tpu.models.detector import PillarsDetector
    from pillars_tpu.train import checkpoint as ckpt
    from pillars_tpu.train.bn_recal import recalibrate
    from pillars_tpu.utils.compile_cache import set_compile_cache

    set_compile_cache()
    import jax

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    for k, v in [("train_input.dataset_root", "/tmp/kitti3_data"),
                 ("train_input.info_path",
                  "/tmp/kitti3_data/kitti_infos_train.pkl"),
                 ("train_input.sampler.info_path",
                  "/tmp/kitti3_data/kitti_dbinfos_train.pkl")]:
        cfg = cfg.override(k, v)
    det = PillarsDetector(cfg)
    state, extra = ckpt.load_checkpoint(ckpt_path)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print(f"checkpoint extra: {extra}")
    infer = det.make_inference_fn(cfg.train_input.anchor_area_threshold)
    eye = lambda B: np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))

    sampler = DataBaseSampler(cfg.train_input.sampler.info_path,
                              cfg.train_input.sampler)
    modes = [
        ("aug_train_batches", PedestrianDataset(
            cfg, cfg.train_input, training=True, sampler=sampler,
            rng=np.random.RandomState(123)), variables),
        ("raw_train_scenes", PedestrianDataset(
            cfg, cfg.train_input, training=False), variables),
    ]
    raw_batches = []
    for name, ds, var in modes:
        it = BatchIterator(ds, cfg.train_input.batch_size, shuffle=False,
                           num_workers=1, drop_remainder=True)
        agg = []
        for i, b in enumerate(it):
            if i >= nb:
                break
            if name == "raw_train_scenes":
                raw_batches.append({"points": np.asarray(b["points"]),
                                    "num_points": np.asarray(b["num_points"])})
            B = b["points"].shape[0]
            pred = jax.device_get(infer(var, b["points"], b["num_points"],
                                        eye(B), eye(B)))
            agg.append(match_stats(pred, np.asarray(b["gt_boxes"]),
                                   np.asarray(b["gt_valid"])))
        tot = {k: round(float(np.mean([a[k] for a in agg])), 4)
               for k in agg[0]}
        print(json.dumps({"mode": name, **tot}))

    # (c) raw scenes through AdaBN-recalibrated stats
    var2 = recalibrate(cfg, variables, raw_batches)
    ds = PedestrianDataset(cfg, cfg.train_input, training=False)
    it = BatchIterator(ds, cfg.train_input.batch_size, shuffle=False,
                       num_workers=1, drop_remainder=True)
    agg = []
    for i, b in enumerate(it):
        if i >= nb:
            break
        B = b["points"].shape[0]
        pred = jax.device_get(infer(var2, b["points"], b["num_points"],
                                    eye(B), eye(B)))
        agg.append(match_stats(pred, np.asarray(b["gt_boxes"]),
                               np.asarray(b["gt_valid"])))
    tot = {k: round(float(np.mean([a[k] for a in agg])), 4) for k in agg[0]}
    print(json.dumps({"mode": "raw_scenes_recal_bn", **tot}))


if __name__ == "__main__":
    main()
