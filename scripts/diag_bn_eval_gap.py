"""Diagnose train-mode vs eval-mode BatchNorm divergence on a checkpoint.

Round-5 kitti3 observation: train loss converges (cls 0.12, loc 0.33 at
epoch 16) while eval-path detections sit ~10 m from GT with near-threshold
scores — the classic symptom of BN running statistics diverging from the
batch statistics the loss was computed with. This runs the SAME val
scenes through the network twice — use_running_average=True (the eval
path) and False (the train-step's normalization) — and compares the
resulting detection quality. A large gap implicates BN stats; no gap
clears them.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
  python scripts/diag_bn_eval_gap.py <checkpoint.pkl> [n_scenes]
"""

import json
import sys

import numpy as np


def main():
    ckpt_path = sys.argv[1]
    n_scenes = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pillars_tpu.config import Config
    from pillars_tpu.data.pipeline import BatchIterator, PedestrianDataset
    from pillars_tpu.eval.predict_to_anno import (infos_to_gt_annos,
                                                  predictions_to_annos)
    from pillars_tpu.eval.proxies import detection_quality_proxies
    from pillars_tpu.models.detector import PillarsDetector
    from pillars_tpu.train import checkpoint as ckpt
    from pillars_tpu.utils.compile_cache import set_compile_cache

    set_compile_cache()
    import jax

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    for k, v in [("eval_input.dataset_root", "/tmp/kitti3_data"),
                 ("eval_input.info_path",
                  "/tmp/kitti3_data/kitti_infos_val.pkl")]:
        cfg = cfg.override(k, v)
    det = PillarsDetector(cfg)
    state, extra = ckpt.load_checkpoint(ckpt_path)
    variables = ({"params": state["params"],
                  "batch_stats": state.get("batch_stats")}
                 if isinstance(state, dict)
                 else {"params": state.params,
                       "batch_stats": state.batch_stats})
    print(f"checkpoint extra: {extra}")

    thr = cfg.eval_input.anchor_area_threshold

    def make_fn(train_mode):
        def fn(variables, points, num_valid, rect, trv2c):
            voxelized = det.voxelize_batch(points, num_valid)
            amask = det.anchors_mask_batch(
                voxelized.coords, voxelized.pillar_mask, thr)
            if train_mode:
                # batch statistics, like the fused train step's forward;
                # mutated batch_stats are discarded
                preds, _ = det.network.apply(
                    variables, voxelized, True, mutable=["batch_stats"])
            else:
                preds = det.apply(variables, voxelized, train=False)
            return det.postprocess(preds, amask, rect, trv2c)
        return jax.jit(fn)

    ds = PedestrianDataset(cfg, cfg.eval_input, training=False)
    it = BatchIterator(ds, cfg.eval_input.batch_size, shuffle=False,
                       num_workers=1, drop_remainder=False)
    gt_annos = infos_to_gt_annos(ds.infos)[:n_scenes]
    for mode, train_mode in [("eval_bn_running", False),
                             ("train_bn_batch", True)]:
        fn = make_fn(train_mode)
        dt_annos = []
        count = 0
        for batch in it:
            preds = jax.device_get(fn(
                variables, batch["points"], batch["num_points"],
                batch["rect"], batch["trv2c"]))
            dt_annos += predictions_to_annos(
                preds, batch["image_idx"], list(cfg.eval_input.desired_objects),
                cfg.model.postprocess.post_center_limit_range)
            count += batch["points"].shape[0]
            if count >= n_scenes:
                break
        p = detection_quality_proxies(dt_annos[:n_scenes], gt_annos)
        scores = np.concatenate([np.asarray(d["score"]).ravel()
                                 for d in dt_annos[:n_scenes]]
                                or [np.zeros(0)])
        p["score_max"] = float(scores.max()) if scores.size else 0.0
        p["score_p90"] = (float(np.percentile(scores, 90))
                          if scores.size else 0.0)
        print(json.dumps({"mode": mode,
                          **{k: round(v, 4) for k, v in p.items()}}))


if __name__ == "__main__":
    main()
