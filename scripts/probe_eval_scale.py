"""Time get_official_eval_result at KITTI-val scale (3,769 frames).

VERDICT round-1 item #4: after vectorizing d3_box_overlap, demonstrate the
eval harness handles full KITTI-val scale in seconds (reference runs this
per-epoch with numba-CUDA rotate IoU + numba-CPU matchers, eval.py:348-422).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_eval_scale.py
"""

import time

import numpy as np

from pillars_tpu.eval import kitti_ap


def make_anno(locs, dims, rots, scores=None, names=None):
    n = len(locs)
    anno = {
        "name": np.array(names if names is not None else ["Pedestrian"] * n),
        "truncated": np.zeros(n),
        "occluded": np.zeros(n, dtype=np.int64),
        "alpha": rots[:, 0] if rots.ndim > 1 else rots,
        "bbox": np.tile([400.0, 200.0, 500.0, 400.0], (n, 1))
        if n else np.zeros((0, 4)),
        "dimensions": dims.reshape(n, 3),
        "location": locs.reshape(n, 3),
        "rotation_y": rots.reshape(n),
    }
    if scores is not None:
        anno["score"] = np.asarray(scores, dtype=np.float64)
    return anno


def main(num_frames=3769, objs_per_frame=30, seed=0):
    rng = np.random.RandomState(seed)
    gt_annos, dt_annos = [], []
    for _ in range(num_frames):
        n = rng.randint(max(1, objs_per_frame - 10), objs_per_frame + 10)
        locs = np.stack([rng.uniform(-20, 20, n), rng.uniform(1, 2, n),
                         rng.uniform(2, 60, n)], axis=1)
        dims = np.tile([0.8, 1.73, 0.6], (n, 1)) * rng.uniform(
            0.9, 1.1, (n, 3))
        rots = rng.uniform(-np.pi, np.pi, n)
        gt_annos.append(make_anno(locs, dims, rots))
        # detections: jittered copies + a few FPs, shuffled scores
        keep = rng.rand(n) > 0.15
        dlocs = locs[keep] + rng.normal(0, 0.08, (keep.sum(), 3))
        ddims = dims[keep] * rng.uniform(0.95, 1.05, (keep.sum(), 3))
        drots = rots[keep] + rng.normal(0, 0.05, keep.sum())
        nfp = rng.randint(0, 6)
        flocs = np.stack([rng.uniform(-20, 20, nfp), rng.uniform(1, 2, nfp),
                          rng.uniform(2, 60, nfp)], axis=1)
        fdims = np.tile([0.8, 1.73, 0.6], (nfp, 1))
        frots = rng.uniform(-np.pi, np.pi, nfp)
        allloc = np.concatenate([dlocs, flocs])
        alldim = np.concatenate([ddims, fdims])
        allrot = np.concatenate([drots, frots])
        scores = np.concatenate([rng.uniform(0.5, 1.0, keep.sum()),
                                 rng.uniform(0.0, 0.6, nfp)])
        dt_annos.append(make_anno(allloc, alldim, allrot, scores=scores))

    n_gt = sum(len(a["name"]) for a in gt_annos)
    n_dt = sum(len(a["name"]) for a in dt_annos)
    print(f"frames={num_frames} gt={n_gt} dt={n_dt}")

    t0 = time.perf_counter()
    result_str, aps, bev, d3, aos = kitti_ap.get_official_eval_result(
        gt_annos, dt_annos, ["Pedestrian"], compute_bbox=False)
    t1 = time.perf_counter()
    print(f"get_official_eval_result: {t1 - t0:.2f} s "
          f"({num_frames / (t1 - t0):.0f} frames/s)")
    print(f"sample APs: bev@0.5 d0={bev[0, 0, 0]:.2f} "
          f"3d@0.5 d0={d3[0, 0, 0]:.2f} aos@0.5 d0={aos[0, 0, 0]:.2f}")


if __name__ == "__main__":
    main()
