"""Bisect the KITTI-scale (1.29M-anchor) postprocess on the TPU.

Times each sub-stage of PillarsDetector.postprocess + anchors mask in its own
jitted scan loop (bench.py methodology: N iterations inside one jit, inputs
as scan operands, forced with device_get of a scalar, sync baseline
subtracted). Run under nohup — each graph costs a multi-minute remote
compile.

Usage: python scripts/probe_kitti_post.py [--iters 32]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.geometry import boxes as gb
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.ops.nms import nms_standup, _pixel_iou_matrix


def timed(name, fn, operands, iters, sync):
    """fn(carry, operand) -> carry; operands: pytree with leading [n]."""
    n = jax.tree_util.tree_leaves(operands)[0].shape[0]

    @jax.jit
    def run(ops, reps):
        def outer(i, acc):
            acc2, _ = jax.lax.scan(fn, acc, ops)
            return acc2
        return jax.lax.fori_loop(0, reps, outer, 0.0)

    t0 = time.perf_counter()
    _ = jax.device_get(run(operands, 1))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = jax.device_get(run(operands, iters))
    total = time.perf_counter() - t0
    ms = (total - sync) * 1e3 / (n * iters)
    print(f"{name:40s} {ms:8.3f} ms/iter   (compile+1run {compile_s:.1f}s)",
          flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    det = PillarsDetector(cfg)
    pp = cfg.model.postprocess
    A = det.anchor_set.anchors.shape[0]
    ny, nx = det.ny, det.nx
    C = cfg.model.num_class
    print(f"anchors={A} grid=({ny},{nx}) classes={C} "
          f"pre={pp.nms_pre_max_size} post={pp.nms_post_max_size}",
          flush=True)

    rng = np.random.RandomState(0)
    NB = 4  # operand bank size
    # raw head outputs, NHWC bf16 exactly as the RPN emits them
    box_nhwc = jnp.asarray(rng.randn(NB, 1, ny, nx, 6 * 7), jnp.bfloat16)
    cls_nhwc = jnp.asarray(rng.randn(NB, 1, ny, nx, 6 * C), jnp.bfloat16)
    dir_nhwc = jnp.asarray(rng.randn(NB, 1, ny, nx, 6 * 2), jnp.bfloat16)
    # dense pillar-count grid for the anchors mask
    dense = jnp.asarray((rng.rand(NB, 1, ny, nx) > 0.9).astype(np.float32))
    amask_bank = jnp.asarray(rng.rand(NB, 1, A) > 0.5)
    # pre-top-k stand-ins
    scores_bank = jnp.asarray(rng.rand(NB, 1, A), jnp.float32)
    idx_bank = jnp.asarray(
        rng.randint(0, A, (NB, 1, pp.nms_pre_max_size)), jnp.int32)
    # NMS-only stand-ins
    k = pp.nms_pre_max_size
    ctr = rng.rand(NB, 1, k, 2) * 30
    wh = rng.rand(NB, 1, k, 2) * 4 + 0.5
    standup_bank = jnp.asarray(
        np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=-1), jnp.float32)
    topscore_bank = jnp.asarray(-np.sort(-rng.rand(NB, 1, k)), jnp.float32)

    eye = jnp.eye(4, dtype=jnp.float32)[None]
    anchors = jnp.asarray(det.anchor_set.anchors)
    sat_corners = jnp.asarray(det.anchor_set.sat_corners)
    thr = cfg.eval_input.anchor_area_threshold

    # sync baseline
    @jax.jit
    def base(x):
        return jnp.sum(x[0, 0, 0, 0])

    _ = jax.device_get(base(box_nhwc))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(base(box_nhwc))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms", flush=True)
    it = args.iters

    # ---- P1: full postprocess + amask from dense grid -------------------
    from pillars_tpu.ops.anchors import anchors_mask_from_dense

    def full(carry, op):
        bx, cl, dr, dn = op
        am = jax.vmap(lambda d: anchors_mask_from_dense(
            d, sat_corners, thr,
            structured=det.anchor_set.sat_structured))(dn)
        preds = {"box_preds": bx, "cls_preds": cl, "dir_cls_preds": dr}
        out = det.postprocess(preds, am, eye, eye)
        return carry + jnp.sum(out.scores) + jnp.sum(out.boxes_lidar[..., 0]), None

    timed("P1 full post+amask", full,
          (box_nhwc, cls_nhwc, dir_nhwc, dense), it, sync)

    # ---- P2: anchors mask only ------------------------------------------
    def amask_only(carry, dn):
        am = jax.vmap(lambda d: anchors_mask_from_dense(
            d, sat_corners, thr,
            structured=det.anchor_set.sat_structured))(dn)
        return carry + jnp.sum(am.astype(jnp.float32)), None

    timed("P2 amask(structured SAT)", amask_only, dense, it, sync)

    def amask_gather(carry, dn):
        am = jax.vmap(lambda d: anchors_mask_from_dense(
            d, sat_corners, thr, structured=None))(dn)
        return carry + jnp.sum(am.astype(jnp.float32)), None

    timed("P2b amask(gather SAT)", amask_gather, dense, it, sync)

    # ---- P3: score chain (reshape/astype/sigmoid/max/where) + top_k -----
    def score_topk(carry, op):
        cl, am = op
        cls_p = cl.reshape(1, -1, C).astype(jnp.float32)

        def one(cp, m):
            scores = jnp.max(jax.nn.sigmoid(cp), axis=-1)
            ms = jnp.where(m, scores, -jnp.inf)
            ts, ti = jax.lax.top_k(ms, k)
            return jnp.sum(ts) + jnp.sum(ti)

        return carry + jnp.sum(jax.vmap(one)(cls_p, am)), None

    timed("P3 scores+mask+top_k", score_topk, (cls_nhwc, amask_bank), it, sync)

    # ---- P3b: same without top_k ----------------------------------------
    def score_only(carry, op):
        cl, am = op
        cls_p = cl.reshape(1, -1, C).astype(jnp.float32)

        def one(cp, m):
            scores = jnp.max(jax.nn.sigmoid(cp), axis=-1)
            lab = jnp.argmax(cp, axis=-1)
            ms = jnp.where(m, scores, -jnp.inf)
            return jnp.sum(ms * 1e-6) + jnp.sum(lab)

        return carry + jnp.sum(jax.vmap(one)(cls_p, am)), None

    timed("P3b scores no top_k", score_only, (cls_nhwc, amask_bank), it, sync)

    # ---- P4: post-top-k gathers + decode + corners + standup ------------
    def gather_decode(carry, op):
        bx, ti = op
        box_p = bx.reshape(1, -1, 7).astype(jnp.float32)

        def one(bp, idx):
            sel_box = bp[idx]
            sel_anchor = anchors[idx]
            dec = gb.second_box_decode(sel_box, sel_anchor)
            bev = dec[:, jnp.array([0, 1, 3, 4, 6])]
            corners = gb.center_to_corner_box2d(bev[:, :2], bev[:, 2:4],
                                                bev[:, 4])
            return jnp.sum(gb.corner_to_standup(corners))

        return carry + jnp.sum(jax.vmap(one)(box_p, ti)), None

    timed("P4 gather+decode+corners", gather_decode,
          (box_nhwc, idx_bank), it, sync)

    # ---- P5: NMS only (lax) at k=pre ------------------------------------
    def nms_lax(carry, op):
        su, sc = op

        def one(s4, s1):
            ki, kv = nms_standup(s4, s1, jnp.ones((k,), bool),
                                 pp.nms_iou_threshold, pp.nms_post_max_size,
                                 use_pallas=False)
            return jnp.sum(ki) + jnp.sum(kv)

        return carry + jnp.sum(jax.vmap(one)(su, sc)).astype(jnp.float32), None

    timed(f"P5 NMS lax k={k}", nms_lax, (standup_bank, topscore_bank),
          it, sync)

    # ---- P5b: NMS only (pallas) ------------------------------------------
    if jax.default_backend() not in ("cpu", "gpu"):
        def nms_pal(carry, op):
            su, sc = op

            def one(s4, s1):
                ki, kv = nms_standup(s4, s1, jnp.ones((k,), bool),
                                     pp.nms_iou_threshold,
                                     pp.nms_post_max_size, use_pallas=True)
                return jnp.sum(ki) + jnp.sum(kv)

            return (carry
                    + jnp.sum(jax.vmap(one)(su, sc)).astype(jnp.float32)), None

        timed(f"P5b NMS pallas k={k}", nms_pal,
              (standup_bank, topscore_bank), it, sync)

    # ---- P6: iou matrix alone at k --------------------------------------
    def iou_only(carry, su):
        return carry + jnp.sum(_pixel_iou_matrix(su[0])), None

    timed(f"P6 IoU matrix k={k}", iou_only, standup_bank, it, sync)

    print("done", flush=True)


if __name__ == "__main__":
    main()
