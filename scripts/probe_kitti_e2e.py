"""KITTI-scale (432x496, 1.29M anchors) stage + end-to-end timings on TPU.

bench.py methodology: N iterations inside one jit (scan over an operand
bank), forced with device_get of a scalar, sync baseline subtracted.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/probe_kitti_e2e.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector


def timed(name, fn, operands, iters, sync):
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
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--npts", type=int, default=100000)
    ap.add_argument("--maxpts", type=int, default=None,
                    help="override model.voxel.max_points (the static sort "
                         "length): sizes the voxelizer to the sensor's real "
                         "in-range point count instead of the worst case — "
                         "the bucketed-MAXPTS lever")
    ap.add_argument("--bf16", action="store_true",
                    help="network compute in bfloat16 (decode stays f32)")
    args = ap.parse_args()

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    if args.bf16:
        cfg = cfg.override("runtime.compute_dtype", "bfloat16")
    if args.maxpts:
        cfg = cfg.override("model.voxel.max_points", args.maxpts)
        args.npts = min(args.npts, args.maxpts)
    det = PillarsDetector(cfg)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    thr = cfg.eval_input.anchor_area_threshold
    maxpts = cfg.model.voxel.max_points
    n = args.npts

    rng = np.random.RandomState(0)
    NB = 4
    pts = np.zeros((NB, 1, maxpts, 4), np.float32)
    for c in range(NB):
        pts[c, 0, :n, 0] = rng.uniform(0.0, 69.1, n)
        pts[c, 0, :n, 1] = rng.uniform(-39.6, 39.6, n)
        pts[c, 0, :n, 2] = rng.uniform(-3.0, 1.0, n)
        pts[c, 0, :n, 3] = rng.uniform(0.0, 1.0, n)
    clouds = jnp.asarray(pts)
    num = jnp.full((1,), n, jnp.int32)
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, 1, 1))

    @jax.jit
    def base(x):
        return jnp.sum(x[0, 0, 0])

    _ = jax.device_get(base(clouds))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(base(clouds))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms; npts={n}", flush=True)
    it = args.iters

    # E2E
    def e2e(carry, p):
        voxelized = det.voxelize_batch(p, num)
        amask = det.anchors_mask_batch(voxelized.coords,
                                       voxelized.pillar_mask, thr)
        preds = det.apply(variables, voxelized, train=False)
        out = det.postprocess(preds, amask, eye, eye)
        return carry + jnp.sum(out.scores) + jnp.sum(out.boxes_lidar[..., 0]), None

    timed("E2E (vox+net+post)", e2e, clouds, it, sync)

    # voxelize only
    def vox_only(carry, p):
        v = det.voxelize_batch(p, num)
        return carry + jnp.sum(v.num_points).astype(jnp.float32) + jnp.sum(
            v.points[0, 0]), None

    timed("voxelize", vox_only, clouds, it, sync)

    # network only (voxelized bank precomputed)
    vox_bank = jax.jit(jax.vmap(lambda p: det.voxelize_batch(p, num)))(clouds)

    def net_only(carry, v):
        preds = det.apply(variables, v, train=False)
        return carry + jnp.sum(preds["box_preds"][0, 0, 0]).astype(
            jnp.float32), None

    timed("network (pfn+scatter+rpn)", net_only, vox_bank, it, sync)

    # postprocess only (head bank precomputed)
    pred_bank = jax.jit(jax.vmap(
        lambda v: det.apply(variables, v, train=False)))(vox_bank)
    amask_bank = jax.jit(jax.vmap(
        lambda v: det.anchors_mask_batch(v.coords, v.pillar_mask, thr)))(
            vox_bank)

    def post_only(carry, op):
        preds, am = op
        out = det.postprocess(preds, am, eye, eye)
        return carry + jnp.sum(out.scores), None

    timed("postprocess", post_only, (pred_bank, amask_bank), it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
