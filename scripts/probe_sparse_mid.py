"""Bisect the 163 ms SECOND-sparse network: middle extractor alone vs
RPN alone (probe_sparse_breakdown puts rulebooks+convs at ~50 ms total).

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_sparse_mid.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.models.sparse_middle import SparseMiddleExtractor
from pillars_tpu.models.rpn import RPN


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
    print(f"{name:44s} {ms:8.3f} ms/iter   (compile+1run {compile_s:.1f}s)",
          flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--npts", type=int, default=100000)
    args = ap.parse_args()

    cfg = Config.from_yaml("configs/kitti_second.yaml")
    det = PillarsDetector(cfg)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    maxpts = cfg.model.voxel.max_points
    n = args.npts
    _, ny, nx = cfg.model.feature_map_size

    rng = np.random.RandomState(0)
    NB = 2
    pts = np.zeros((NB, 1, maxpts, 4), np.float32)
    for c in range(NB):
        pts[c, 0, :n, 0] = rng.uniform(0.0, 70.0, n)
        pts[c, 0, :n, 1] = rng.uniform(-40.0, 40.0, n)
        pts[c, 0, :n, 2] = rng.uniform(-3.0, 1.0, n)
        pts[c, 0, :n, 3] = rng.uniform(0.0, 1.0, n)
    clouds = jnp.asarray(pts)
    num = jnp.full((1,), n, jnp.int32)

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
    print(f"sync baseline {sync*1e3:.1f} ms", flush=True)
    it = args.iters

    vox_bank = jax.jit(jax.vmap(lambda p: det.voxelize_batch(p, num)))(clouds)

    mid_vars = {"params": variables["params"]["middle"],
                "batch_stats": variables["batch_stats"].get("middle", {})}
    mid = SparseMiddleExtractor(cfg.model)

    def mean_feats(v):
        vox = v.voxels.reshape(-1, *v.voxels.shape[2:])
        cnt = jnp.maximum(v.num_points.reshape(-1), 1)
        f = jnp.sum(vox, axis=1) / cnt[:, None].astype(vox.dtype)
        return f.reshape(v.voxels.shape[0], v.voxels.shape[1], -1)

    def mid_only(carry, v):
        feats = mean_feats(v)
        canvas = mid.apply(mid_vars, feats, v.coords, v.pillar_mask, False)
        return carry + jnp.sum(canvas[0, 0, 0]).astype(jnp.float32), None

    timed("simple-mean + sparse middle", mid_only, vox_bank, it, sync)

    rpn_vars = {"params": variables["params"]["rpn"],
                "batch_stats": variables["batch_stats"]["rpn"]}
    rpn = RPN(cfg.model)
    cin = len(cfg.model.middle.num_filters) and (
        cfg.model.middle.num_filters[-1])
    # canvas channels = nz_final * C_last; infer from a single apply
    feats0 = mean_feats(jax.tree_util.tree_map(lambda a: a[0], vox_bank))
    v0 = jax.tree_util.tree_map(lambda a: a[0], vox_bank)
    canvas0 = mid.apply(mid_vars, feats0, v0.coords, v0.pillar_mask, False)
    print("canvas shape:", canvas0.shape, flush=True)
    canvas_bank = jnp.asarray(
        rng.randn(NB, *canvas0.shape).astype(np.float32))

    def rpn_only(carry, cv):
        preds = rpn.apply(rpn_vars, cv, False)
        return carry + jnp.sum(preds["box_preds"][0, 0, 0]).astype(
            jnp.float32), None

    timed("rpn (400x352)", rpn_only, canvas_bank, it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
