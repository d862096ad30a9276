"""Attribute the KITTI-scale fused-graph overhead: stage-pair timings.

probe_kitti_e2e found E2E (22.2 ms) >> sum of isolated stages (14.4 ms);
this probe times fused PAIRS to locate the boundary that loses the ~8 ms.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_fuse.py
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
    print(f"{name:44s} {ms:8.3f} ms/iter   (compile+1run {compile_s:.1f}s)",
          flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--npts", type=int, default=100000)
    args = ap.parse_args()

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
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

    def reduce_tree(v):
        return sum(jnp.sum(x).astype(jnp.float32)
                   for x in jax.tree_util.tree_leaves(v))

    # vox + net (no post)
    def vox_net(carry, p):
        v = det.voxelize_batch(p, num)
        preds = det.apply(variables, v, train=False)
        return carry + jnp.sum(preds["box_preds"][0, 0, 0]).astype(
            jnp.float32), None

    timed("vox+net", vox_net, clouds, it, sync)

    # net + post from precomputed voxel bank
    vox_bank = jax.jit(jax.vmap(lambda p: det.voxelize_batch(p, num)))(clouds)

    def net_post(carry, v):
        amask = det.anchors_mask_batch(v.coords, v.pillar_mask, thr)
        preds = det.apply(variables, v, train=False)
        out = det.postprocess(preds, amask, eye, eye)
        return carry + jnp.sum(out.scores), None

    timed("net+mask+post", net_post, vox_bank, it, sync)

    # same, with an optimization barrier between net and post: tests
    # whether the conv-output layouts leaking into the postprocess chain
    # explain the fused-vs-isolated post gap
    def net_post_barrier(carry, v):
        amask = det.anchors_mask_batch(v.coords, v.pillar_mask, thr)
        preds = det.apply(variables, v, train=False)
        preds = jax.lax.optimization_barrier(preds)
        out = det.postprocess(preds, amask, eye, eye)
        return carry + jnp.sum(out.scores), None

    timed("net+mask+post (barrier)", net_post_barrier, vox_bank, it, sync)

    # vox alone but reducing ALL outputs (rules out dead-code elimination
    # making the isolated vox number look too good)
    def vox_all(carry, p):
        v = det.voxelize_batch(p, num)
        return carry + reduce_tree(v), None

    timed("vox (all outputs live)", vox_all, clouds, it, sync)

    print("done", flush=True)


if __name__ == "__main__":
    main()
