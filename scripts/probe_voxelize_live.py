"""Voxelizer cost at KITTI scale with ALL outputs live.

The isolated probe_kitti_e2e.py voxelize number (0.86 ms) was DCE-flattered
— it consumed only a couple of outputs, so XLA dead-code-eliminated most of
the pipeline. This probe forces every VoxelizedPoints leaf live (the e2e
situation: the pointwise PFN consumes points/pillar ids/means, the scatter
consumes coords/mask) and A/Bs the big-grid per-pillar reduction tail
(compaction sort vs three sorted scatters, ops/voxelize.py::_BIG_GRID_TAIL).

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_voxelize_live.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.ops import voxelize as vox


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
    rng = np.random.RandomState(0)
    NB = 4

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    vcfg = cfg.model.voxel
    maxpts = vcfg.max_points
    pts = np.zeros((NB, maxpts, 4), np.float32)
    for c in range(NB):
        pts[c, :args.npts, 0] = rng.uniform(0.0, 69.0, args.npts)
        pts[c, :args.npts, 1] = rng.uniform(-39.0, 39.0, args.npts)
        pts[c, :args.npts, 2] = rng.uniform(-2.9, 0.9, args.npts)
        pts[c, :args.npts, 3] = rng.uniform(0.0, 1.0, args.npts)
    bank = jnp.asarray(pts)
    num = jnp.int32(args.npts)
    kw = dict(voxel_size=vcfg.voxel_size,
              point_cloud_range=vcfg.point_cloud_range,
              grid_size=vcfg.grid_size,
              max_points_per_voxel=vcfg.max_points_per_voxel,
              max_voxels=vcfg.max_voxels)
    print(f"grid={vcfg.grid_size} P={vcfg.max_voxels} maxpts={maxpts}",
          flush=True)

    @jax.jit
    def basef(x):
        return jnp.sum(x[0, 0])

    _ = jax.device_get(basef(bank))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(basef(bank))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms", flush=True)
    it = args.iters

    def all_live(p):
        v = vox.voxelize_points(p, num, **kw)
        acc = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(v):
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        return acc

    def run_variant(tag):
        def fn(carry, p):
            return carry + all_live(p), None
        timed(f"voxelize all-live (tail={tag})", fn, bank, it, sync)

    for tag in ("scatter", "sort"):
        vox._BIG_GRID_TAIL = tag
        run_variant(tag)

    # DCE sanity: what the stale isolated probe effectively measured
    def dce(carry, p):
        v = vox.voxelize_points(p, num, **kw)
        return carry + jnp.sum(v.coords).astype(jnp.float32), None

    vox._BIG_GRID_TAIL = "scatter"
    timed("voxelize coords-only (DCE'd)", dce, bank, it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
