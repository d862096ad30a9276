"""Second-level bisect of the sparse middle extractor: time the module
with sliced topologies (stage counts, subm counts, vmapped rulebooks) to
find where the composed graph loses ~110 ms vs the component probes.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_sparse_mid2.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.models.sparse_middle import SparseMiddleExtractor
from pillars_tpu.ops import sparse_conv as sp


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


def bank(rng, nb, cfg, npts):
    det = PillarsDetector(cfg)
    maxpts = cfg.model.voxel.max_points
    pts = np.zeros((nb, 1, maxpts, 4), np.float32)
    for c in range(nb):
        pts[c, 0, :npts, 0] = rng.uniform(0.0, 70.0, npts)
        pts[c, 0, :npts, 1] = rng.uniform(-40.0, 40.0, npts)
        pts[c, 0, :npts, 2] = rng.uniform(-3.0, 1.0, npts)
        pts[c, 0, :npts, 3] = rng.uniform(0.0, 1.0, npts)
    num = jnp.full((1,), npts, jnp.int32)
    vb = jax.jit(jax.vmap(
        lambda p: det.voxelize_batch(p, num)))(jnp.asarray(pts))
    return det, vb


def mean_feats(v):
    vox = v.voxels.reshape(-1, *v.voxels.shape[2:])
    cnt = jnp.maximum(v.num_points.reshape(-1), 1)
    f = jnp.sum(vox, axis=1) / cnt[:, None].astype(vox.dtype)
    return f.reshape(v.voxels.shape[0], v.voxels.shape[1], -1)


def time_variant(name, cfg, vb, iters, sync):
    mid = SparseMiddleExtractor(cfg.model)
    v0 = jax.tree_util.tree_map(lambda a: a[0], vb)
    f0 = mean_feats(v0)
    variables = mid.init(jax.random.PRNGKey(0), f0, v0.coords,
                         v0.pillar_mask, False)

    def fn(carry, v):
        canvas = mid.apply(variables, mean_feats(v), v.coords,
                           v.pillar_mask, False)
        return carry + jnp.sum(canvas[0, 0, 0]).astype(jnp.float32), None

    timed(name, fn, vb, iters, sync)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--npts", type=int, default=100000)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    NB = 2

    base_cfg = Config.from_yaml("configs/kitti_second.yaml")
    det, vb = bank(rng, NB, base_cfg, args.npts)

    @jax.jit
    def basef(v):
        return jnp.sum(v.coords[0, 0])

    _ = jax.device_get(basef(vb))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(basef(vb))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms", flush=True)
    it = args.iters

    # vmapped rulebook at full scale (module-style invocation)
    dims = (40, 1600, 1408)

    def vruly(carry, v):
        keys = ((v.coords[..., 0] * dims[1] + v.coords[..., 1]) * dims[2]
                + v.coords[..., 2])
        keys = jnp.where(v.pillar_mask, keys, dims[0] * dims[1] * dims[2])
        nbr = jax.vmap(lambda k, m: sp.neighbor_indices(
            k.astype(jnp.int32), m, dims, (3, 3, 3)))(keys, v.pillar_mask)
        return carry + jnp.sum(nbr[0, :, 0]).astype(jnp.float32), None

    timed("vmapped subm rulebook (full dims)", vruly, vb, it, sync)

    # stage-0-only, no subm convs (entry subm + downsample conv)
    cfg = base_cfg.override("model.middle.num_filters", [16])
    cfg = cfg.override("model.middle.subm_per_stage", 0)
    cfg = cfg.override("model.middle.downsample_strides", [[2, 2, 2]])
    cfg = cfg.override("model.middle.downsample_kernels", [[3, 3, 3]])
    time_variant("stage0 only, subm=0 (entry+down)", cfg, vb, it, sync)

    # stage 0 with 2 subm convs
    cfg = base_cfg.override("model.middle.num_filters", [16])
    cfg = cfg.override("model.middle.downsample_strides", [[2, 2, 2]])
    cfg = cfg.override("model.middle.downsample_kernels", [[3, 3, 3]])
    time_variant("stage0 only, subm=2", cfg, vb, it, sync)

    # two stages
    cfg = base_cfg.override("model.middle.num_filters", [16, 32])
    cfg = cfg.override("model.middle.downsample_strides",
                       [[2, 2, 2], [2, 2, 2]])
    cfg = cfg.override("model.middle.downsample_kernels",
                       [[3, 3, 3], [3, 3, 3]])
    time_variant("stages 0+1, subm=2", cfg, vb, it, sync)

    # full three stages (reference topology)
    time_variant("full 3 stages (as shipped)", base_cfg, vb, it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
