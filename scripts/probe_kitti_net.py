"""Break down the KITTI-scale network cost: PFN+scatter vs RPN conv stack.

bench.py methodology. The network measures ~6 ms f32 / ~6 ms bf16 at
~120 GFLOP — nowhere near MXU-bound — so something else dominates; this
probe attributes it.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_kitti_net.py [--bf16]
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
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    if args.bf16:
        cfg = cfg.override("runtime.compute_dtype", "bfloat16")
    det = PillarsDetector(cfg)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    maxpts = cfg.model.voxel.max_points
    n = args.npts
    _, ny, nx = cfg.model.feature_map_size
    F = cfg.model.pfn.num_filters

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
    print(f"sync baseline {sync*1e3:.1f} ms; npts={n} bf16={args.bf16}",
          flush=True)
    it = args.iters

    vox_bank = jax.jit(jax.vmap(lambda p: det.voxelize_batch(p, num)))(clouds)

    # PFN + scatter to canvas only (no RPN): reuse _Network internals by
    # running apply but reducing the canvas via a probe of the RPN input —
    # approximate by calling the pfn/scatter pieces directly
    from pillars_tpu.models.pfn import PointwisePFN
    from pillars_tpu.ops.scatter import scatter_to_canvas_batched

    pfn_vars = {"params": variables["params"]["pfn"],
                "batch_stats": variables["batch_stats"]["pfn"]}
    pfn = PointwisePFN(cfg.model, dtype=det.dtype)

    def pfn_only(carry, v):
        b, p = v.pillar_mask.shape
        flatten = lambda a: a.reshape((b * a.shape[1],) + a.shape[2:])
        pid = v.point_pillar + (jnp.arange(b, dtype=jnp.int32) * p)[:, None]
        feats = pfn.apply(pfn_vars, flatten(v.points), flatten(pid),
                          flatten(v.point_kept), flatten(v.point_mean),
                          flatten(v.point_zyx), flatten(v.num_points),
                          flatten(v.pillar_mask), train=False)
        canvas = scatter_to_canvas_batched(feats.reshape(b, p, -1),
                                           v.coords, v.pillar_mask, ny, nx)
        return carry + jnp.sum(canvas[0, 0, 0]).astype(jnp.float32), None

    timed("pfn+scatter", pfn_only, vox_bank, it, sync)

    # RPN only from a canvas bank
    from pillars_tpu.models.rpn import RPN

    rpn_vars = {"params": variables["params"]["rpn"],
                "batch_stats": variables["batch_stats"]["rpn"]}
    rpn = RPN(cfg.model, dtype=det.dtype)
    canvas_bank = jnp.asarray(
        rng.randn(NB, 1, ny, nx, F).astype(np.float32))
    if args.bf16:
        canvas_bank = canvas_bank.astype(jnp.bfloat16)

    def rpn_only(carry, cv):
        preds = rpn.apply(rpn_vars, cv, False)
        return carry + jnp.sum(preds["box_preds"][0, 0, 0]).astype(
            jnp.float32), None

    timed("rpn", rpn_only, canvas_bank, it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
