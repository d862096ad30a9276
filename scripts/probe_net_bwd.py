"""Attribute the 108 ms network backward at KITTI scale: PFN+scatter bwd
vs RPN bwd (forward is ~13 ms at B=2).

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_net_bwd.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.models.pfn import PointwisePFN
from pillars_tpu.models.rpn import RPN
from pillars_tpu.ops.scatter import scatter_to_canvas_batched


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
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    det = PillarsDetector(cfg)
    B = args.batch
    variables = det.init(jax.random.PRNGKey(0), batch_size=B)
    maxpts = cfg.model.voxel.max_points
    n = args.npts
    _, ny, nx = cfg.model.feature_map_size
    F = cfg.model.pfn.num_filters

    rng = np.random.RandomState(0)
    NB = 2
    pts = np.zeros((NB, B, maxpts, 4), np.float32)
    for c in range(NB):
        for b in range(B):
            pts[c, b, :n, 0] = rng.uniform(0.0, 69.1, n)
            pts[c, b, :n, 1] = rng.uniform(-39.6, 39.6, n)
            pts[c, b, :n, 2] = rng.uniform(-3.0, 1.0, n)
            pts[c, b, :n, 3] = rng.uniform(0.0, 1.0, n)
    clouds = jnp.asarray(pts)
    num = jnp.full((B,), n, jnp.int32)

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
    print(f"sync baseline {sync*1e3:.1f} ms; B={B}", flush=True)
    it = args.iters

    vox_bank = jax.jit(jax.vmap(lambda p: det.voxelize_batch(p, num)))(clouds)

    pfn_vars = {"params": variables["params"]["pfn"],
                "batch_stats": variables["batch_stats"]["pfn"]}
    pfn = PointwisePFN(cfg.model, dtype=det.dtype)

    def pfn_fwd(params, v):
        b, p = v.pillar_mask.shape
        flat = lambda a: a.reshape((b * a.shape[1],) + a.shape[2:])
        pid = v.point_pillar + (jnp.arange(b, dtype=jnp.int32) * p)[:, None]
        feats, _ = pfn.apply(
            {"params": params, "batch_stats": pfn_vars["batch_stats"]},
            flat(v.points), flat(pid), flat(v.point_kept),
            flat(v.point_mean), flat(v.point_zyx), flat(v.num_points),
            flat(v.pillar_mask), train=True, mutable=["batch_stats"])
        canvas = scatter_to_canvas_batched(feats.reshape(b, p, -1),
                                           v.coords, v.pillar_mask, ny, nx)
        return canvas

    def pfn_bwd(carry, v):
        l, g = jax.value_and_grad(
            lambda pp: jnp.sum(pfn_fwd(pp, v)))(pfn_vars["params"])
        gs = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return carry + l * 0 + gs * 0, None

    timed("pfn+scatter fwd+bwd", pfn_bwd, vox_bank, it, sync)

    rpn_vars = {"params": variables["params"]["rpn"],
                "batch_stats": variables["batch_stats"]["rpn"]}
    rpn = RPN(cfg.model, dtype=det.dtype)
    canvas_bank = jnp.asarray(
        rng.randn(NB, B, ny, nx, F).astype(np.float32))

    def rpn_bwd(carry, cv):
        def f(pp):
            preds, _ = rpn.apply(
                {"params": pp, "batch_stats": rpn_vars["batch_stats"]},
                cv, True, mutable=["batch_stats"])
            return (jnp.sum(preds["box_preds"])
                    + jnp.sum(preds["cls_preds"])
                    + jnp.sum(preds["dir_cls_preds"]))

        l, g = jax.value_and_grad(f)(rpn_vars["params"])
        gs = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return carry + l * 0 + gs * 0, None

    timed("rpn fwd+bwd (train mode)", rpn_bwd, canvas_bank, it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
