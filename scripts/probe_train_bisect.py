"""Bisect the 1314 ms KITTI-scale train step: targets vs forward vs
backward vs optimizer.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_train_bisect.py
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
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--npts", type=int, default=100000)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    det = PillarsDetector(cfg)
    B = args.batch
    variables = det.init(jax.random.PRNGKey(0), batch_size=B)
    thr = cfg.train_input.anchor_area_threshold
    maxpts = cfg.model.voxel.max_points
    g = cfg.model.target.max_gt_boxes
    n = args.npts

    rng = np.random.RandomState(0)
    NB = 2
    pts = np.zeros((NB, B, maxpts, 4), np.float32)
    for c in range(NB):
        for b in range(B):
            pts[c, b, :n, 0] = rng.uniform(0.0, 69.1, n)
            pts[c, b, :n, 1] = rng.uniform(-39.6, 39.6, n)
            pts[c, b, :n, 2] = rng.uniform(-3.0, 1.0, n)
            pts[c, b, :n, 3] = rng.uniform(0.0, 1.0, n)
    gt = np.zeros((NB, B, g, 7), np.float32)
    gt[..., 0] = rng.uniform(5, 60, (NB, B, g))
    gt[..., 1] = rng.uniform(-30, 30, (NB, B, g))
    gt[..., 2] = -1.0
    gt[..., 3:6] = [1.6, 3.9, 1.56]
    clouds = jnp.asarray(pts)
    gts = jnp.asarray(gt)
    gcls = jnp.ones((NB, B, g), jnp.int32)
    gval = jnp.ones((NB, B, g), bool)
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
    amask_bank = jax.jit(jax.vmap(
        lambda v: det.anchors_mask_batch(v.coords, v.pillar_mask, thr)))(
            vox_bank)

    def targets_only(carry, op):
        am, gb, gc, gv = op
        t = det.assign_targets(gb, gc, gv, am)
        return carry + jnp.sum(t.labels).astype(jnp.float32), None

    timed("assign_targets", targets_only,
          (amask_bank, gts, gcls, gval), it, sync)

    targets_bank = jax.jit(jax.vmap(
        lambda am, gb, gc, gv: det.assign_targets(gb, gc, gv, am)))(
            amask_bank, gts, gcls, gval)

    def fwd_loss(carry, op):
        v, t = op
        preds, _ = det.network.apply(variables, v, True,
                                     mutable=["batch_stats"])
        out = det.loss(preds, t.labels, t.bbox_targets)
        return carry + out.loss, None

    timed("forward + loss (no grad)", fwd_loss,
          (vox_bank, targets_bank), it, sync)

    def grad_step(carry, op):
        v, t = op

        def loss_fn(params):
            preds, _ = det.network.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]}, v, True,
                mutable=["batch_stats"])
            return det.loss(preds, t.labels, t.bbox_targets).loss

        l, grads = jax.value_and_grad(loss_fn)(variables["params"])
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(grads))
        return carry + l + gsum * 0.0, None

    timed("forward + backward", grad_step,
          (vox_bank, targets_bank), it, sync)

    # backward attribution: net-only grads (no loss) vs loss-only grads
    def grad_net_only(carry, v):
        def f(params):
            preds, _ = det.network.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]}, v, True,
                mutable=["batch_stats"])
            return (jnp.sum(preds["box_preds"]) + jnp.sum(preds["cls_preds"])
                    + jnp.sum(preds["dir_cls_preds"]))

        l, grads = jax.value_and_grad(f)(variables["params"])
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(grads))
        return carry + l * 0.0 + gsum * 0.0, None

    timed("backward net only (sum preds)", grad_net_only, vox_bank, it, sync)

    pred_bank = jax.jit(jax.vmap(lambda v: det.network.apply(
        variables, v, False)))(vox_bank)

    def grad_loss_only(carry, op):
        preds, t = op

        def f(p):
            return det.loss(p, t.labels, t.bbox_targets).loss

        l, g = jax.value_and_grad(f)(preds)
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return carry + l + gsum * 0.0, None

    timed("loss fwd+bwd only (wrt preds)", grad_loss_only,
          (pred_bank, targets_bank), it, sync)

    # full fused step, inlined (no nested pjit): clouds -> new params
    import optax
    from pillars_tpu.train.optim import make_optimizer

    tx = make_optimizer(cfg.train.optimizer, B, variables["params"])
    opt_state = tx.init(variables["params"])

    @jax.jit
    def full_steps(params, opt_state, clouds, gts, gcls, gval, reps):
        def one(carry, op):
            params, opt_state = carry
            p, gb, gc, gv = op
            v = det.voxelize_batch(p, num)
            am = det.anchors_mask_batch(v.coords, v.pillar_mask, thr)
            t = det.assign_targets(gb, gc, gv, am)

            def loss_fn(pp):
                preds, _ = det.network.apply(
                    {"params": pp,
                     "batch_stats": variables["batch_stats"]}, v, True,
                    mutable=["batch_stats"])
                return det.loss(preds, t.labels, t.bbox_targets).loss

            l, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), l

        def outer(i, carry):
            carry2, _ = jax.lax.scan(one, carry, (clouds, gts, gcls, gval))
            return carry2
        return jax.lax.fori_loop(0, reps, outer, (params, opt_state))

    t0 = time.perf_counter()
    out = full_steps(variables["params"], opt_state, clouds, gts, gcls,
                     gval, 1)
    _ = jax.device_get(jnp.sum(out[0]["rpn"]["conv_box"]["bias"]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = full_steps(variables["params"], opt_state, clouds, gts, gcls,
                     gval, it)
    _ = jax.device_get(jnp.sum(out[0]["rpn"]["conv_box"]["bias"]))
    total = time.perf_counter() - t0
    ms = (total - sync) * 1e3 / (NB * it)
    print(f"full fused step (inline): {ms:.2f} ms/step  "
          f"compile {compile_s:.1f}s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
