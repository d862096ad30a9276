"""Compare class-max formulations for the KITTI-scale postprocess on TPU.

The [1.29M, 3] per-anchor class reduction has several possible lowerings with
wildly different TPU costs; this probe measures each end-to-end variant on
synthetic NHWC head banks (same methodology as probe_kitti_post.py).
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
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    det = PillarsDetector(cfg)
    pp = cfg.model.postprocess
    A = det.anchor_set.anchors.shape[0]
    ny, nx = det.ny, det.nx
    C = cfg.model.num_class
    L = ny * nx
    T = A // L
    k = pp.nms_pre_max_size
    print(f"A={A} grid=({ny},{nx}) C={C} T={T} k={k}", flush=True)

    rng = np.random.RandomState(0)
    NB = 4
    cls_nhwc = jnp.asarray(rng.randn(NB, 1, ny, nx, T * C), jnp.bfloat16)
    box_nhwc = jnp.asarray(rng.randn(NB, 1, ny, nx, T * 7), jnp.bfloat16)
    amask_bank = jnp.asarray(rng.rand(NB, 1, A) > 0.5)

    @jax.jit
    def base(x):
        return jnp.sum(x[0, 0, 0, 0].astype(jnp.float32))

    _ = jax.device_get(base(cls_nhwc))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(base(cls_nhwc))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms", flush=True)
    it = args.iters

    def chain_tail(masked, cls_flat):
        ts, ti = jax.lax.top_k(masked, k)
        # deferred labels: gather the C logits of each selected anchor
        logit3 = cls_flat[ti[:, None] * C + jnp.arange(C)]
        lab = jnp.argmax(logit3, axis=-1)
        return jnp.sum(ts) + jnp.sum(ti) + jnp.sum(lab)

    # V1: strided 1-D slices (current code)
    def v1(carry, op):
        cl, am = op
        cls_flat = cl.reshape(-1).astype(jnp.float32)

        def one(cf, m):
            best = cf[0::C]
            for c in range(1, C):
                best = jnp.maximum(best, cf[c::C])
            masked = jnp.where(m, jax.nn.sigmoid(best), -jnp.inf)
            return chain_tail(masked, cf)

        return carry + one(cls_flat, am[0]), None

    timed("V1 strided 1-D slices", v1, (cls_nhwc, amask_bank), it, sync)

    # V2: reduce_window window=C stride=C on the flat vector
    def v2(carry, op):
        cl, am = op
        cls_flat = cl.reshape(-1).astype(jnp.float32)
        best = jax.lax.reduce_window(cls_flat, -jnp.inf, jax.lax.max,
                                     (C,), (C,), "VALID")
        masked = jnp.where(am[0], jax.nn.sigmoid(best), -jnp.inf)
        return carry + chain_tail(masked, cls_flat), None

    timed("V2 reduce_window", v2, (cls_nhwc, amask_bank), it, sync)

    # V3: minor-axis reduce on [L*T, C]
    def v3(carry, op):
        cl, am = op
        cls_flat = cl.reshape(-1).astype(jnp.float32)
        best = jnp.max(cls_flat.reshape(-1, C), axis=-1)
        masked = jnp.where(am[0], jax.nn.sigmoid(best), -jnp.inf)
        return carry + chain_tail(masked, cls_flat), None

    timed("V3 reshape [A,C] minor reduce", v3, (cls_nhwc, amask_bank),
          it, sync)

    # V4: NHWC-native reduce: [ny, nx, T, C] max over minor axis, flatten
    def v4(carry, op):
        cl, am = op
        x = cl[0].astype(jnp.float32).reshape(ny, nx, T, C)
        best = jnp.max(x, axis=-1).reshape(-1)
        masked = jnp.where(am[0], jax.nn.sigmoid(best), -jnp.inf)
        return carry + chain_tail(masked, cl.reshape(-1).astype(jnp.float32)), None

    timed("V4 NHWC [ny,nx,T,C] minor reduce", v4, (cls_nhwc, amask_bank),
          it, sync)

    # V5: box gather styles after top_k
    idx_bank = jnp.asarray(rng.randint(0, A, (NB, 1, k)), jnp.int32)

    def v5(carry, op):
        bx, ti = op
        box_flat = bx.reshape(-1).astype(jnp.float32)
        sel = box_flat[ti[0][:, None] * 7 + jnp.arange(7)]
        return carry + jnp.sum(sel), None

    timed("V5 flat box gather [k,7]", v5, (box_nhwc, idx_bank), it, sync)

    def v6(carry, op):
        bx, ti = op
        box_p = bx.reshape(1, -1, 7).astype(jnp.float32)
        sel = box_p[0][ti[0]]
        return carry + jnp.sum(sel), None

    timed("V6 skinny [A,7] row gather", v6, (box_nhwc, idx_bank), it, sync)

    print("done", flush=True)


if __name__ == "__main__":
    main()
