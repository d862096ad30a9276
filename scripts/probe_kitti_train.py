"""KITTI-scale fused train-step throughput on TPU (batch 2, 1.29M anchors).

bench.py methodology: N steps inside one jitted scan over a batch bank,
device_get-forced, sync baseline subtracted. The step reuses state across
iterations (carry), so optimizer/BN updates execute every iteration.
Measurements run under utils/probe_harness.ProbeHarness (VERDICT r4 #3):
the sync baseline is re-measured after the timed run and the script exits
nonzero on contention drift, so a polluted reading cannot be recorded.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_kitti_train.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.train.loop import create_train_state, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--npts", type=int, default=100000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--bf16", action="store_true")
    # kitti_3class.yaml ships remat=true since 8fd8bd6; --no-remat
    # restores the store-all baseline for A/Bs
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    # bf16-STORED-activations with f32 compute/params/grads (rpn.remat_bf16)
    # — distinct from --bf16, which flips the compute dtype wholesale
    ap.add_argument("--remat-bf16", action="store_true")
    ap.add_argument("--config", default="configs/kitti_3class.yaml",
                    help="any trainable config, e.g. the SECOND sparse one")
    args = ap.parse_args()

    cfg = Config.from_yaml(args.config)
    if args.bf16:
        cfg = cfg.override("runtime.compute_dtype", "bfloat16")
    if args.remat:
        cfg = cfg.override("model.rpn.remat", True)
    if args.no_remat:
        cfg = cfg.override("model.rpn.remat", False)
    if args.remat_bf16:
        cfg = cfg.override("model.rpn.remat", True)
        cfg = cfg.override("model.rpn.remat_bf16", True)
    det = PillarsDetector(cfg)
    B = args.batch
    state, tx = create_train_state(det, jax.random.PRNGKey(0), B)
    step = make_train_step(det, tx, donate=False)
    maxpts = cfg.model.voxel.max_points
    g = cfg.model.target.max_gt_boxes
    n = args.npts

    rng = np.random.RandomState(0)
    NB = 2
    nf = cfg.model.num_point_features
    pcr = cfg.model.voxel.point_cloud_range
    n = min(n, maxpts)
    pts = np.zeros((NB, B, maxpts, nf), np.float32)
    for c in range(NB):
        for b in range(B):
            pts[c, b, :n, 0] = rng.uniform(pcr[0], pcr[3], n)
            pts[c, b, :n, 1] = rng.uniform(pcr[1], pcr[4], n)
            pts[c, b, :n, 2] = rng.uniform(pcr[2], pcr[5], n)
            if nf > 3:
                pts[c, b, :n, 3] = rng.uniform(0.0, 1.0, n)
    gt = np.zeros((NB, B, g, 7), np.float32)
    gt[..., 0] = rng.uniform(pcr[0] + 2, pcr[3] - 2, (NB, B, g))
    gt[..., 1] = rng.uniform(pcr[1] + 1, pcr[4] - 1, (NB, B, g))
    gt[..., 2] = -1.0
    gt[..., 3:6] = [1.6, 3.9, 1.56]
    bank = dict(
        points=jnp.asarray(pts),
        num_points=jnp.full((NB, B), n, jnp.int32),
        gt_boxes=jnp.asarray(gt),
        gt_classes=jnp.ones((NB, B, g), jnp.int32),
        gt_valid=jnp.ones((NB, B, g), bool),
    )

    from pillars_tpu.utils.probe_harness import ProbeHarness, jax_sync_fn

    h = ProbeHarness(jax_sync_fn(bank["points"]))
    print(f"npts={n} B={B}", flush=True)

    @jax.jit
    def run(state, bank, reps):
        def one(st, batch):
            st2, metrics = step(st, batch)  # nested jit inlines under run
            return st2, metrics.loss

        def outer(i, st):
            st2, _ = jax.lax.scan(one, st, bank)
            return st2
        return jax.lax.fori_loop(0, reps, outer, state)

    t0 = time.perf_counter()
    out = run(state, bank, 1)
    _ = jax.device_get(out.step)
    compile_s = time.perf_counter() - t0
    ms = h.measure(
        f"train_step_B{B}",
        lambda: jax.device_get(jnp.sum(
            run(state, bank, args.iters).params["rpn"]["conv_box"]["bias"])),
        NB * args.iters)
    print(f"train step B={B}: {ms:.2f} ms/step "
          f"({B * 1000.0 / ms:.1f} samples/s)  compile {compile_s:.1f}s",
          flush=True)
    h.verdict(strict=True, label=f"kitti_train_B{B}")


if __name__ == "__main__":
    main()
