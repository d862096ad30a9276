"""Headline benchmark: single-cloud end-to-end inference rate on one chip.

Measures the full per-cloud path (voxelize + PFN + scatter + RPN + decode +
NMS) at batch 1, mirroring the reference's production-mode loop. Baseline:
120 clouds/sec on an RTX 3090 (reference README.md:34; BASELINE.md).

Methodology (device-honest): on this image the TPU is reached through a
relay whose `block_until_ready` does NOT wait for device completion (a
13-TFLOP matmul chain "finishes" in 0.1 ms), and a synchronous device_get
costs a fixed ~25-30 ms round trip. Per-call wall timing therefore measures
RPC dispatch, not the TPU. Instead the benchmark drives N batches through
the full inference graph inside ONE jitted fori_loop/scan (inputs vary per
iteration from a bank of clouds), forces execution with a device_get of a
scalar reduction, and subtracts the measured sync baseline. The same
protocol reproduces v5e peak bf16 throughput on a matmul chain, validating
the clock.

Fault tolerance (VERDICT r3 #1): the relay occasionally throws one-off
FAILED_PRECONDITION/UNAVAILABLE faults on healthy programs — BENCH_r03
died that way while a rerun measured 819 clouds/s. Two defenses here:
(a) the jitted graph takes EVERY device operand (weights, clouds, counts,
transforms) as an explicit argument, so lowering never performs a
trace-time device_get of closure constants (the r3 crash site); (b) each
device phase (init, timed section) runs under
pillars_tpu.utils.faults.with_retries, which resets the jit caches + PJRT
client on a transient fault and re-runs the WHOLE timed section so a
retried measurement is never half-timed. tests/test_bench_retry.py injects
a first-attempt FAILED_PRECONDITION and asserts the JSON line still lands.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_FPS = 120.0


def _build_bank(cfg, batch: int, n_clouds: int, n: int = 19200):
    """Host-side bank of d435i-like clouds (640x480 depth subsampled 1::4
    -> ~19k in-range points), plus per-batch counts and identity calibs.
    Pure NumPy — device placement happens at jit-argument time."""
    maxpts = cfg.model.voxel.max_points
    n = min(n, maxpts)
    rng = np.random.RandomState(0)
    pts = np.zeros((n_clouds, batch, maxpts, 3), np.float32)
    for c in range(n_clouds):
        for b in range(batch):
            pts[c, b, :n, 0] = rng.uniform(0.0, 6.4, n)
            pts[c, b, :n, 1] = rng.uniform(-2.56, 2.56, n)
            pts[c, b, :n, 2] = rng.uniform(-3.0, 3.0, n)
    num = np.full((batch,), n, np.int32)
    eye = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    return pts, num, eye


def _make_run(det, cfg, batch: int):
    """The jitted measurement graph. All device data (variables, cloud
    bank, counts, calibs) enter as ARGUMENTS — nothing device-resident is
    closed over, so tracing/lowering never does a D2H (the r3 fault
    site was _array_mlir_constant_handler fetching closure constants)."""
    import jax
    import jax.numpy as jnp

    thr = cfg.eval_input.anchor_area_threshold

    def one_batch(variables, num, eye, carry, p):
        if det.dense_cell:
            preds, amask = det._forward_dense(variables, p, num, thr)
        else:
            voxelized = det.voxelize_batch(p, num)
            amask = det.anchors_mask_batch(
                voxelized.coords, voxelized.pillar_mask, thr)
            preds = det.apply(variables, voxelized, train=False)
        out = det.postprocess(preds, amask, eye, eye)
        return (carry + jnp.sum(out.scores)
                + jnp.sum(out.boxes_lidar[..., 0])), None

    @jax.jit
    def run(variables, clouds, num, eye, iters):
        def outer(i, acc):
            acc2, _ = jax.lax.scan(
                lambda c, p: one_batch(variables, num, eye, c, p),
                acc, clouds)
            return acc2
        return jax.lax.fori_loop(0, iters, outer, 0.0)

    @jax.jit
    def baseline(clouds):
        return jnp.sum(clouds[0, 0, 0])

    return run, baseline


def _measure(det, variables, cfg, batch: int, n_clouds: int = 16,
             reps: int = 8):
    """Average device ms per batch over n_clouds*reps end-to-end runs.

    The whole timed section (warm-up + sync baseline + timed run) executes
    under one retry scope: a transient backend fault anywhere re-runs the
    section from the top after a client reset, so partial timings never
    leak into the reported number. ``variables`` must be a HOST pytree
    (see main): device placement happens INSIDE the retried section so a
    client reset can't strand operands on a dead backend."""
    import jax

    from pillars_tpu.utils.faults import with_retries

    pts, num, eye = _build_bank(cfg, batch, n_clouds)
    run, baseline = _make_run(det, cfg, batch)
    n_iter = n_clouds * reps

    def timed_section():
        # fresh placement on the (possibly reset) client each attempt
        v_d, pts_d, num_d, eye_d = jax.device_put(
            (variables, pts, num, eye))
        # compile + one full execution (persistent-cache hit on retry)
        _ = jax.device_get(run(v_d, pts_d, num_d, eye_d, 1))
        _ = jax.device_get(baseline(pts_d))
        syncs = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(baseline(pts_d))
            syncs.append(time.perf_counter() - t0)
        sync = min(syncs)
        t0 = time.perf_counter()
        _ = jax.device_get(run(v_d, pts_d, num_d, eye_d, reps))
        total = time.perf_counter() - t0
        return (total - sync) * 1e3 / n_iter

    return with_retries(timed_section, attempts=3, desc="bench timed section")


def main():
    import jax

    from pillars_tpu.utils.compile_cache import set_compile_cache
    from pillars_tpu.utils.faults import with_retries

    set_compile_cache()

    from pillars_tpu.config import Config
    from pillars_tpu.models.detector import PillarsDetector

    cfg = Config.default()
    det = PillarsDetector(cfg)
    # init on device, then pull to host: the measurement section re-places
    # operands itself, so a mid-bench client reset can't invalidate them
    variables = with_retries(
        lambda: jax.device_get(det.init(jax.random.PRNGKey(0),
                                        batch_size=1)),
        attempts=3, desc="detector init")

    ms_b1 = _measure(det, variables, cfg, batch=1)
    fps = 1000.0 / ms_b1

    # place the measurement on the chip's roofline (analytic FLOPs/bytes,
    # utils/roofline.py): mfu = achieved fraction of peak matmul rate,
    # bound = which wall the config sits against (mxu / hbm / latency)
    from pillars_tpu.utils.roofline import roofline_report

    rep = roofline_report(cfg, ms_b1, batch=1,
                          device_kind=jax.devices()[0].device_kind)

    print(json.dumps({
        "metric": "pointclouds/sec/chip (e2e batch=1, device ms/cloud=%.3f)"
                  % ms_b1,
        "value": round(fps, 2),
        "unit": "clouds/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "mfu": rep["mfu"],
        "bound": rep["bound"],
        "model_tflops_per_cloud": round(rep["flops"] / 1e12, 6),
    }))


if __name__ == "__main__":
    main()
