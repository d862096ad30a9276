"""d435i batch-1 latency-floor levers (VERDICT r3 #4).

The B=1 e2e graph sits at ~1.22-1.26 ms/cloud, latency-bound at 0.6% MFU
across ~60 small ops. This probe measures (a) the FUSED share of each
stage by ablation — run the full scan-bench with pieces DCE'd out — and
(b) the two input-side levers the roofline ledger never closed: buffer
donation and bf16 IO for the point bank. Shares bound the remaining
levers: a whole-RPN Pallas megakernel can save at most the RPN's fused
share; a fully-fused amask+postprocess at most theirs.

Methodology = bench.py: N batches inside one jitted fori/scan over a
cloud bank, device_get-forced, sync baseline subtracted. Weights and bank
enter as jit arguments. The whole session runs under
utils/probe_harness.ProbeHarness (VERDICT r4 #3): every measurement
re-checks the sync baseline for contention drift, the DCE-subset
orderings (vox ⊆ fwd_nomask ⊆ fwd_only ⊆ e2e) are enforced, and the
script exits nonzero on a REJECT verdict so polluted numbers cannot be
published (the fate of both round-4 in-session runs).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_d435i_levers.py
"""

import json

import numpy as np

from pillars_tpu.utils.probe_harness import ProbeHarness, jax_sync_fn


def _measure(h, name, run, ops, n_iter, reps, resident=True):
    """Compile+warm outside the timed path, then one harness-gated run.

    ``resident``: device_put the operands ONCE before timing — host numpy
    operands are re-uploaded over the relay on EVERY call (~10 MB bank,
    ~1.7 ms/cloud of pure H2D at this bank size), which swamped the
    sub-3-ms graphs and scrambled the subset orderings in the first two
    harness-gated runs of 2026-08-21 (bench.py places operands the same
    way). The donated-bank variant keeps host operands by design — its
    point is the transfer path."""
    import jax

    if resident:
        ops = jax.device_put(ops)
    _ = jax.device_get(run(*ops, 1))
    return h.measure(name, lambda: jax.device_get(run(*ops, reps)), n_iter)


def main():
    from pillars_tpu.config import Config
    from pillars_tpu.models.detector import PillarsDetector
    from pillars_tpu.utils.compile_cache import set_compile_cache

    set_compile_cache()
    import jax
    import jax.numpy as jnp

    cfg = Config.default()
    det = PillarsDetector(cfg)
    thr = cfg.eval_input.anchor_area_threshold
    variables = jax.device_get(det.init(jax.random.PRNGKey(0),
                                        batch_size=1))
    n_clouds, reps = 16, 8
    n = min(19200, cfg.model.voxel.max_points)
    maxpts = cfg.model.voxel.max_points
    rng = np.random.RandomState(0)
    pts = np.zeros((n_clouds, 1, maxpts, 3), np.float32)
    for c in range(n_clouds):
        pts[c, 0, :n, 0] = rng.uniform(0.0, 6.4, n)
        pts[c, 0, :n, 1] = rng.uniform(-2.56, 2.56, n)
        pts[c, 0, :n, 2] = rng.uniform(-3.0, 3.0, n)
    num = np.full((1,), n, np.int32)
    eye = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
    n_iter = n_clouds * reps

    def scanner(body):
        @jax.jit
        def run(variables, clouds, num, eye, iters):
            def outer(i, acc):
                acc2, _ = jax.lax.scan(
                    lambda c, p: (c + body(variables, p, num, eye), None),
                    acc, clouds)
                return acc2
            return jax.lax.fori_loop(0, iters, outer, 0.0)
        return run

    # --- stage-share ablations (DCE drops the unused outputs) -----------
    def body_e2e(v, p, num, eye):
        preds, amask = det._forward_dense(v, p, num, thr)
        out = det.postprocess(preds, amask, eye, eye)
        return jnp.sum(out.scores) + jnp.sum(out.boxes_lidar[..., 0])

    def body_fwd(v, p, num, eye):  # no postprocess
        preds, amask = det._forward_dense(v, p, num, thr)
        return (sum(jnp.sum(x) for x in preds.values())
                + jnp.sum(amask.astype(jnp.float32)))

    def body_fwd_nomask(v, p, num, eye):  # amask ops DCE'd
        preds, _ = det._forward_dense(v, p, num, thr)
        return sum(jnp.sum(x) for x in preds.values())

    def body_vox(v, p, num, eye):  # front end only (cell voxelizer)
        cv = det.cell_voxelize(p, num)
        return (jnp.sum(cv.points) + jnp.sum(cv.count)
                + jnp.sum(cv.mean) + jnp.sum(cv.kept))

    h = ProbeHarness(jax_sync_fn(jax.device_put(pts)))
    results = {}
    for name, body in [("e2e", body_e2e), ("fwd_only", body_fwd),
                       ("fwd_nomask", body_fwd_nomask), ("vox", body_vox)]:
        run = scanner(body)
        ms = _measure(h, name, run, (variables, pts, num, eye), n_iter, reps)
        results[name] = round(ms, 4)
        print(json.dumps({"variant": name, "ms_per_cloud": results[name]}))
    # DCE-subset structural orderings: a subset graph cannot be slower
    h.expect_subset("fwd_only", "e2e")
    h.expect_subset("fwd_nomask", "fwd_only")
    h.expect_subset("vox", "fwd_nomask")

    # --- RPN share: canvas -> heads alone (megakernel upper bound) ------
    from pillars_tpu.models.rpn import RPN as _RPN

    nx, ny, nz = cfg.model.voxel.grid_size
    canvas_bank = np.asarray(rng.uniform(
        0, 1, (n_clouds, 1, ny, nx, cfg.model.pfn.num_filters)), np.float32)
    rpn_vars = jax.device_get(
        {"params": variables["params"]["rpn"],
         "batch_stats": variables["batch_stats"]["rpn"]})

    @jax.jit
    def run_rpn(rv, bank, iters):
        def outer(i, acc):
            def one(c, canvas):
                preds = _RPN(det.mcfg, dtype=det.dtype).apply(
                    rv, canvas, False)
                return c + sum(jnp.sum(x) for x in preds.values()), None
            acc2, _ = jax.lax.scan(one, acc, bank)
            return acc2
        return jax.lax.fori_loop(0, iters, outer, 0.0)

    ms = _measure(h, "rpn_alone", run_rpn, (rpn_vars, canvas_bank),
                  n_iter, reps)
    results["rpn_alone"] = round(ms, 4)
    print(json.dumps({"variant": "rpn_alone", "ms_per_cloud": results["rpn_alone"]}))

    # --- lever: bf16 IO for the point bank (halves the bank's HBM/PCIe
    # footprint; cell assignment shifts for points within 0.4% of a voxel
    # boundary — a recall tradeoff to quantify separately if the time wins)
    import ml_dtypes

    bank_bf16 = pts.astype(ml_dtypes.bfloat16)

    def body_e2e_bf16io(v, p, num, eye):
        p = p.astype(jnp.float32)
        preds, amask = det._forward_dense(v, p, num, thr)
        out = det.postprocess(preds, amask, eye, eye)
        return jnp.sum(out.scores) + jnp.sum(out.boxes_lidar[..., 0])

    run = scanner(body_e2e_bf16io)
    ms = _measure(h, "e2e_bf16_io", run, (variables, bank_bf16, num, eye),
                  n_iter, reps)
    results["e2e_bf16_io"] = round(ms, 4)
    print(json.dumps({"variant": "e2e_bf16_io",
                      "ms_per_cloud": results["e2e_bf16_io"]}))

    # --- lever: donation of the bank buffer -----------------------------
    run_d = jax.jit(scanner(body_e2e).__wrapped__, donate_argnums=(1,))
    ms = _measure(h, "e2e_donated_bank", run_d, (variables, pts, num, eye),
                  n_iter, reps, resident=False)
    results["e2e_donated_bank"] = round(ms, 4)
    print(json.dumps({"variant": "e2e_donated_bank",
                      "ms_per_cloud": results["e2e_donated_bank"]}))

    # --- derived shares --------------------------------------------------
    shares = {
        "postprocess_share": round(results["e2e"] - results["fwd_only"], 4),
        "amask_share": round(results["fwd_only"] - results["fwd_nomask"], 4),
        "network_share": round(results["fwd_nomask"] - results["vox"], 4),
        "vox_share": results["vox"],
        "rpn_megakernel_cap": results["rpn_alone"],
    }
    print(json.dumps({"shares": shares}))
    # PASS/REJECT with evidence; nonzero exit on pollution so a burned
    # session can never be mistaken for data (VERDICT r4 #3)
    h.verdict(strict=True, label="d435i_levers")


if __name__ == "__main__":
    main()
