"""d435i-scale RPN: flax conv stack vs fused Pallas blocks.

The d435i headline (bench.py, 64x80 canvas) is latency-bound in the RPN —
dozens of tiny convs. ops/rpn_pallas.py fuses each downsample block into
one Pallas kernel; this probe measures whether that wins at this scale,
plus the full head path both ways.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_rpn_d435i.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.rpn import RPN, RPNTail
from pillars_tpu.ops.rpn_pallas import fused_rpn_blocks


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
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    NB = 8
    B = args.batch

    cfg = Config.default()
    mcfg = cfg.model
    _, ny, nx = mcfg.feature_map_size
    C = mcfg.pfn.num_filters

    rpn = RPN(mcfg)
    canvas0 = jnp.asarray(rng.randn(B, ny, nx, C).astype(np.float32))
    variables = rpn.init(jax.random.PRNGKey(0), canvas0, False)
    full_vars = {"params": {"rpn": variables["params"]},
                 "batch_stats": {"rpn": variables.get("batch_stats", {})}}
    tail = RPNTail(mcfg)

    bank = jnp.asarray(rng.randn(NB, B, ny, nx, C).astype(np.float32) * 0.3)

    @jax.jit
    def basef(x):
        return jnp.sum(x[0, 0, 0])

    _ = jax.device_get(basef(bank))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(basef(bank))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms; canvas {B}x{ny}x{nx}x{C}",
          flush=True)
    it = args.iters

    def flax_full(carry, cv):
        preds = rpn.apply(variables, cv, False)
        return carry + jnp.sum(preds["box_preds"][0, 0, 0]).astype(
            jnp.float32), None

    def pallas_full(carry, cv):
        b1, b2, b3 = fused_rpn_blocks(cv, full_vars, mcfg.rpn)
        preds = tail.apply(variables, b1, b2, b3, False)
        return carry + jnp.sum(preds["box_preds"][0, 0, 0]).astype(
            jnp.float32), None

    timed("flax RPN (blocks+deconvs+heads)", flax_full, bank, it, sync)
    timed("pallas blocks + flax tail", pallas_full, bank, it, sync)

    # numerical equivalence spot check
    want = rpn.apply(variables, bank[0], False)
    b1, b2, b3 = fused_rpn_blocks(bank[0], full_vars, mcfg.rpn)
    got = tail.apply(variables, b1, b2, b3, False)
    err = float(jnp.max(jnp.abs(want["box_preds"] - got["box_preds"])))
    scale = float(jnp.max(jnp.abs(want["box_preds"])))
    # on hardware both paths run bf16 MXU matmuls with different
    # accumulation splits, so compare relative to the activation scale
    print(f"max |box_preds diff| = {err:.3e} (max |want| = {scale:.3e}, "
          f"rel {err / max(scale, 1e-9):.3e})", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
