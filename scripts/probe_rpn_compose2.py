"""Checkpoint-granularity sweep for the HBM-bound composed-RPN backward.

probe_rpn_compose.py showed per-block remat SPEEDS UP the composed
fwd+bwd (93.2 -> 78.3 ms at B=2 f32): the backward pays more re-loading
stored activations than recomputing them. This sweeps the granularity:

  none          store everything                 (known ~93 ms)
  per-block     rpn.remat (blocks + deconvs)     (known ~78 ms)
  whole-graph   ONE jax.checkpoint around the whole RPN: stores only
                the canvas input, recomputes the full forward in bwd
  two-level     whole-graph remat OF the per-block-remat RPN: bwd
                recomputes block-by-block within a full recompute

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_rpn_compose2.py [--iters N]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from pillars_tpu.config import Config
from pillars_tpu.models.rpn import RPN


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


def bwd_probe(mod, shape, rng, name, it, sync, NB=2):
    x_bank = jnp.asarray(rng.randn(NB, *shape).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x_bank[0], True)

    def f(carry, x):
        def loss(p):
            y, _ = mod.apply(
                {"params": p,
                 "batch_stats": variables.get("batch_stats", {})},
                x, True, mutable=["batch_stats"])
            if isinstance(y, dict):
                return sum(jnp.sum(v) for v in y.values())
            return jnp.sum(y)

        l, g = jax.value_and_grad(loss)(variables["params"])
        gs = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))
        return carry + l * 0 + gs * 0, None

    return timed(name, f, x_bank, it, sync)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    B = 2
    ny, nx = 496, 432

    sync_probe = jnp.zeros((2, 8, 128))

    @jax.jit
    def base(x):
        return jnp.sum(x[0])

    _ = jax.device_get(base(sync_probe))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(base(sync_probe))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms", flush=True)
    it = args.iters

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    # kitti_3class.yaml ships remat=true since 8fd8bd6 — force both arms
    # explicitly so "none" really is the store-all baseline
    m = cfg.override("model.rpn.remat", False).model
    m_r = cfg.override("model.rpn.remat", True).model
    shape = (B, ny, nx, 64)

    WholeRemat = nn.remat(RPN, static_argnums=(2,))
    bwd_probe(RPN(m), shape, rng, "none (store all)", it, sync)
    bwd_probe(RPN(m_r), shape, rng, "per-block remat", it, sync)
    bwd_probe(WholeRemat(m), shape, rng, "whole-graph remat", it, sync)
    bwd_probe(WholeRemat(m_r), shape, rng, "two-level remat", it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
