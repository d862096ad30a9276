"""Depthwise lowering A/B at KITTI block shapes: grouped conv vs shift-add.

The reference's RPN uses SeparableConv2D (voxelnet.py:576); grouped
(feature_group_count=C) convs keep the MXU idle and their backward is the
suspected hog when training the separable-parity config at KITTI scale.
depthwise_shift_add (models/layers.py) lowers the same math as k*k shifted
multiply-adds. This probe times the separable _Block fwd and fwd+bwd both
ways at block1/block2 shapes, B=2 f32.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_depthwise.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.rpn import _Block


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
    print(f"{name:46s} {ms:8.3f} ms/iter   (compile+1run {compile_s:.1f}s)",
          flush=True)
    return ms


def fwd_probe(mod, shape, rng, name, it, sync, NB=2):
    x_bank = jnp.asarray(rng.randn(NB, *shape).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x_bank[0], True)

    def f(carry, x):
        y = mod.apply({"params": variables["params"],
                       "batch_stats": variables.get("batch_stats", {})},
                      x, False)
        return carry + jnp.sum(y), None

    timed(name + " fwd", f, x_bank, it, sync)


def bwd_probe(mod, shape, rng, name, it, sync, NB=2):
    x_bank = jnp.asarray(rng.randn(NB, *shape).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x_bank[0], True)

    def f(carry, x):
        def loss(p):
            y, _ = mod.apply(
                {"params": p,
                 "batch_stats": variables.get("batch_stats", {})},
                x, True, mutable=["batch_stats"])
            return jnp.sum(y)

        l, g = jax.value_and_grad(loss)(variables["params"])
        gs = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))
        return carry + l * 0 + gs * 0, None

    timed(name + " fwd+bwd", f, x_bank, it, sync)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    B = 2
    ny, nx = 496, 432

    @jax.jit
    def base(x):
        return jnp.sum(x[0])

    sync_probe = jnp.zeros((2, 8, 128))
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
    r = cfg.model.rpn

    for shift in (False, True):
        tag = "shift-add" if shift else "grouped  "
        b1 = _Block(64, 3, 1, r.bn_momentum, r.bn_eps, separable=True,
                    shift_add=shift)
        b2 = _Block(128, 5, 2, r.bn_momentum, r.bn_eps, separable=True,
                    shift_add=shift)
        fwd_probe(b1, (B, ny, nx, 64), rng, f"sep block1 {tag}", it, sync)
        bwd_probe(b1, (B, ny, nx, 64), rng, f"sep block1 {tag}", it, sync)
        fwd_probe(b2, (B, ny, nx, 64), rng, f"sep block2 {tag}", it, sync)
        bwd_probe(b2, (B, ny, nx, 64), rng, f"sep block2 {tag}", it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
