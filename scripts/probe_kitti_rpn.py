"""KITTI-scale RPN attribution: blocks vs deconvs+heads, f32 vs bf16.

The RPN at 432x496 (kitti_3class.yaml, plain convs) is ~274 GFLOP/cloud:
block1 63 + block2 87 + block3 87 + deconvs 25 + heads 12. The measured
4.4 ms f32 sits near the f32 MXU roofline, so "bf16 barely helps" (round-1
note) would mean the bf16 path never actually engages the MXU's bf16 rate.
This probe times the stack at both dtypes and in pieces to find out.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_kitti_rpn.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.rpn import RPN, RPNTail, _Block


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
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    NB = 4

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    mcfg = cfg.model
    _, ny, nx = mcfg.feature_map_size
    C = mcfg.pfn.num_filters

    bank = jnp.asarray(rng.randn(NB, 1, ny, nx, C).astype(np.float32) * 0.3)

    @jax.jit
    def basef(x):
        return jnp.sum(x[0, 0, 0, 0])

    _ = jax.device_get(basef(bank))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(basef(bank))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms; canvas 1x{ny}x{nx}x{C}",
          flush=True)
    it = args.iters

    for dname, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        rpn = RPN(mcfg, dtype=dt)
        variables = rpn.init(jax.random.PRNGKey(0), bank[0], False)

        def full(carry, cv):
            preds = rpn.apply(variables, cv, False)
            return carry + jnp.sum(
                preds["box_preds"][0, :, :, 0].astype(jnp.float32)), None

        timed(f"RPN full ({dname})", full, bank, it, sync)

        blocks = [
            _Block(mcfg.rpn.num_filters[i], mcfg.rpn.layer_nums[i],
                   mcfg.rpn.layer_strides[i], mcfg.rpn.bn_momentum,
                   mcfg.rpn.bn_eps, separable=mcfg.rpn.use_separable_conv,
                   dtype=dt)
            for i in range(3)
        ]
        bvars = [
            {"params": variables["params"][f"block{i + 1}"],
             "batch_stats": variables["batch_stats"][f"block{i + 1}"]}
            for i in range(3)
        ]

        def blocks_only(carry, cv):
            x = cv
            outs = []
            for blk, bv in zip(blocks, bvars):
                x = blk.apply(bv, x, False)
                outs.append(x)
            return carry + sum(jnp.sum(o[0, :, :, 0].astype(jnp.float32))
                               for o in outs), None

        timed(f"blocks only ({dname})", blocks_only, bank, it, sync)

        tail = RPNTail(mcfg, dtype=dt)
        b1 = jax.jit(lambda cv: blocks[0].apply(bvars[0], cv, False))(bank[0])
        b2 = jax.jit(lambda x: blocks[1].apply(bvars[1], x, False))(b1)
        b3 = jax.jit(lambda x: blocks[2].apply(bvars[2], x, False))(b2)
        tb = (jnp.broadcast_to(b1, (NB,) + b1.shape),
              jnp.broadcast_to(b2, (NB,) + b2.shape),
              jnp.broadcast_to(b3, (NB,) + b3.shape))

        def tail_only(carry, bs):
            preds = tail.apply(variables, *bs, False)
            return carry + jnp.sum(
                preds["box_preds"][0, :, :, 0].astype(jnp.float32)), None

        timed(f"deconvs+heads ({dname})", tail_only, tb, it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
