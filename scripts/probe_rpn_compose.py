"""Find where the composed-RPN backward overhead lives at KITTI scale.

Round-2 facts: full RPN fwd+bwd ~91 ms at B=2 f32 while the per-module
sum (probe_rpn_bwd.py blocks+deconvs+heads) is ~48 ms, and single plain
convs cost what XLA's autodiff says they should (probe_conv_bwd.py —
XLA's own dgrad/wgrad beat manual 9-matmul/patches formulations 3-10x,
so per-op conv schedules are NOT the problem). This probe grows the
composed graph one stage at a time, fwd+bwd each prefix, to locate the
superlinear jump:

  b1 | b1-b2 | b1-b2-b3 | +deconvs(sum) | full(split heads) |
  full(concat heads) | full+remat

All variants take the canvas as input and reduce outputs to a scalar sum
(same as probe_rpn_bwd), grads wrt params only, BN mutable like the real
train step (train/loop.py).

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_rpn_compose.py [--iters N]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from pillars_tpu.config import Config
from pillars_tpu.models.rpn import RPN, _Block, _Deconv


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


class _Prefix(nn.Module):
    """First ``depth`` blocks (+ optionally their deconv branches)."""

    cfg: object
    depth: int
    with_deconvs: bool = False
    dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        rcfg = self.cfg.rpn
        out = 0.0
        for i in range(self.depth):
            x = _Block(rcfg.num_filters[i], rcfg.layer_nums[i],
                       rcfg.layer_strides[i], rcfg.bn_momentum, rcfg.bn_eps,
                       separable=rcfg.use_separable_conv,
                       name=f"block{i + 1}")(x, train)
            if self.with_deconvs:
                u = _Deconv(rcfg.num_upsample_filters[i],
                            rcfg.upsample_strides[i], rcfg.bn_momentum,
                            rcfg.bn_eps, name=f"deconv{i + 1}")(x, train)
                out = out + jnp.sum(u)
        return jnp.sum(x) + out


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

    # kitti_3class.yaml ships remat=true since 8fd8bd6 — force it off so
    # the prefixes and "full RPN (config heads)" are store-all baselines
    cfg = Config.from_yaml("configs/kitti_3class.yaml").override(
        "model.rpn.remat", False)
    m = cfg.model
    shape = (B, ny, nx, 64)

    bwd_probe(_Prefix(m, 1), shape, rng, "b1", it, sync)
    bwd_probe(_Prefix(m, 2), shape, rng, "b1-b2", it, sync)
    bwd_probe(_Prefix(m, 3), shape, rng, "b1-b2-b3", it, sync)
    bwd_probe(_Prefix(m, 3, with_deconvs=True), shape, rng,
              "b1-b3 + deconvs(sum)", it, sync)
    bwd_probe(RPN(m), shape, rng, "full RPN (config heads)", it, sync)
    m2 = cfg.override("model.rpn.no_concat_heads",
                      not m.rpn.no_concat_heads).model
    bwd_probe(RPN(m2), shape, rng,
              f"full RPN (no_concat={m2.rpn.no_concat_heads})", it, sync)
    m3 = cfg.override("model.rpn.remat", True).model
    bwd_probe(RPN(m3), shape, rng, "full RPN + remat", it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
