"""Per-component RPN backward attribution at KITTI scale (the full RPN
fwd+bwd measures 91 ms vs 9 ms forward at B=2).

Times fwd+bwd of: each downsample block, each deconv branch, the heads,
and a plain-conv stack equivalent, f32 and bf16.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_rpn_bwd.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from pillars_tpu.config import Config
from pillars_tpu.models.rpn import _Block, _Deconv
from pillars_tpu.models.layers import he_uniform


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

    timed(name, f, x_bank, it, sync)


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
    r = cfg.model.rpn

    bwd_probe(_Block(64, 3, 1, r.bn_momentum, r.bn_eps, separable=False),
              (B, ny, nx, 64), rng, "block1 s1 64ch 4conv", it, sync)
    bwd_probe(_Block(128, 5, 2, r.bn_momentum, r.bn_eps, separable=False),
              (B, ny, nx, 64), rng, "block2 s2 128ch 6conv", it, sync)
    bwd_probe(_Block(256, 5, 2, r.bn_momentum, r.bn_eps, separable=False),
              (B, ny // 2, nx // 2, 128), rng, "block3 s2 256ch 6conv",
              it, sync)
    bwd_probe(_Deconv(128, 1, r.bn_momentum, r.bn_eps),
              (B, ny, nx, 64), rng, "deconv1 s1", it, sync)
    bwd_probe(_Deconv(128, 2, r.bn_momentum, r.bn_eps),
              (B, ny // 2, nx // 2, 128), rng, "deconv2 s2", it, sync)
    bwd_probe(_Deconv(128, 4, r.bn_momentum, r.bn_eps),
              (B, ny // 4, nx // 4, 256), rng, "deconv3 s4", it, sync)

    class Heads(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool):
            a = nn.Conv(42, (1, 1), use_bias=True, kernel_init=he_uniform,
                        name="conv_box")(x)
            b = nn.Conv(18, (1, 1), use_bias=True, kernel_init=he_uniform,
                        name="conv_cls")(x)
            c = nn.Conv(12, (1, 1), use_bias=True, kernel_init=he_uniform,
                        name="conv_dir")(x)
            return jnp.concatenate([a, b, c], -1)

    class HeadsWrap(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool):
            return Heads(name="h")(x, train)

    bwd_probe(HeadsWrap(), (B, ny, nx, 384), rng, "heads 1x1 384->72",
              it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
