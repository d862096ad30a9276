"""gather_conv formulations at SECOND scale (V=20k, C=64, 27 taps):
27 separate gathers+matmuls (current) vs one fused gather + batched
einsum, f32 and bf16.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_gather_conv.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.ops import sparse_conv as sp


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
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    NB, V, C, K = 4, 20000, 64, 27

    nbr = rng.randint(0, V + 1, (NB, V, K)).astype(np.int32)
    feats = rng.randn(NB, V, C).astype(np.float32)
    w = jnp.asarray(rng.randn(K, C, C).astype(np.float32) * 0.1)
    nbr_b = jnp.asarray(nbr)
    feats_b = jnp.asarray(feats)

    @jax.jit
    def base(x):
        return jnp.sum(x[0, 0])

    _ = jax.device_get(base(feats_b))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(base(feats_b))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms", flush=True)
    it = args.iters

    def v1(carry, op):
        f, nb = op
        y = sp.gather_conv(f, nb, w)
        return carry + jnp.sum(y[0]), None

    timed("V1 27 gathers+matmuls (current)", v1, (feats_b, nbr_b), it, sync)

    def v2(carry, op):
        f, nb = op
        ext = jnp.concatenate([f, jnp.zeros((1, C), f.dtype)], axis=0)
        g = jnp.take(ext, nb.T.reshape(-1), axis=0).reshape(K, V, C)
        y = jnp.einsum("kvc,kcd->vd", g, w)
        return carry + jnp.sum(y[0]), None

    timed("V2 one gather + batched einsum", v2, (feats_b, nbr_b), it, sync)

    wb = w.astype(jnp.bfloat16)

    def v3(carry, op):
        f, nb = op
        y = sp.gather_conv(f.astype(jnp.bfloat16), nb, wb)
        return carry + jnp.sum(y[0].astype(jnp.float32)), None

    timed("V3 current, bf16", v3, (feats_b, nbr_b), it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
