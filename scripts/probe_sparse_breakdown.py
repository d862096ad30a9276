"""Break down the sparse middle extractor cost: rulebook sorts vs conv
gathers/matmuls, at full-KITTI scale (V=20k, 90M-cell grid).

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_sparse_breakdown.py
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


DIMS = (40, 1600, 1408)


def make_bank(rng, nb, v_active, cap):
    n_cells = DIMS[0] * DIMS[1] * DIMS[2]
    keys = np.full((nb, cap), n_cells, np.int64)
    for i in range(nb):
        # cluster actives on a surface-like shell to mimic LiDAR returns
        ks = np.unique(rng.choice(n_cells // 64, v_active) * 64
                       + rng.randint(0, 8, v_active))
        keys[i, :len(ks)] = np.sort(ks)[:cap]
    valid = keys < n_cells
    return (jnp.asarray(keys.astype(np.int32)), jnp.asarray(valid))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--cap", type=int, default=20000)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    NB = 4
    cap = args.cap
    keys_bank, valid_bank = make_bank(rng, NB, cap, cap)
    C = 32
    feats_bank = jnp.asarray(rng.randn(NB, cap, C).astype(np.float32))
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)
    nbr_bank = jax.jit(jax.vmap(
        lambda k, v: sp.neighbor_indices(k, v, DIMS, (3, 3, 3))))(
            keys_bank, valid_bank)

    @jax.jit
    def base(x):
        return jnp.sum(x[0, 0])

    _ = jax.device_get(base(feats_bank))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(base(feats_bank))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms; cap={cap} C={C}", flush=True)
    it = args.iters

    def rulebook(carry, op):
        k, v = op
        nbr = sp.neighbor_indices(k, v, DIMS, (3, 3, 3))
        return carry + jnp.sum(nbr[:, 0]).astype(jnp.float32), None

    timed("subm rulebook (27-tap sort-merge)", rulebook,
          (keys_bank, valid_bank), it, sync)

    def conv(carry, op):
        f, nbr = op
        y = sp.gather_conv(f, nbr, w)
        return carry + jnp.sum(y[0]), None

    timed("gather_conv (27 gathers + matmuls)", conv,
          (feats_bank, nbr_bank), it, sync)

    def down(carry, op):
        k, v = op
        ok, ov, odims = sp.downsample_active_set(
            k, v, DIMS, (3, 3, 3), (2, 2, 2), (1, 1, 1), cap)
        nbr = sp.strided_rulebook(k, v, ok, ov, DIMS, odims,
                                  (3, 3, 3), (2, 2, 2), (1, 1, 1))
        return carry + jnp.sum(nbr[:, 0]).astype(jnp.float32), None

    timed("downsample set + strided rulebook", down,
          (keys_bank, valid_bank), it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
