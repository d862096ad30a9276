"""Measure segmented scatter-max formulations for the DenseCellPFN
front end at batch 8 (TODO.md: the one wide scatter costs ~3 ms).

Layout: M = B*32768 rows sorted by cell_global (non-decreasing),
destination BC = B*10240 cells, payload width 129 (128 features + fused
count channel). Variants:
  V1  scatter-max, width 129 (current code)
  V2  scatter-max, width 128 (lane-aligned; count channel dropped)
  V3  prefix-max associative scan + scatter-SET of segment-end rows
      (sorted + unique indices)
  V4  scatter-max bf16 payload
  V5  two-level: adjacent-pair max merge (x4) then scatter-max of the
      reduced-but-same-rowcount array (tests whether value locality helps)

Usage: PYTHONPATH=/root/.axon_site:. python scripts/probe_scatter.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


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
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    B, M1, C1, F = args.batch, 32768, 10240, 128
    M, BC = B * M1, B * C1
    rng = np.random.RandomState(0)
    NB = 4

    cells = np.sort(rng.randint(0, C1, (NB, B, M1)), axis=-1)
    cells = (cells + np.arange(B)[None, :, None] * C1).reshape(NB, M)
    vals = rng.randn(NB, M, F + 1).astype(np.float32)
    cell_bank = jnp.asarray(cells, jnp.int32)
    val_bank = jnp.asarray(vals)

    @jax.jit
    def base(x):
        return jnp.sum(x[0, 0])

    _ = jax.device_get(base(val_bank))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(base(val_bank))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms; M={M} BC={BC}", flush=True)
    it = args.iters
    neg = -jnp.inf

    def v1(carry, op):
        cell, val = op
        seg = jnp.full((BC, F + 1), neg, jnp.float32)
        seg = seg.at[cell].max(val, mode="drop", indices_are_sorted=True)
        return carry + jnp.sum(seg[0]), None

    timed("V1 scatter-max 129w", v1, (cell_bank, val_bank), it, sync)

    def v2(carry, op):
        cell, val = op
        seg = jnp.full((BC, F), neg, jnp.float32)
        seg = seg.at[cell].max(val[:, :F], mode="drop",
                               indices_are_sorted=True)
        return carry + jnp.sum(seg[0]), None

    timed("V2 scatter-max 128w", v2, (cell_bank, val_bank), it, sync)

    def v3(carry, op):
        cell, val = op
        nxt = jnp.concatenate([cell[1:], jnp.full((1,), -1, cell.dtype)])
        is_end = cell != nxt
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), cell[1:] != cell[:-1]])

        def op_(a, c):
            av, af = a
            cv, cf = c
            return (jnp.where(cf, cv, jnp.maximum(av, cv)), af | cf)

        f2 = jnp.broadcast_to(is_start[:, None], val.shape)
        pmax, _ = jax.lax.associative_scan(op_, (val, f2), axis=0)
        tgt = jnp.where(is_end, cell, BC)
        seg = jnp.full((BC, F + 1), neg, jnp.float32)
        seg = seg.at[tgt].set(pmax, mode="drop", indices_are_sorted=True,
                              unique_indices=True)
        return carry + jnp.sum(seg[0]), None

    timed("V3 scan + seg-end scatter-set", v3, (cell_bank, val_bank),
          it, sync)

    def v4(carry, op):
        cell, val = op
        seg = jnp.full((BC, F + 1), neg, jnp.bfloat16)
        seg = seg.at[cell].max(val.astype(jnp.bfloat16), mode="drop",
                               indices_are_sorted=True)
        return carry + jnp.sum(seg[0].astype(jnp.float32)), None

    timed("V4 scatter-max bf16", v4, (cell_bank, val_bank), it, sync)

    def v5(carry, op):
        cell, val = op
        v = val
        c = cell
        for _ in range(2):
            even_c, odd_c = c[0::2], c[1::2]
            same = even_c == odd_c
            merged = jnp.where(same[:, None],
                               jnp.maximum(v[0::2], v[1::2]), v[0::2])
            # odd rows that were merged become inert (-inf at dummy cell)
            v = jnp.concatenate([merged, jnp.where(same[:, None],
                                                   neg, v[1::2])], axis=0)
            c = jnp.concatenate([even_c, jnp.where(same, BC, odd_c)])
        seg = jnp.full((BC, F + 1), neg, jnp.float32)
        seg = seg.at[c].max(v, mode="drop", indices_are_sorted=False)
        return carry + jnp.sum(seg[0]), None

    timed("V5 pair-merge then scatter", v5, (cell_bank, val_bank), it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
