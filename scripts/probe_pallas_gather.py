"""Pallas fused gather-conv probe for the SECOND sparse middle.

ops/sparse_conv.py::gather_conv is the hot op of the sparse middle
extractor (~1 ms/layer at V=20k, C=64, K=27): one fused XLA gather
materializes [K, V, Cin] in HBM (~138 MB f32), then a batched einsum
re-reads it. A Pallas kernel that keeps the whole [V, Cin] feature table
resident in VMEM (20k x 64 f32 = 5 MB) and gathers each output tile's
rows directly from VMEM never touches HBM for the intermediate at all.

The open question this probe answers empirically: does Mosaic lower a
row gather (`jnp.take(table, idx, axis=0)` with a traced int vector)
inside a TPU kernel, and at what throughput vs the XLA fused gather?

Variants:
  A. XLA fused (current gather_conv)
  B. Pallas: VMEM-resident table, per-tile take + K-unrolled matmuls
  C. Pallas: same but one [TILE*K] flat take + reshaped batched dot

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_pallas_gather.py [--interpret]
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pillars_tpu.ops.sparse_conv import gather_conv


def timed(name, fn, operands, iters, sync):
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
    ms = (total - sync) * 1e3 / iters
    print(f"{name:<46s} {ms:8.3f} ms/iter   (compile+1run {compile_s:.1f}s)")
    return ms


def _kernel_unrolled(f_ref, nbr_ref, w_ref, o_ref, *, K):
    acc = None
    for k in range(K):
        idx = nbr_ref[:, k]
        g = jnp.take(f_ref[...], idx, axis=0)  # [T, Cin]
        t = jnp.dot(g, w_ref[k], preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    o_ref[...] = acc.astype(o_ref.dtype)


def _kernel_flat(f_ref, nbr_ref, w_ref, o_ref, *, K):
    T = nbr_ref.shape[0]
    cin = f_ref.shape[1]
    idx = nbr_ref[...].T.reshape(-1)  # tap-major [K*T]
    g = jnp.take(f_ref[...], idx, axis=0).reshape(K, T, cin)
    o_ref[...] = jax.lax.dot_general(
        g, w_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).sum(0).astype(o_ref.dtype)


def pallas_gather_conv(features, nbr, weights, tile=512, flat=False,
                       interpret=False):
    V, cin = features.shape
    Vo, K = nbr.shape
    cout = weights.shape[2]
    assert Vo % tile == 0, (Vo, tile)
    ext = jnp.concatenate(
        [features, jnp.zeros((1, cin), features.dtype)], axis=0)
    # pad the guard row region to a sublane multiple
    pad = (-ext.shape[0]) % 8
    ext = jnp.pad(ext, ((0, pad), (0, 0)))
    kern = _kernel_flat if flat else _kernel_unrolled
    return pl.pallas_call(
        functools.partial(kern, K=K),
        grid=(Vo // tile,),
        in_specs=[
            pl.BlockSpec((ext.shape[0], cin), lambda i: (0, 0)),
            pl.BlockSpec((tile, K), lambda i: (i, 0)),
            pl.BlockSpec((K, cin, cout), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Vo, cout), features.dtype),
        interpret=interpret,
    )(ext, nbr, weights)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--v", type=int, default=20480)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--k", type=int, default=27)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    V, C, K = args.v, args.c, args.k
    feats = jnp.asarray(rng.randn(V, C).astype(np.float32))
    # realistic rulebook: ~70% valid neighbors, sentinel V elsewhere
    nbr_np = rng.randint(0, V, size=(V, K)).astype(np.int32)
    nbr_np[rng.rand(V, K) > 0.7] = V
    nbr = jnp.asarray(nbr_np)
    w = jnp.asarray(rng.randn(K, C, C).astype(np.float32) * 0.05)

    want = np.asarray(gather_conv(feats, nbr, w))
    for flat in (False, True):
        name = "flat" if flat else "unrolled"
        try:
            got = np.asarray(pallas_gather_conv(
                feats, nbr, w, flat=flat, interpret=args.interpret))
        except Exception as e:  # noqa: BLE001
            print(f"pallas {name}: FAILED to lower/run: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            continue
        err = np.abs(got - want).max()
        print(f"pallas {name}: max|diff| {err:.3e}")

    if args.interpret:
        return

    # device timing (scan-inside-jit clock, CLAUDE.md methodology):
    # warm the sync op first, then min-of-3 — a cold first dispatch
    # includes trace+compile and would over-correct every ms/iter below
    dummy = jnp.zeros((1,), jnp.float32)
    basef = jax.jit(lambda x: x + 1)
    jax.device_get(basef(dummy))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(basef(dummy))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms")

    ops = (feats[None], nbr[None], w[None])

    def fa(acc, t):
        f, n, ww = t
        return acc + gather_conv(f, n, ww).sum(), None

    timed("A: XLA fused gather_conv", fa, ops, args.iters, sync)

    for flat, nm in ((False, "B: pallas unrolled"), (True, "C: pallas flat")):
        def fp(acc, t, _flat=flat):
            f, n, ww = t
            return acc + pallas_gather_conv(f, n, ww, flat=_flat).sum(), None
        try:
            timed(nm, fp, ops, args.iters, sync)
        except Exception as e:  # noqa: BLE001
            print(f"{nm}: FAILED: {type(e).__name__}: {str(e)[:300]}")
    print("done")


if __name__ == "__main__":
    main()
