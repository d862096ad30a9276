"""Third-level bisect: assemble stage 0 of the sparse middle extractor
manually from ops/sparse_conv.py pieces and time cumulative prefixes, to
find where the composed stage loses ~70 ms vs the component sum
(probe_sparse_mid2.py: stage0-only-as-module 82.8 ms; components ~13 ms).

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_sparse_mid3.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
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


def bank(rng, nb, cfg, npts):
    det = PillarsDetector(cfg)
    maxpts = cfg.model.voxel.max_points
    pts = np.zeros((nb, 1, maxpts, 4), np.float32)
    for c in range(nb):
        pts[c, 0, :npts, 0] = rng.uniform(0.0, 70.0, npts)
        pts[c, 0, :npts, 1] = rng.uniform(-40.0, 40.0, npts)
        pts[c, 0, :npts, 2] = rng.uniform(-3.0, 1.0, npts)
        pts[c, 0, :npts, 3] = rng.uniform(0.0, 1.0, npts)
    num = jnp.full((1,), npts, jnp.int32)
    vb = jax.jit(jax.vmap(
        lambda p: det.voxelize_batch(p, num)))(jnp.asarray(pts))
    return det, vb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--npts", type=int, default=100000)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    NB = 2

    cfg = Config.from_yaml("configs/kitti_second.yaml")
    det, vb = bank(rng, NB, cfg, args.npts)
    gx, gy, gz = cfg.model.voxel.grid_size
    dims = (int(gz), int(gy), int(gx))
    n_cells = dims[0] * dims[1] * dims[2]
    C = 16
    w_subm = jnp.asarray(rng.randn(27, 4, C).astype(np.float32) * 0.1)
    w_down = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)

    @jax.jit
    def basef(v):
        return jnp.sum(v.coords[0, 0])

    _ = jax.device_get(basef(vb))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(basef(vb))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms", flush=True)
    it = args.iters

    def mean_feats(v):
        # pointwise voxelizer (kitti_second config): scan-wise means ready
        return v.voxel_mean[0]

    def keys_of(v):
        c = v.coords[0]
        k = ((c[..., 0] * dims[1] + c[..., 1]) * dims[2] + c[..., 2])
        return (jnp.where(v.pillar_mask[0], k, n_cells).astype(jnp.int32),
                v.pillar_mask[0])

    # --- cumulative prefixes -------------------------------------------
    def pA(carry, v):
        f = mean_feats(v)
        return carry + jnp.sum(f[0]).astype(jnp.float32), None

    def pB(carry, v):
        keys, valid = keys_of(v)
        nbr = sp.neighbor_indices(keys, valid, dims, (3, 3, 3))
        return carry + jnp.sum(nbr[:, 0]).astype(jnp.float32), None

    def conv(f, nbr):
        return jax.nn.relu(sp.gather_conv(f, nbr, w_subm))

    def pC(carry, v):
        f = mean_feats(v)
        keys, valid = keys_of(v)
        nbr = sp.neighbor_indices(keys, valid, dims, (3, 3, 3))
        x = conv(f, nbr)
        return carry + jnp.sum(x[0]).astype(jnp.float32), None

    def pD(carry, v):
        f = mean_feats(v)
        keys, valid = keys_of(v)
        nbr = sp.neighbor_indices(keys, valid, dims, (3, 3, 3))
        x = conv(f, nbr)
        ok, ov, _ = sp.downsample_active_set(
            keys, valid, dims, (3, 3, 3), (2, 2, 2), (1, 1, 1), 20000)
        return (carry + jnp.sum(x[0]).astype(jnp.float32)
                + jnp.sum(ok[0]).astype(jnp.float32)), None

    odims = tuple(sp.conv_out_dim(n, 3, s, 1)
                  for n, s in zip(dims, (2, 2, 2)))

    def pE(carry, v):
        f = mean_feats(v)
        keys, valid = keys_of(v)
        nbr = sp.neighbor_indices(keys, valid, dims, (3, 3, 3))
        x = conv(f, nbr)
        ok, ov, _ = sp.downsample_active_set(
            keys, valid, dims, (3, 3, 3), (2, 2, 2), (1, 1, 1), 20000)
        nbr2 = sp.strided_rulebook(keys, valid, ok, ov, dims, odims,
                                   (3, 3, 3), (2, 2, 2), (1, 1, 1))
        return (carry + jnp.sum(x[0]).astype(jnp.float32)
                + jnp.sum(nbr2[:, 0]).astype(jnp.float32)), None

    def pF(carry, v):
        f = mean_feats(v)
        keys, valid = keys_of(v)
        nbr = sp.neighbor_indices(keys, valid, dims, (3, 3, 3))
        x = conv(f, nbr)
        ok, ov, _ = sp.downsample_active_set(
            keys, valid, dims, (3, 3, 3), (2, 2, 2), (1, 1, 1), 20000)
        nbr2 = sp.strided_rulebook(keys, valid, ok, ov, dims, odims,
                                   (3, 3, 3), (2, 2, 2), (1, 1, 1))
        y = jax.nn.relu(sp.gather_conv(x, nbr2, w_down))
        return carry + jnp.sum(y[0]).astype(jnp.float32), None

    def pG(carry, v):
        f = mean_feats(v)
        keys, valid = keys_of(v)
        nbr = sp.neighbor_indices(keys, valid, dims, (3, 3, 3))
        x = conv(f, nbr)
        ok, ov, _ = sp.downsample_active_set(
            keys, valid, dims, (3, 3, 3), (2, 2, 2), (1, 1, 1), 20000)
        nbr2 = sp.strided_rulebook(keys, valid, ok, ov, dims, odims,
                                   (3, 3, 3), (2, 2, 2), (1, 1, 1))
        y = jax.nn.relu(sp.gather_conv(x, nbr2, w_down))
        onz, ony, onx = odims
        canvas = jnp.zeros((onz * ony * onx, C), y.dtype)
        kk = jnp.where(ov, ok, onz * ony * onx)
        canvas = canvas.at[kk].add(jnp.where(ov[:, None], y, 0),
                                   mode="drop", indices_are_sorted=True)
        canvas = canvas.reshape(onz, ony, onx, C)
        bev = jnp.transpose(canvas, (1, 2, 0, 3)).reshape(ony, onx, -1)
        return carry + jnp.sum(bev[0, 0]).astype(jnp.float32), None

    timed("A: mean_feats", pA, vb, it, sync)
    timed("B: subm rulebook", pB, vb, it, sync)
    timed("C: B + entry conv", pC, vb, it, sync)
    timed("D: C + downsample set", pD, vb, it, sync)
    timed("E: D + strided rulebook", pE, vb, it, sync)
    timed("F: E + down conv", pF, vb, it, sync)
    timed("G: F + canvas scatter+fold", pG, vb, it, sync)
    print("done", flush=True)


if __name__ == "__main__":
    main()
