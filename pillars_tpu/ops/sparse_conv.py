"""Sparse 3D convolutions for the SECOND voxel middle extractor.

SECOND's middle extractor (the lineage of the reference repo — it is a
customization of traveller59's second.pytorch, see SURVEY.md §0) runs
submanifold + strided sparse 3D convolutions over an almost-empty voxel
grid (full-KITTI: 1408 x 1600 x 40 cells, ~20k active, 0.02%% density).
Dense conv3d at that scale is impossible (the dense activation grid alone
is gigabytes), and the CUDA sparse-conv approach (hash tables + per-pair
gather "rulebooks" built with atomics) does not map to TPU.

TPU-native design — everything static-shape, no hash tables, no
data-dependent control flow:

* Active voxels live in a sorted, statically padded key array
  (``key = (z*ny + y)*nx + x``; padding rows carry a sentinel key that
  sorts last). The voxelizer already emits this layout.
* Neighbor lookup for ALL kernel taps is ONE fused sort-merge
  ("rulebook build", :func:`neighbor_indices`): concatenate the input
  keys with the K query key sets (tag bit orders a source row before the
  queries that equal it), one sort, an associative-scan "last source"
  fill, one sort back by tag. Pure vector work — sorts, scans,
  comparisons — which is exactly what the TPU does well; the only
  row-addressed memory ops in the whole extractor are the per-tap
  feature-row gathers inside the conv itself (flat 1-D global indices,
  the cheap kind — see CLAUDE.md TPU op costs).
* A rulebook is built once per ACTIVE SET and shared by every
  submanifold layer of a stage (submanifold convs preserve the active
  set by definition); only strided convs pay for a new active set.
* Strided (non-submanifold) convs derive their output active set
  exactly: a cell is active iff its receptive field contains >= 1 active
  input (second.pytorch SparseConv3d semantics). Candidate generation is
  K offsets per input voxel -> sort -> first-of-run dedup -> compaction
  sort, the same pattern as the large-grid voxelizer
  (ops/voxelize.py::voxelize_points).

Static caps: the active count is capped at ``max_active`` per stage
(padding rows are inert). If a strided conv produces more distinct output
cells than the cap, the LOWEST keys win (ascending (z, y, x) scan order)
— deterministic, and documented here because it is the one place the
sparse path can drop data.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pillars_tpu.ops.voxelize import _seg_fill


class SparseVoxels(NamedTuple):
    """One sample's active voxel set in sorted-key layout.

    keys:     [V] int32, ascending; ``n_cells`` sentinel on padding rows
    features: [V, C]
    valid:    [V] bool (prefix of real voxels)
    """

    keys: jax.Array
    features: jax.Array
    valid: jax.Array


def conv_out_dim(n: int, k: int, s: int, p: int) -> int:
    """Standard conv output size (second.pytorch SparseConv3d formula)."""
    return (n + 2 * p - k) // s + 1


def kernel_offsets(kernel: Sequence[int]) -> np.ndarray:
    """[K, 3] (dz, dy, dx) tap offsets in z-major scan order."""
    kz, ky, kx = kernel
    return np.stack(np.meshgrid(np.arange(kz), np.arange(ky),
                                np.arange(kx), indexing="ij"),
                    axis=-1).reshape(-1, 3)


def _decompose(keys: jax.Array, dims: Tuple[int, int, int]):
    nz, ny, nx = dims
    z = keys // (ny * nx)
    rem = keys - z * (ny * nx)
    y = rem // nx
    x = rem - y * nx
    return z, y, x


def match_sorted(keys: jax.Array, valid: jax.Array, qkeys: jax.Array,
                 qvalid: jax.Array, n_cells: int) -> jax.Array:
    """For each query key, the row in ``keys`` holding that key, else V.

    ``keys`` must be ascending and unique over its valid prefix (the
    voxelizer layout). Vector-only implementation: tag-bit sort + last-
    source associative fill + sort back; no scatters, no searchsorted
    (pathological on TPU — CLAUDE.md).
    """
    V = keys.shape[0]
    M = qkeys.shape[0]
    assert 2 * (n_cells + 1) < 2**31, "packed (key, tag) must fit int32"
    big = jnp.int32(n_cells)
    k_src = jnp.where(valid, keys, big) * 2        # tag 0: source rows
    k_qry = jnp.where(qvalid, qkeys, big) * 2 + 1  # tag 1: query rows
    kall = jnp.concatenate([k_src, k_qry])
    pay = jnp.arange(V + M, dtype=jnp.int32)
    sk, sp = jax.lax.sort((kall, pay), num_keys=1)

    is_src = sp < V
    # propagate the most recent source (row index, key) forward; query rows
    # seed (V, -1) so a query with no preceding source stays unmatched
    seed_idx = jnp.where(is_src, sp, V)
    seed_key = jnp.where(is_src, sk >> 1, -1)
    prop_idx = _seg_fill(seed_idx, is_src)
    prop_key = _seg_fill(seed_key, is_src)
    matched = (~is_src) & (prop_key == (sk >> 1)) & (prop_key < n_cells)
    res = jnp.where(matched, prop_idx, V)

    # restore query order: payload is a permutation, so sorting by it puts
    # query m's result at row V + m — vector work instead of a narrow
    # scatter (row-latency-bound at these sizes)
    _, res_o = jax.lax.sort((sp, res), num_keys=1)
    return jax.lax.slice_in_dim(res_o, V, V + M)


def neighbor_indices(keys: jax.Array, valid: jax.Array,
                     dims: Tuple[int, int, int],
                     kernel: Sequence[int],
                     ) -> jax.Array:
    """Submanifold rulebook: [V, K] input row of the neighbor at
    ``p - pad + tap`` for every active voxel p (V on miss/padding).

    Padding is the submanifold choice pad = (k-1)//2 per dim, so the
    center tap is the voxel itself.
    """
    nz, ny, nx = dims
    V = keys.shape[0]
    offs = kernel_offsets(kernel)
    pads = (np.asarray(kernel) - 1) // 2
    z, y, x = _decompose(keys, dims)

    qk, qv = [], []
    for dz, dy, dx in offs:
        zz = z + int(dz - pads[0])
        yy = y + int(dy - pads[1])
        xx = x + int(dx - pads[2])
        inb = ((zz >= 0) & (zz < nz) & (yy >= 0) & (yy < ny)
               & (xx >= 0) & (xx < nx) & valid)
        qk.append((zz * ny + yy) * nx + xx)
        qv.append(inb)
    res = match_sorted(keys, valid, jnp.concatenate(qk),
                       jnp.concatenate(qv), nz * ny * nx)
    return res.reshape(len(offs), V).T


def downsample_active_set(keys: jax.Array, valid: jax.Array,
                          dims: Tuple[int, int, int],
                          kernel: Sequence[int],
                          stride: Sequence[int],
                          padding: Sequence[int],
                          max_active: int):
    """Active output cells of a strided sparse conv, sorted-unique.

    A cell o is active iff some active input lies in its window
    ``stride*o - pad + [0, k)`` (exact second.pytorch semantics). Returns
    (out_keys [max_active], out_valid [max_active]) over the output grid
    ``conv_out_dim(dims)``.
    """
    nz, ny, nx = dims
    odims = tuple(conv_out_dim(n, k, s, p) for n, k, s, p in
                  zip(dims, kernel, stride, padding))
    onz, ony, onx = odims
    z, y, x = _decompose(keys, dims)

    cand, cval = [], []
    for dz, dy, dx in kernel_offsets(kernel):
        num = (z + padding[0] - int(dz), y + padding[1] - int(dy),
               x + padding[2] - int(dx))
        oz = num[0] // stride[0]
        oy = num[1] // stride[1]
        ox = num[2] // stride[2]
        exact = ((oz * stride[0] == num[0]) & (oy * stride[1] == num[1])
                 & (ox * stride[2] == num[2]))
        inb = ((oz >= 0) & (oz < onz) & (oy >= 0) & (oy < ony)
               & (ox >= 0) & (ox < onx) & exact & valid)
        cand.append((oz * ony + oy) * onx + ox)
        cval.append(inb)
    n_ocells = onz * ony * onx
    ckeys = jnp.where(jnp.concatenate(cval), jnp.concatenate(cand),
                      n_ocells)
    ckeys = jnp.sort(ckeys)
    first = jnp.concatenate([jnp.ones((1,), bool),
                             ckeys[1:] != ckeys[:-1]])
    uniq = jnp.where(first & (ckeys < n_ocells), ckeys, n_ocells)
    uniq = jnp.sort(uniq)  # compaction: distinct keys to the front
    if uniq.shape[0] < max_active:  # cap above K*V candidates: pad sentinel
        uniq = jnp.concatenate([uniq, jnp.full(
            (max_active - uniq.shape[0],), n_ocells, uniq.dtype)])
    out_keys = jax.lax.slice_in_dim(uniq, 0, max_active)
    return out_keys, out_keys < n_ocells, odims


def strided_rulebook(keys: jax.Array, valid: jax.Array,
                     out_keys: jax.Array, out_valid: jax.Array,
                     dims: Tuple[int, int, int],
                     odims: Tuple[int, int, int],
                     kernel: Sequence[int],
                     stride: Sequence[int],
                     padding: Sequence[int]) -> jax.Array:
    """[V_out, K] input row feeding output cell o at tap t:
    input position ``stride*o - pad + tap`` (V on miss)."""
    nz, ny, nx = dims
    Vo = out_keys.shape[0]
    oz, oy, ox = _decompose(out_keys, odims)
    qk, qv = [], []
    for dz, dy, dx in kernel_offsets(kernel):
        zz = oz * stride[0] - padding[0] + int(dz)
        yy = oy * stride[1] - padding[1] + int(dy)
        xx = ox * stride[2] - padding[2] + int(dx)
        inb = ((zz >= 0) & (zz < nz) & (yy >= 0) & (yy < ny)
               & (xx >= 0) & (xx < nx) & out_valid)
        qk.append((zz * ny + yy) * nx + xx)
        qv.append(inb)
    res = match_sorted(keys, valid, jnp.concatenate(qk),
                       jnp.concatenate(qv), nz * ny * nx)
    K = int(np.prod(np.asarray(kernel)))
    return res.reshape(K, Vo).T


def gather_conv(features: jax.Array, nbr: jax.Array,
                weights: jax.Array) -> jax.Array:
    """Sparse conv compute: out[v] = sum_k feats[nbr[v, k]] @ W[k].

    features [V, Cin], nbr [Vo, K] with sentinel V, weights [K, Cin, Cout].
    One zero guard row makes the sentinel inert; each tap is a flat row
    gather (1-D global indices) + an MXU matmul — the gathers are the only
    row-addressed ops in the sparse path.
    """
    V, cin = features.shape
    K = nbr.shape[1]
    ext = jnp.concatenate(
        [features, jnp.zeros((1, cin), features.dtype)], axis=0)
    out = None
    for k in range(K):
        g = jnp.take(ext, nbr[:, k], axis=0, indices_are_sorted=False,
                     fill_value=None)
        contrib = g @ weights[k]
        out = contrib if out is None else out + contrib
    return out
