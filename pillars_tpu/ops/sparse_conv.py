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


def _last_two_sources_scan(seed_idx, seed_key, is_src):
    """Forward associative scan propagating the LAST TWO source rows
    (index, key) at or before each position ("last-k concat" is
    associative). Non-source rows carry count 0 and adopt the combined
    state. Returns (last_idx, last_key, prev_idx, prev_key, count)."""
    cnt = is_src.astype(jnp.int32)

    def op(a, c):
        a_li, a_lk, a_pi, a_pk, a_n = a
        c_li, c_lk, c_pi, c_pk, c_n = c
        # combined last-two = last two of (a's sources then c's sources)
        li = jnp.where(c_n >= 1, c_li, a_li)
        lk = jnp.where(c_n >= 1, c_lk, a_lk)
        pi = jnp.where(c_n >= 2, c_pi, jnp.where(c_n == 1, a_li, a_pi))
        pk = jnp.where(c_n >= 2, c_pk, jnp.where(c_n == 1, a_lk, a_pk))
        n = jnp.minimum(a_n + c_n, 2)
        return (li, lk, pi, pk, n)

    # element state: sources carry themselves (count 1), queries empty
    state = (jnp.where(is_src, seed_idx, 0),
             jnp.where(is_src, seed_key, -1),
             jnp.zeros_like(seed_idx),
             jnp.full_like(seed_key, -1),
             cnt)
    return jax.lax.associative_scan(op, state, axis=0)


def neighbor_indices_33(keys: jax.Array, valid: jax.Array,
                        dims: Tuple[int, int, int]) -> jax.Array:
    """3x3x3 submanifold rulebook with 2.8x less sort volume than the
    generic path: ONE match per (dz, dy) combo (9 query sets instead of
    27), with the three x-taps derived from the sorted structure — the
    predecessor run (last two sources <= q, forward scan) gives the dx=0
    and dx=-1 neighbors, the successor (reverse scan) gives dx=+1,
    because x-adjacent cells are key-adjacent integers.
    Returns [V, 27] in kernel_offsets((3,3,3)) tap order."""
    nz, ny, nx = dims
    n_cells = nz * ny * nx
    V = keys.shape[0]
    assert 2 * (n_cells + 1) < 2**31
    z, y, x = _decompose(keys, dims)

    qk, qv = [], []
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            zz = z + dz
            yy = y + dy
            inb = (zz >= 0) & (zz < nz) & (yy >= 0) & (yy < ny) & valid
            qk.append(keys + (dz * ny + dy) * nx)
            qv.append(inb)
    rm, r0, rp = _match9_xtriple(keys, valid, jnp.concatenate(qk),
                                 jnp.concatenate(qv), n_cells, 9)

    # x-bound masks (key adjacency wraps rows; real grid does not)
    rm = jnp.where((x >= 1)[None, :], rm, V)
    rp = jnp.where((x <= nx - 2)[None, :], rp, V)

    # interleave to kernel_offsets order: tap index = (dz*3 + dy)*3 + dx
    taps = []
    for c in range(9):
        taps.extend([rm[c], r0[c], rp[c]])
    return jnp.stack(taps, axis=-1)


def _match9_xtriple(keys, valid, qk, qv, n_cells: int, n_sets: int):
    """Shared core of the kernel-x-size-3 fast paths: match ``n_sets``
    concatenated query key sets against the sorted source keys and return,
    PER QUERY, the source rows holding keys q-1 / q / q+1 — from one sort,
    a last-two-sources forward scan (predecessor pair) and a successor
    reverse fill. Caller applies x-boundary masks (key adjacency wraps
    grid rows). Returns three [n_sets, V_src] arrays (sentinel V_src)."""
    V = keys.shape[0]
    M = qk.shape[0]
    big = jnp.int32(n_cells)
    k_src = jnp.where(valid, keys, big) * 2
    k_qry = jnp.where(qv, qk, big) * 2 + 1
    kall = jnp.concatenate([k_src, k_qry])
    pay = jnp.arange(V + M, dtype=jnp.int32)
    sk, sp = jax.lax.sort((kall, pay), num_keys=1)

    is_src = sp < V
    qkey = sk >> 1
    li, lk, pi, pk, _ = _last_two_sources_scan(
        jnp.where(is_src, sp, V), jnp.where(is_src, qkey, -1), is_src)
    # successor source (first source after this position): reverse fill
    rev = lambda a: jnp.flip(a, axis=0)
    ni = rev(_seg_fill(rev(jnp.where(is_src, sp, V)), rev(is_src)))
    nk = rev(_seg_fill(rev(jnp.where(is_src, qkey, -jnp.int32(2))),
                       rev(is_src)))

    in_grid = qkey < n_cells
    r0 = jnp.where((lk == qkey) & in_grid, li, V)                # dx = 0
    rm = jnp.where(in_grid & jnp.where(lk == qkey, pk == qkey - 1,
                                       lk == qkey - 1),
                   jnp.where(lk == qkey, pi, li), V)             # dx = -1
    rp = jnp.where((nk == qkey + 1) & in_grid, ni, V)            # dx = +1

    # restore query order: payload permutation sort-back, queries at tail
    _, o_m, o_0, o_p = jax.lax.sort((sp, rm, r0, rp), num_keys=1)
    out = lambda o: jax.lax.slice_in_dim(o, V, V + M).reshape(
        n_sets, M // n_sets)
    return out(o_m), out(o_0), out(o_p)


def neighbor_indices(keys: jax.Array, valid: jax.Array,
                     dims: Tuple[int, int, int],
                     kernel: Sequence[int],
                     ) -> jax.Array:
    """Submanifold rulebook: [V, K] input row of the neighbor at
    ``p - pad + tap`` for every active voxel p (V on miss/padding).

    Padding is the submanifold choice pad = (k-1)//2 per dim, so the
    center tap is the voxel itself. The 3x3x3 kernel takes the reduced-
    sort-volume path (neighbor_indices_33)."""
    if tuple(kernel) == (3, 3, 3):
        return neighbor_indices_33(keys, valid, dims)
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

    Candidate generation enumerates the PER-DIM output window
    ``ceil((c-p)/s) .. floor((c+p)/s)`` instead of the K kernel taps:
    2x2x2 = 8 candidate rows per voxel for a stride-2 3^3 conv instead of
    27 (and 2 for the (3,1,1)/(2,1,1) z-squash), which is the sort volume
    of the dedup below. Requires the submanifold padding (k-1)//2 and
    k in {1, 3} per dim (all SECOND topologies).
    """
    nz, ny, nx = dims
    odims = tuple(conv_out_dim(n, k, s, p) for n, k, s, p in
                  zip(dims, kernel, stride, padding))
    onz, ony, onx = odims
    for k, p in zip(kernel, padding):
        assert p == (k - 1) // 2 and k in (1, 3), (
            "lean candidate enumeration assumes k in {1,3}, pad (k-1)//2")
    z, y, x = _decompose(keys, dims)

    def dim_cands(c, k, s, odim):
        """[(o_j, valid_j)] covering every output whose window contains c."""
        if k == 3:
            start = (c + s - 2) // s          # ceil((c-1)/s), floor div
            end = (c + 1) // s
            n = 2 // s + 1
        else:  # k == 1: only the exactly-divisible output
            start = c // s
            end = jnp.where(c == start * s, start, start - 1)
            n = 1
        return [(start + j, (start + j <= end) & (start + j >= 0)
                 & (start + j < odim)) for j in range(n)]

    cand, cval = [], []
    for oz, vz in dim_cands(z, kernel[0], stride[0], onz):
        for oy, vy in dim_cands(y, kernel[1], stride[1], ony):
            for ox, vx in dim_cands(x, kernel[2], stride[2], onx):
                cand.append((oz * ony + oy) * onx + ox)
                cval.append(vz & vy & vx & valid)
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


def strided_rulebook_33(keys: jax.Array, valid: jax.Array,
                        out_keys: jax.Array, out_valid: jax.Array,
                        dims: Tuple[int, int, int],
                        odims: Tuple[int, int, int],
                        stride: Sequence[int]) -> jax.Array:
    """3x3x3 strided rulebook via the 9-combo match (see
    neighbor_indices_33): input x positions for the three dx taps are the
    consecutive integers ``sx*ox - 1 + {0,1,2}``, so one match per
    (dz, dy) combo at the center x resolves all three from the sorted
    structure. Padding fixed at (1,1,1)."""
    nz, ny, nx = dims
    n_cells = nz * ny * nx
    V = keys.shape[0]
    oz, oy, ox = _decompose(out_keys, odims)
    xc = ox * stride[2]  # sx*ox - pad + 1; in [0, nx-1] for k3 p1 by
    # construction of odims
    qk, qv = [], []
    for dz in (0, 1, 2):
        for dy in (0, 1, 2):
            zz = oz * stride[0] - 1 + dz
            yy = oy * stride[1] - 1 + dy
            inb = ((zz >= 0) & (zz < nz) & (yy >= 0) & (yy < ny)
                   & (xc >= 0) & (xc < nx) & out_valid)
            qk.append((zz * ny + yy) * nx + xc)
            qv.append(inb)
    rm, r0, rp = _match9_xtriple(keys, valid, jnp.concatenate(qk),
                                 jnp.concatenate(qv), n_cells, 9)
    rm = jnp.where((xc >= 1)[None, :], rm, V)
    rp = jnp.where((xc <= nx - 2)[None, :], rp, V)
    taps = []
    for c in range(9):
        taps.extend([rm[c], r0[c], rp[c]])
    return jnp.stack(taps, axis=-1)


def strided_rulebook(keys: jax.Array, valid: jax.Array,
                     out_keys: jax.Array, out_valid: jax.Array,
                     dims: Tuple[int, int, int],
                     odims: Tuple[int, int, int],
                     kernel: Sequence[int],
                     stride: Sequence[int],
                     padding: Sequence[int]) -> jax.Array:
    """[V_out, K] input row feeding output cell o at tap t:
    input position ``stride*o - pad + tap`` (V on miss). The 3x3x3
    kernel with padding (1,1,1) takes the reduced-sort-volume path."""
    if tuple(kernel) == (3, 3, 3) and tuple(padding) == (1, 1, 1):
        return strided_rulebook_33(keys, valid, out_keys, out_valid,
                                   dims, odims, stride)
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
    One zero guard row makes the sentinel inert. A skip-the-identity-tap
    optimization for submanifold convs was measured and rejected: it would
    split the single fused gather into two launches, which ran slower.
    """
    V, cin = features.shape
    K = nbr.shape[1]
    ext = jnp.concatenate(
        [features, jnp.zeros((1, cin), features.dtype)], axis=0)
    # ONE fused gather (tap-major index vector) + a batched einsum beats
    # K separate gather+matmul pairs 1.8x at SECOND scale (V=20k, C=64:
    # 0.98 vs 1.78 ms/layer, scripts/probe_gather_conv.py) — fewer op
    # launches, and the contraction runs as one MXU batch.
    g = jnp.take(ext, nbr.T.reshape(-1), axis=0).reshape(K, -1, cin)
    return jnp.einsum("kvc,kcd->vd", g, weights)


