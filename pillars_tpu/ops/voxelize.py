"""Pillar voxelization as a single jitted, static-shape XLA computation.

The reference voxelizes on the host with a sequential numba kernel
(_points_to_voxel_reverse_kernel, reference load_data.py:593-692): one pass
over the points, a dense (z,y,x)->pillar hash, first-come-first-kept capping
at ``max_points`` per pillar and ``max_voxels`` pillars.

TPU-native design: sort-by-cell + segment arithmetic. A stable sort groups
points by cell while PRESERVING INPUT ORDER within each cell, so the
"first N points in input order are kept" semantics of the reference survive
exactly. Pillar ordering differs (ascending cell id instead of first-arrival
order) — irrelevant downstream, because the PFN is per-pillar and the canvas
scatter is order-invariant. The only observable divergence is WHICH pillars
are dropped when a cloud produces more than ``max_voxels`` distinct cells;
with the shipped config that cannot happen (80*64*2 = 10240 cells < 12000
max_voxels).

Quirk preserved: the shipped config has TWO z-layers (z extent 6.0 m /
voxel_z 4.0 m -> np.round(1.5) == 2, reference load_data.py:2595), so two
pillars can exist at the same (y, x) with different z. The reference's
tf.scatter_nd then ADDS their features on the canvas; see ops/scatter.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pillars_tpu.config import VoxelConfig


class VoxelizedSample(NamedTuple):
    """Static-shape voxelization result for ONE pointcloud.

    voxels:      [P, N, D] points gathered per pillar (zero padded)
    num_points:  [P] int32, points per pillar (capped at N)
    coords:      [P, 3] int32 (z, y, x) grid coordinates, zeros for padding
    pillar_mask: [P] bool, True for real pillars
    """

    voxels: jax.Array
    num_points: jax.Array
    coords: jax.Array
    pillar_mask: jax.Array


class VoxelizedPoints(NamedTuple):
    """Point-major voxelization result for ONE pointcloud — the
    bandwidth-optimal layout for the pointwise PFN (see models/pfn.py).

    The dense [P, N, D] layout wastes ~96%% of its HBM traffic on padding
    with d435i clouds (~2.3 points per pillar on average); keeping points
    flat and carrying a per-point pillar id makes the PFN touch only
    O(num_points) memory.

    points:       [MAXPTS, D] cell-id-sorted points (padding at the tail)
    point_pillar: [MAXPTS] int32 pillar id per point, NON-DECREASING
                  (clamped to P past max_voxels) — monotonicity lets every
                  downstream scatter pass indices_are_sorted=True, which is
                  the difference between a vectorized and a serialized
                  scatter on TPU
    point_kept:   [MAXPTS] bool; False for out-of-range / padding / beyond
                  max_points_per_voxel points (they carry a valid pillar id
                  but must not contribute)
    point_mean:   [MAXPTS, D] per-feature mean over the point's pillar's
                  KEPT points (cols 0-2: the PFN cluster-offset feature,
                  reference pointpillars.py:143-149; remaining cols, e.g.
                  intensity, serve SECOND's SimpleVoxel encoder) —
                  computed here with segmented prefix/suffix scans because
                  a per-point gather of a per-pillar mean is
                  row-latency-bound on TPU (~13 ns/row at 131k rows)
    voxel_mean:   [P, D] per-PILLAR feature means (point_mean compacted to
                  one row per pillar; zeros on padding) — SECOND's
                  SimpleVoxel features without materializing [P, N, D]
    point_zyx:    [MAXPTS, 3] int32 per-point grid cell (z, y, x) — the
                  pillar-center offset source, gather-free
    num_points:   [P] int32 per-pillar counts (capped at N)
    coords:       [P, 3] int32 (z, y, x)
    pillar_mask:  [P] bool
    """

    points: jax.Array
    point_pillar: jax.Array
    point_kept: jax.Array
    point_mean: jax.Array
    point_zyx: jax.Array
    num_points: jax.Array
    coords: jax.Array
    pillar_mask: jax.Array
    voxel_mean: jax.Array


def voxelize(points: jax.Array, num_valid: jax.Array, *,
             voxel_size, point_cloud_range, grid_size,
             max_points_per_voxel: int, max_voxels: int) -> VoxelizedSample:
    """Voxelize one padded pointcloud [MAXPTS, D] (D >= 3) on device.

    ``num_valid`` is the count of real points at the FRONT of the array;
    everything at or past that index is padding.
    """
    maxpts, dim = points.shape
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    pcr = jnp.asarray(point_cloud_range, dtype=points.dtype)
    nx, ny, nz = (int(g) for g in grid_size)
    n_cells = nx * ny * nz
    P = int(max_voxels)
    N = int(max_points_per_voxel)

    idx = jnp.arange(maxpts, dtype=jnp.int32)
    in_count = idx < num_valid

    # per-dim cell coordinate, float32 math like the reference kernel
    c = jnp.floor((points[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
    gs = jnp.asarray([nx, ny, nz], dtype=jnp.int32)
    in_range = jnp.all((c >= 0) & (c < gs), axis=-1)
    valid = in_count & in_range

    # linear cell id in (z, y, x) order; invalid points get a sentinel cell
    cell = (c[:, 2] * ny + c[:, 1]) * nx + c[:, 0]
    cell = jnp.where(valid, cell, n_cells)

    # stable sort keeps input order within each cell -> first-kept semantics
    order = jnp.argsort(cell, stable=True)
    cell_s = cell[order]
    valid_s = valid[order]
    points_s = points[order]

    prev = jnp.concatenate([jnp.full((1,), -1, cell_s.dtype), cell_s[:-1]])
    is_start = cell_s != prev
    pillar_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # per sorted point
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - seg_start

    if n_cells > P:
        # arrival-order pillar cap + overflow point-stream cutoff: the
        # reference kernel BREAKS its point loop when a point would create
        # pillar P+1 (load_data.py:630-637), so every point at or after
        # that position is dropped — see voxelize_points for the
        # order-statistics formulation
        first_pos = _seg_fill(order, is_start)
        start_key = jnp.where(is_start & valid_s, first_pos, maxpts)
        heads_sorted = jnp.sort(start_key)
        thr = heads_sorted[P - 1] if P <= maxpts else maxpts
        cutoff = (heads_sorted[P] if P < maxpts
                  else jnp.asarray(maxpts, jnp.int32))
        seg_keep = (first_pos <= thr) & (order < cutoff)
        pillar_id = jnp.clip(
            jnp.cumsum((is_start & (first_pos <= thr)).astype(
                jnp.int32)) - 1, 0, P)
    else:
        seg_keep = jnp.ones((maxpts,), dtype=bool)

    keep = valid_s & (rank < N) & seg_keep & (pillar_id < P)
    pid = jnp.where(keep, pillar_id, P)  # OOB -> dropped by scatter
    rnk = jnp.where(keep, rank, N)

    voxels = jnp.zeros((P, N, dim), dtype=points.dtype)
    voxels = voxels.at[pid, rnk].set(points_s, mode="drop")

    num_points = jnp.zeros((P,), dtype=jnp.int32)
    num_points = num_points.at[pid].add(keep.astype(jnp.int32), mode="drop")

    # decompose cell ids back to (z, y, x) at segment starts
    z = cell_s // (ny * nx)
    rem = cell_s - z * (ny * nx)
    y = rem // nx
    x = rem - y * nx
    zyx = jnp.stack([z, y, x], axis=-1).astype(jnp.int32)
    start_keep = is_start & valid_s & seg_keep & (pillar_id < P)
    spid = jnp.where(start_keep, pillar_id, P)
    coords = jnp.zeros((P, 3), dtype=jnp.int32)
    coords = coords.at[spid].set(zyx, mode="drop")

    pillar_mask = num_points > 0
    return VoxelizedSample(voxels, num_points, coords, pillar_mask)


def _seg_fill(values: jax.Array, flags: jax.Array) -> jax.Array:
    """Propagate each segment-start value across its segment ("last flagged
    value" scan) — pure vector work, no gathers. ``flags[0]`` must be True
    (the first sorted point always starts a segment)."""

    def op(a, c):
        av, af = a
        cv, cf = c
        return (jnp.where(cf, cv, av), af | cf)

    out, _ = jax.lax.associative_scan(op, (values, flags), axis=0)
    return out


# Big-grid (n_cells > max_voxels) per-pillar reduction strategy: "sort" =
# one maxpts x 9-payload compaction sort (default); "scatter" = three
# sorted [maxpts]->[P] scatters. A/B'd on TPU with every output live
# (scripts/probe_voxelize_live.py, KITTI scale 131k pts): sort 3.2 ms vs
# scatter 6.3 ms — the narrow per-row scatters are row-latency-bound at
# 131k rows exactly as CLAUDE.md's op-cost notes predict. Both tails
# produce identical outputs (tests/test_ops.py large-grid branch).
_BIG_GRID_TAIL = "sort"


def voxelize_points(points: jax.Array, num_valid: jax.Array, *,
                    voxel_size, point_cloud_range, grid_size,
                    max_points_per_voxel: int,
                    max_voxels: int) -> VoxelizedPoints:
    """Point-major variant of :func:`voxelize`; same assignment semantics
    (stable sort by cell keeps the reference's first-N-in-input-order cap)."""
    maxpts, _ = points.shape
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    pcr = jnp.asarray(point_cloud_range, dtype=points.dtype)
    nx, ny, nz = (int(g) for g in grid_size)
    n_cells = nx * ny * nz
    P = int(max_voxels)
    N = int(max_points_per_voxel)

    idx = jnp.arange(maxpts, dtype=jnp.int32)
    in_count = idx < num_valid
    c = jnp.floor((points[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
    gs = jnp.asarray([nx, ny, nz], dtype=jnp.int32)
    valid = in_count & jnp.all((c >= 0) & (c < gs), axis=-1)
    cell = (c[:, 2] * ny + c[:, 1]) * nx + c[:, 0]
    cell = jnp.where(valid, cell, n_cells)

    # Multi-operand sort: carry the point columns THROUGH the sort instead
    # of gathering them afterwards — per-item gathers are row-latency-bound
    # on TPU and pathological under vmap (see CLAUDE.md). With a packable
    # (cell, position) int32 key one unstable sort gives stability for
    # free; for huge grids the position is a tie-breaking second key.
    dim = points.shape[-1]
    cols = tuple(points[..., d] for d in range(dim))
    if (n_cells + 1) * maxpts < 2**31:
        key = cell * maxpts + idx
        sorted_ops = jax.lax.sort((key,) + cols, dimension=0, num_keys=1)
        key_s = sorted_ops[0]
        order = jnp.remainder(key_s, maxpts)
        cell_s = key_s // maxpts
    else:  # huge grids (e.g. full KITTI): two int32 keys (cell, position)
        sorted_ops = jax.lax.sort((cell, idx) + cols, dimension=0,
                                  num_keys=2)
        cell_s = sorted_ops[0]
        order = sorted_ops[1]
        sorted_ops = sorted_ops[1:]  # align payload offset with packed path
    valid_s = cell_s < n_cells  # valid <=> in-range cell, no gather needed
    points_s = jnp.stack(sorted_ops[1:], axis=-1)

    prev = jnp.concatenate([jnp.full((1,), -1, cell_s.dtype), cell_s[:-1]])
    is_start = cell_s != prev
    pillar_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - seg_start

    if n_cells > P:
        # The grid can produce more distinct cells than max_voxels. The
        # reference kernel BREAKS out of its point loop the moment a point
        # would create pillar P+1 (load_data.py:630-637): the first P
        # pillars in ARRIVAL order survive, and every point at or after
        # the overflow position is dropped entirely — including points of
        # already-created pillars. Replicated here with two order
        # statistics of the segment-head positions: thr = P-th smallest
        # (pillar survives iff its head <= thr), cutoff = (P+1)-th
        # smallest (the overflow point's position; all later points drop).
        # We then re-compact ids over the kept subset IN CELL ORDER so
        # downstream scatters stay sorted. All vector work — no
        # gathers/scatters. Compiled only for large-grid configs —
        # unreachable with the shipped d435i config (10240 possible cells
        # < 12000 max_voxels).
        first_pos = _seg_fill(order, is_start)  # segment head's original idx
        start_key = jnp.where(is_start & valid_s, first_pos, maxpts)
        heads_sorted = jnp.sort(start_key)
        thr = heads_sorted[P - 1] if P <= maxpts else maxpts
        cutoff = heads_sorted[P] if P < maxpts else jnp.int32(maxpts)
        seg_keep = (first_pos <= thr) & (order < cutoff)
        new_pid = jnp.cumsum((is_start & (first_pos <= thr)).astype(
            jnp.int32)) - 1
        pillar_id = jnp.clip(new_pid, 0, P)
    else:
        seg_keep = jnp.ones((maxpts,), dtype=bool)

    keep = valid_s & (rank < N) & seg_keep & (pillar_id < P)
    # clamp instead of sentinel: stays non-decreasing over the sorted points
    point_pillar = jnp.minimum(pillar_id, P).astype(jnp.int32)

    z = cell_s // (ny * nx)
    rem = cell_s - z * (ny * nx)
    y = rem // nx
    x = rem - y * nx
    zyx = jnp.stack([z, y, x], axis=-1).astype(jnp.int32)

    # per-point pillar mean over KEPT points: segmented prefix + suffix sums
    # (associative scans with reset flags) — no scatters, no gathers, and
    # exactly per-segment f32 precision (the running sum never crosses a
    # segment boundary). Replaces the PFN's scatter-add + gather pair.
    is_end = jnp.concatenate([is_start[1:], jnp.ones((1,), bool)])
    # accumulate xyz relative to the point's CELL center (identical for
    # every point of a segment): cuts the f32 rounding of the segmented
    # sum by ~100x, keeping the scan mean within float noise of a
    # per-pillar sequential sum. Extra feature columns (intensity, ...)
    # accumulate raw — they feed SECOND's SimpleVoxel means. A final
    # keep-count column gives the per-segment KEPT-point count (the mean
    # denominator and num_points must exclude rank-capped AND
    # overflow-cutoff points, so a positional segment length is wrong).
    cell_center = (jnp.stack([x, y, z], axis=-1).astype(points.dtype) + 0.5
                   ) * vs[:3] + pcr[:3]
    centered = jnp.concatenate(
        [points_s[:, :3] - cell_center, points_s[:, 3:],
         jnp.ones((maxpts, 1), points.dtype)], axis=-1)
    vals = jnp.where(keep[:, None], centered, 0)

    def seg_sum_op(a, c_):
        av, af = a
        cv, cf = c_
        return (jnp.where(cf, cv, av + cv), af | cf)

    def seg_scan(values, flags):
        f3 = jnp.broadcast_to(flags[:, None], values.shape)
        out, _ = jax.lax.associative_scan(seg_sum_op, (values, f3), axis=0)
        return out

    prefix = seg_scan(vals, is_start)
    # per-segment total = prefix at the segment END, broadcast back with a
    # reverse fill so every point of a pillar sees the IDENTICAL f32 mean
    # (a prefix+suffix-self formulation rounds differently per point, which
    # injects noise into the PFN cluster-offset feature)
    end_rev = jnp.broadcast_to(jnp.flip(is_end, axis=0)[:, None],
                               prefix.shape)
    total = jnp.flip(_seg_fill(jnp.flip(prefix, axis=0), end_rev), axis=0)
    kept_count = total[:, dim]  # per-segment kept points (float)
    denom = jnp.maximum(kept_count, 1.0)[:, None]
    point_mean = total[:, :dim] / denom
    point_mean = point_mean.at[:, :3].add(cell_center)

    head = is_start & valid_s & seg_keep
    if n_cells > P and _BIG_GRID_TAIL == "sort":
        # Per-pillar count/coords/means via one compaction sort keyed by
        # pillar id: segment-start rows move to the front — row p of the
        # sorted payload IS pillar p; the mean columns ride the same sort
        # (multi-operand, no gathers).
        ckey = jnp.where(head, pillar_id, maxpts + 1)
        sorted_ops = jax.lax.sort(
            (ckey, kept_count.astype(jnp.int32),
             zyx[:, 0], zyx[:, 1], zyx[:, 2])
            + tuple(point_mean[:, d] for d in range(dim)), num_keys=1)
        c_len, c_z, c_y, c_x = sorted_ops[1:5]
        num_points = jnp.where(jnp.arange(P) < jnp.sum(head), c_len[:P], 0)
        real = (num_points > 0)[:, None]
        coords = jnp.where(real,
                           jnp.stack([c_z[:P], c_y[:P], c_x[:P]], axis=-1), 0)
        voxel_mean = jnp.where(
            real, jnp.stack([m[:P] for m in sorted_ops[5:]], axis=-1), 0)
    else:
        # Scatter tail, shared by both grid regimes: three [maxpts] -> [P]
        # scatters with genuinely NON-DECREASING indices (point_pillar is
        # clamped, never sentinel-interleaved, so indices_are_sorted is an
        # honest promise). Works for n_cells > P because pillar_id was
        # re-compacted over the kept subset above.
        inert = valid_s & seg_keep
        num_points = jnp.zeros((P,), dtype=jnp.int32)
        num_points = num_points.at[point_pillar].add(
            keep.astype(jnp.int32), mode="drop", indices_are_sorted=True)
        # all points of a pillar share the same zyx (>= 0), so a sorted
        # scatter-MAX of masked values recovers the per-pillar coords without
        # needing unique start indices; dropped pillars' points must be inert
        coords = jnp.zeros((P, 3), dtype=jnp.int32)
        coords = coords.at[point_pillar].max(
            jnp.where(inert[:, None], zyx, 0), mode="drop",
            indices_are_sorted=True)
        # only the segment head contributes its pillar's mean; every other
        # row adds zero, so a sorted scatter-ADD lands exactly one value
        # per pillar
        voxel_mean = jnp.zeros((P, dim), dtype=points.dtype)
        voxel_mean = voxel_mean.at[point_pillar].add(
            jnp.where(head[:, None], point_mean, 0), mode="drop",
            indices_are_sorted=True)

    return VoxelizedPoints(points_s, point_pillar, keep, point_mean, zyx,
                           num_points, coords, num_points > 0, voxel_mean)


class CellVoxelized(NamedTuple):
    """Dense-cell voxelization result for a BATCH of pointclouds: every
    array is per-POINT; the pillar index space is the CELL GRID ITSELF.

    Usable whenever the grid has no more cells than ``max_voxels`` (true for
    the shipped d435i config: 80*64*2 = 10240 cells < 12000), so the
    reference's pillar compaction is the identity and every pillar-indexed
    quantity either becomes static (coords) or falls out of one wide
    scatter (occupancy / counts). Motivation: on TPU, narrow scatters are
    latency-bound (~0.3 ms each for 32k scalar updates through XLA scatter)
    while cumsums and flat row gathers are ~free; this layout needs exactly
    ONE scatter (the 128-wide feature max in the PFN) for the whole front
    end. The function is batched NATIVELY (not vmapped) because batched
    gathers with per-item indices lower ~6x slower than one flat gather in
    global index space on TPU.

    points:  [B, MAXPTS, D] cell-id-sorted points (stable within a cell ->
             the reference's first-N-in-input-order cap survives,
             reference load_data.py:593-692)
    cell:    [B, MAXPTS] int32 sorted per-sample cell id; sentinel n_cells
             for out-of-range/padding points
    kept:    [B, MAXPTS] bool (in-range and rank < max_points_per_voxel)
    count:   [B, MAXPTS] int32 kept points in this point's cell
             (= reference num_points, capped at N); 0 for invalid points
    mean:    [B, MAXPTS, 3] xyz mean over the cell's KEPT points
             (the PFN cluster-offset feature, reference pointpillars.py:143)
    num_pillars: [] int32 total occupied cells across the batch (for the
             folded masked-BN statistics)
    """

    points: jax.Array
    cell: jax.Array
    kept: jax.Array
    count: jax.Array
    mean: jax.Array
    num_pillars: jax.Array


def voxelize_cells(points: jax.Array, num_valid: jax.Array, *,
                   voxel_size, point_cloud_range, grid_size,
                   max_points_per_voxel: int) -> CellVoxelized:
    """Scatter-free voxelization of a batch onto the dense cell grid.

    points [B, MAXPTS, D], num_valid [B]. Same assignment semantics as
    :func:`voxelize_points` (sorted cells, first-N-in-input-order capping);
    per-cell aggregates are computed with cumulative sums + flat
    segment-boundary gathers instead of scatters."""
    b, maxpts, dim = points.shape
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    pcr = jnp.asarray(point_cloud_range, dtype=points.dtype)
    nx, ny, nz = (int(g) for g in grid_size)
    n_cells = nx * ny * nz
    N = int(max_points_per_voxel)

    idx = jnp.arange(maxpts, dtype=jnp.int32)[None]        # [1, M]
    row = (jnp.arange(b, dtype=jnp.int32) * maxpts)[:, None]  # [B, 1]
    in_count = idx < num_valid[:, None]
    c = jnp.floor((points[..., :3] - pcr[:3]) / vs).astype(jnp.int32)
    gs = jnp.asarray([nx, ny, nz], dtype=jnp.int32)
    valid = in_count & jnp.all((c >= 0) & (c < gs), axis=-1)
    cell = (c[..., 2] * ny + c[..., 1]) * nx + c[..., 0]
    cell = jnp.where(valid, cell, n_cells)

    assert (n_cells + 1) * maxpts < 2**31, (
        "dense-cell voxelizer requires a packable key; use voxelize_points")
    # flat global-index gathers (cheap at B == 1: ~2 ns/row at 32k rows;
    # row-latency-explosive at 262k rows, hence the B > 1 strategies below)
    flat_rows = lambda a: a.reshape((b * maxpts,) + a.shape[2:])
    gflat = lambda a, i: flat_rows(a)[(i + row).reshape(-1)].reshape(
        (b, maxpts) + a.shape[2:])
    # multi-operand sort: carry the point columns THROUGH the sort instead
    # of gathering them afterwards — a narrow [B*M, D] gather is
    # row-latency-bound (~3.5 ms at 262k rows) while the extra sort
    # operands cost ~0.2 ms. (A B==1 single-key-sort + gather variant
    # measured faster in isolation but NOT in the fused graph — kept
    # uniform.)
    key = cell * maxpts + idx
    sorted_ops = jax.lax.sort(
        (key,) + tuple(points[..., d] for d in range(dim)),
        dimension=1, num_keys=1)
    key_s = sorted_ops[0]
    points_s = jnp.stack(sorted_ops[1:], axis=-1)
    cell_s = key_s // maxpts
    valid_s = cell_s < n_cells

    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, cell_s.dtype), cell_s[:, :-1]], axis=1)
    is_start = cell_s != prev
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, 0), axis=1)
    rank = idx - seg_start
    kept = valid_s & (rank < N)

    # segment end (= next segment's start) via a reverse running min over
    # next-start candidates; the sentinel segment sits at the tail
    nxt_candidate = jnp.concatenate(
        [jnp.where(is_start[:, 1:], idx[:, 1:], maxpts),
         jnp.full((b, 1), maxpts, jnp.int32)], axis=1)
    seg_end = jax.lax.cummin(nxt_candidate, axis=1, reverse=True)
    seg_len = seg_end - seg_start
    count = jnp.where(valid_s, jnp.minimum(seg_len, N), 0)

    # per-cell xyz mean over kept points, no scatter. Two strategies with
    # identical semantics, chosen statically by batch size:
    # - B == 1: masked cumsum differenced at segment boundaries (2 narrow
    #   row gathers — ~2 ns/row at 32k rows, but ~13 ns/row at 262k, so
    #   only the small-batch case). Center-relative accumulation + one
    #   refinement pass keep the f32 boundary difference at ~1e-6.
    # - B > 1: segmented prefix + suffix sums via associative_scan with
    #   reset flags — no gathers at all, and exactly per-segment precision
    #   (the running sum never crosses a segment boundary).
    denom = jnp.maximum(count, 1).astype(points.dtype)[..., None]

    if b == 1:
        center = (pcr[:3] + pcr[3:]) * 0.5

        def seg_mean(values):
            cum = jnp.cumsum(jnp.where(kept[..., None], values, 0), axis=1)
            total = gflat(cum, seg_end - 1)
            before = jnp.where((seg_start > 0)[..., None],
                               gflat(cum, jnp.maximum(seg_start - 1, 0)), 0)
            return (total - before) / denom

        mean = center + seg_mean(points_s[..., :3] - center)
        mean = mean + seg_mean(points_s[..., :3] - mean)
    else:
        vals = jnp.where(kept[..., None], points_s[..., :3], 0)

        def seg_op(a, c_):
            av, af = a
            cv, cf = c_
            return (jnp.where(cf, cv, av + cv), af | cf)

        def seg_scan(values, flags):
            f3 = jnp.broadcast_to(flags[..., None], values.shape)
            out, _ = jax.lax.associative_scan(seg_op, (values, f3), axis=1)
            return out

        prefix = seg_scan(vals, is_start)  # within-segment, includes self
        is_end = jnp.concatenate(
            [is_start[:, 1:], jnp.ones((b, 1), bool)], axis=1)
        suffix = jnp.flip(
            seg_scan(jnp.flip(vals, axis=1), jnp.flip(is_end, axis=1)),
            axis=1)
        mean = (prefix + suffix - vals) / denom

    num_pillars = jnp.sum((is_start & valid_s).astype(jnp.int32))
    return CellVoxelized(points_s, cell_s.astype(jnp.int32), kept, count,
                         mean, num_pillars)


def make_cell_voxelizer(cfg: VoxelConfig):
    """Bound dense-cell voxelizer, ready for jit/vmap. Only valid when the
    grid fits inside max_voxels (no pillar capping possible)."""
    nx, ny, nz = cfg.grid_size
    if nx * ny * nz > cfg.max_voxels:
        raise ValueError(
            f"dense-cell voxelizer needs n_cells <= max_voxels "
            f"({nx * ny * nz} > {cfg.max_voxels})")
    return functools.partial(
        voxelize_cells,
        voxel_size=np.asarray(cfg.voxel_size, np.float32),
        point_cloud_range=np.asarray(cfg.point_cloud_range, np.float32),
        grid_size=cfg.grid_size,
        max_points_per_voxel=cfg.max_points_per_voxel,
    )


def make_point_voxelizer(cfg: VoxelConfig):
    """Bound point-major voxelizer, ready for jit/vmap."""
    return functools.partial(
        voxelize_points,
        voxel_size=np.asarray(cfg.voxel_size, np.float32),
        point_cloud_range=np.asarray(cfg.point_cloud_range, np.float32),
        grid_size=cfg.grid_size,
        max_points_per_voxel=cfg.max_points_per_voxel,
        max_voxels=cfg.max_voxels,
    )


def make_voxelizer(cfg: VoxelConfig):
    """Bind the static config; returns ``fn(points, num_valid)`` ready for
    jit/vmap (batch axis via vmap: points [B, MAXPTS, D], num_valid [B])."""
    return functools.partial(
        voxelize,
        voxel_size=np.asarray(cfg.voxel_size, np.float32),
        point_cloud_range=np.asarray(cfg.point_cloud_range, np.float32),
        grid_size=cfg.grid_size,
        max_points_per_voxel=cfg.max_points_per_voxel,
        max_voxels=cfg.max_voxels,
    )


# ---------------------------------------------------------------------------
# host twin (NumPy, loop-based) — the parity oracle for tests. Mirrors the
# reference numba kernel exactly, including pillar arrival order.
# ---------------------------------------------------------------------------

def voxelize_np(points: np.ndarray, voxel_size, point_cloud_range,
                max_points_per_voxel: int, max_voxels: int):
    """reference load_data.py:593-692 semantics (reverse_index=True)."""
    vs = np.asarray(voxel_size, dtype=points.dtype)
    pcr = np.asarray(point_cloud_range, dtype=points.dtype)
    grid = np.round((pcr[3:] - pcr[:3]) / vs).astype(np.int32)
    nx, ny, nz = int(grid[0]), int(grid[1]), int(grid[2])
    coor_to_voxelidx = -np.ones((nz, ny, nx), dtype=np.int32)
    voxels = np.zeros((max_voxels, max_points_per_voxel, points.shape[-1]),
                      dtype=points.dtype)
    coors = np.zeros((max_voxels, 3), dtype=np.int32)
    num_points = np.zeros((max_voxels,), dtype=np.int32)
    voxel_num = 0
    for i in range(points.shape[0]):
        coor = np.zeros(3, dtype=np.int32)
        failed = False
        for j in range(3):
            cj = int(np.floor((points[i, j] - pcr[j]) / vs[j]))
            if cj < 0 or cj >= grid[j]:
                failed = True
                break
            coor[2 - j] = cj
        if failed:
            continue
        voxelidx = coor_to_voxelidx[coor[0], coor[1], coor[2]]
        if voxelidx == -1:
            voxelidx = voxel_num
            if voxel_num >= max_voxels:
                break
            voxel_num += 1
            coor_to_voxelidx[coor[0], coor[1], coor[2]] = voxelidx
            coors[voxelidx] = coor
        num = num_points[voxelidx]
        if num < max_points_per_voxel:
            voxels[voxelidx, num] = points[i]
            num_points[voxelidx] += 1
    return voxels[:voxel_num], coors[:voxel_num], num_points[:voxel_num]
