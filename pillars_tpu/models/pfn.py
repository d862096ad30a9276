"""PillarFeatureNet: point-feature augmentation + per-point MLP + masked max.

reference model/pointpillars.py:65-225. Input here is the padded per-sample
layout (voxels [P, N, 3], num_points [P], coords [P, 3] (z, y, x),
pillar_mask [P]); the batch axis is added by vmap in the detector.

The Dense(num_filters) is the first big MXU matmul of the network:
[P*N, 8] @ [8, 128].
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import jax
from flax import linen as nn

from pillars_tpu.config import ModelConfig
from pillars_tpu.models.layers import MaskedBatchNorm, he_uniform


class PointwisePFN(nn.Module):
    """Bandwidth-optimal PFN over the point-major layout.

    Numerically equivalent to :class:`PillarFeatureNet` (same parameters,
    same outputs) but never materializes the [P, N, C] activation: with
    d435i clouds (~2.3 points/pillar average) the dense layout wastes ~96%%
    of its HBM traffic on padding, which made the PFN the inference
    bottleneck (~5.5 ms of a 7 ms cloud). Here features are computed per
    POINT ([MAXPTS, C]) and reduced into pillars with a segment-max.

    The reference's zero-row semantics are preserved exactly: pillars with
    fewer than N points also take relu(bn(0)) — a per-channel constant —
    into their max (reference pointpillars.py:197-225 processes the zeroed
    padding points through Dense+BN+ReLU before the max).

    Parameter/batch-stats names match PillarFeatureNet ("dense", "bn"), so
    checkpoints are interchangeable between the two paths.
    """

    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, point_pillar, point_kept, point_mean,
                 point_zyx, num_points, pillar_mask, train: bool = False):
        """points [MAXPTS, D] (cell-sorted), point_pillar [MAXPTS]
        (NON-DECREASING, clamped), point_kept [MAXPTS], point_mean
        [MAXPTS, 3] (per-point pillar mean, precomputed scan-wise by the
        voxelizer), point_zyx [MAXPTS, 3], num_points/pillar_mask [P]
        -> pillar features [P, num_filters].

        The only scatter left is the final segment-max; it passes
        indices_are_sorted=True (the voxelizer guarantees monotone pillar
        ids) — on TPU that is the difference between a vectorized and a
        serialized scatter. (An earlier formulation scattered per-pillar
        means and gathered them back per point: 3 extra row-latency-bound
        ops, ~4 ms at KITTI's 131k points.)"""
        pcfg = self.cfg.pfn
        vx, vy = self.cfg.voxel.voxel_size[:2]
        pcr = self.cfg.voxel.point_cloud_range
        x_offset = vx / 2 + pcr[0]
        y_offset = vy / 2 + pcr[1]
        num_filters = pcfg.num_filters
        P = num_points.shape[0]
        N = self.cfg.voxel.max_points_per_voxel
        kept = point_kept
        pid = point_pillar

        pt_mean = point_mean[:, :3]  # xyz cluster mean (cols 3+: SECOND)
        cx = point_zyx[:, 2].astype(points.dtype) * vx + x_offset
        cy = point_zyx[:, 1].astype(points.dtype) * vy + y_offset

        feats = jnp.concatenate([
            points,
            points[:, :3] - pt_mean,
            (points[:, 0] - cx)[:, None],
            (points[:, 1] - cy)[:, None],
        ], axis=-1)
        feats = jnp.where(kept[:, None], feats, 0)

        x = nn.Dense(num_filters, use_bias=False, kernel_init=he_uniform,
                     dtype=self.dtype, name="dense")(feats)

        # masked BN with the SAME statistics as the dense path: counts are
        # real_pillars * N rows (zero rows of real pillars included), sums
        # come from kept points only (zero rows contribute nothing).
        bn = _PointwiseMaskedBN(momentum=pcfg.bn_momentum,
                                epsilon=pcfg.bn_eps, dtype=self.dtype,
                                name="bn")
        count = jnp.sum(pillar_mask.astype(jnp.float32)) * N
        x, zero_vec = bn(x, kept, count, use_running_average=not train)
        x = nn.relu(x)
        zero_contrib = nn.relu(zero_vec).astype(x.dtype)

        neg = jnp.asarray(-jnp.inf, dtype=x.dtype)
        x = jnp.where(kept[:, None], x, neg)  # dropped points can't win a max
        seg = jnp.full((P, num_filters), neg)
        seg = seg.at[pid].max(x, mode="drop", indices_are_sorted=True)
        # pillars with padding slots also see the processed zero row
        pad_rows = (num_points < N)[:, None]
        seg = jnp.maximum(seg, jnp.where(pad_rows, zero_contrib[None], neg))
        out = jnp.where(pillar_mask[:, None] & jnp.isfinite(seg), seg, 0)
        return out


class DenseCellPFN(nn.Module):
    """Scatter-minimal PFN over the dense CELL grid (ops/voxelize.py
    CellVoxelized layout): the pillar index space is the grid itself, so
    per-pillar coords are derived arithmetically from the cell id, the
    cluster mean arrives precomputed per point (cumsum trick), and the ONLY
    scatter in the whole front end is one wide sorted scatter-max that
    fuses the feature reduction with the per-cell point count.

    Numerically equivalent to PillarFeatureNet / PointwisePFN (same
    parameter and batch_stats names: "dense", "bn" — checkpoints are
    interchangeable); reference model/pointpillars.py:65-225.

    Returns (cell_feats [BC, F], num_points [BC]) where BC = batch * n_cells
    and cell_feats rows of empty cells are zero (reference empty canvas
    cells, pointpillars.py:314-318).
    """

    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, cell_local, cell_global, kept, count, mean,
                 num_pillars, n_cells_total: int, train: bool = False):
        """points [M, D] (cell-sorted, batch-folded), cell_local [M] (id in
        the per-sample grid; sentinel n_cells when invalid), cell_global [M]
        (batch-offset, NON-DECREASING), kept [M], count [M], mean [M, 3],
        num_pillars [] (total occupied cells across the fold)."""
        pcfg = self.cfg.pfn
        vx, vy = self.cfg.voxel.voxel_size[:2]
        pcr = self.cfg.voxel.point_cloud_range
        x_offset = vx / 2 + pcr[0]
        y_offset = vy / 2 + pcr[1]
        nx, ny, _ = self.cfg.voxel.grid_size
        num_filters = pcfg.num_filters
        N = self.cfg.voxel.max_points_per_voxel

        # pillar-center offsets straight from the cell id (static coords)
        rem = jnp.remainder(cell_local, ny * nx)
        cyi = rem // nx
        cxi = rem - cyi * nx
        cx = cxi.astype(points.dtype) * vx + x_offset
        cy = cyi.astype(points.dtype) * vy + y_offset

        feats = jnp.concatenate([
            points,
            points[:, :3] - mean,
            (points[:, 0] - cx)[:, None],
            (points[:, 1] - cy)[:, None],
        ], axis=-1)
        feats = jnp.where(kept[:, None], feats, 0)

        x = nn.Dense(num_filters, use_bias=False, kernel_init=he_uniform,
                     dtype=self.dtype, name="dense")(feats)
        bn = _PointwiseMaskedBN(momentum=pcfg.bn_momentum,
                                epsilon=pcfg.bn_eps, dtype=self.dtype,
                                name="bn")
        x, zero_vec = bn(x, kept, num_pillars.astype(jnp.float32) * N,
                         use_running_average=not train)
        x = nn.relu(x)
        zero_contrib = nn.relu(zero_vec).astype(x.dtype)

        neg = jnp.asarray(-jnp.inf, dtype=x.dtype)
        xm = jnp.where(kept[:, None], x, neg)
        # fuse the per-cell count into the same scatter as channel F: all
        # valid rows of a cell carry the identical count, so max == count;
        # invalid rows are -inf everywhere and cannot corrupt a colliding
        # row (per-sample sentinels alias the next sample's cell 0)
        valid = cell_local < (ny * nx * self.cfg.voxel.grid_size[2])
        cnt_ch = jnp.where(valid, count.astype(x.dtype), neg)
        aug = jnp.concatenate([xm, cnt_ch[:, None]], axis=-1)

        seg = jnp.full((n_cells_total, num_filters + 1), neg, dtype=x.dtype)
        seg = seg.at[cell_global].max(aug, mode="drop",
                                      indices_are_sorted=True)
        cell_feats = seg[:, :num_filters]
        npts = seg[:, num_filters]

        occupied = npts > 0
        pad_rows = npts < N  # empty cells (-inf) are masked below anyway
        cell_feats = jnp.maximum(
            cell_feats, jnp.where(pad_rows[:, None], zero_contrib[None], neg))
        cell_feats = jnp.where(occupied[:, None], cell_feats, 0)
        num_points = jnp.where(occupied, npts, 0).astype(jnp.int32)
        return cell_feats, num_points


class _PointwiseMaskedBN(nn.Module):
    """BatchNorm over point-major activations with dense-layout statistics.

    Parameter/collection names identical to MaskedBatchNorm so either PFN
    path loads the same checkpoint."""

    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, kept, count, use_running_average: bool):
        """``count`` is the scalar row count of the equivalent dense layout
        (real pillars x slots per pillar) so statistics match
        MaskedBatchNorm exactly."""
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            k = kept[:, None].astype(jnp.float32)
            count = jnp.maximum(count.astype(jnp.float32), 1.0)
            mean = jnp.sum(xf * k, axis=0) / count
            mean2 = jnp.sum(xf * xf * k, axis=0) / count
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (x - mean) * inv * scale + bias
        # the processed zero row: bn(0) per channel
        zero_vec = (0.0 - mean) * inv * scale + bias
        return y.astype(self.dtype or x.dtype), zero_vec


class PillarFeatureNet(nn.Module):
    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, voxels, num_points, coords, pillar_mask,
                 train: bool = False):
        """voxels [P, N, D>=3] -> pillar features [P, num_filters]."""
        pcfg = self.cfg.pfn
        vx, vy = self.cfg.voxel.voxel_size[:2]
        pcr = self.cfg.voxel.point_cloud_range
        x_offset = vx / 2 + pcr[0]
        y_offset = vy / 2 + pcr[1]
        num_max_points = voxels.shape[1]

        npts = jnp.maximum(num_points, 1).astype(voxels.dtype)[:, None, None]

        # cluster offset: distance to the pillar's point mean
        # (reference pointpillars.py:143-149)
        points_mean = jnp.sum(voxels[:, :, :3], axis=1, keepdims=True) / npts
        f_cluster = voxels[:, :, :3] - points_mean

        # center offset: distance to the geometric pillar center
        # (reference pointpillars.py:156-176; coords are (z, y, x))
        cx = coords[:, 2].astype(voxels.dtype) * vx + x_offset
        cy = coords[:, 1].astype(voxels.dtype) * vy + y_offset
        f_center = jnp.stack(
            [voxels[:, :, 0] - cx[:, None], voxels[:, :, 1] - cy[:, None]],
            axis=-1)

        features = [voxels, f_cluster, f_center]
        if pcfg.with_distance:
            features.append(
                jnp.linalg.norm(voxels[:, :, :3], axis=2, keepdims=True))
        feats = jnp.concatenate(features, axis=-1)  # [P, N, 8]

        # zero the padded points (reference pointpillars.py:197-203)
        point_mask = (jnp.arange(num_max_points)[None, :]
                      < num_points[:, None]).astype(feats.dtype)
        feats = feats * point_mask[..., None]

        feats = nn.Dense(pcfg.num_filters, use_bias=False,
                         kernel_init=he_uniform, dtype=self.dtype,
                         name="dense")(feats)
        feats = MaskedBatchNorm(momentum=pcfg.bn_momentum, epsilon=pcfg.bn_eps,
                                dtype=self.dtype, name="bn")(
            feats, pillar_mask[:, None], use_running_average=not train)
        feats = nn.relu(feats)

        # max over the point axis (includes the processed zero-points,
        # exactly like the reference, pointpillars.py:219)
        pillar_feats = jnp.max(feats, axis=1)
        # padding pillars must contribute nothing to the canvas scatter
        return jnp.where(pillar_mask[:, None], pillar_feats, 0)
