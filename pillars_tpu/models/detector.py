"""End-to-end detector (the reference's VoxelNet, model/voxelnet.py:725-1390)
as one pure, jittable computation over static shapes.

Pipeline: voxelize (ops/voxelize) -> PFN -> canvas scatter -> RPN ->
[train] loss  |  [eval] decode + top-k + NMS + direction flip, all on device.

Differences from the reference, by design:
- the postprocess runs INSIDE the jitted graph (the reference copies every
  head tensor to the host and post-processes in NumPy per sample,
  voxelnet.py:1060-1390);
- outputs are fixed-size [nms_post_max_size] with a validity mask;
- the batch is a padded dense layout, vmapped, shardable over a device mesh.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pillars_tpu.config import Config, ModelConfig
from pillars_tpu.geometry import boxes as gb
from pillars_tpu.models.losses import LossOutput, detection_loss
from pillars_tpu.models.pfn import PillarFeatureNet, PointwisePFN
from pillars_tpu.models.rpn import RPN
from pillars_tpu.ops.anchors import (AnchorSet, anchors_mask_batched,
                                     anchors_mask_from_dense, build_anchors)
from pillars_tpu.ops.nms import nms_standup
from pillars_tpu.ops.scatter import scatter_to_canvas_batched
from pillars_tpu.ops.targets import assign_targets_batched
from pillars_tpu.ops.voxelize import (make_cell_voxelizer,
                                      make_point_voxelizer, make_voxelizer)

from flax import linen as nn


class Predictions(NamedTuple):
    """Fixed-size per-sample detections, [B, K, ...] with K = nms_post_max."""

    boxes_lidar: jax.Array   # [B, K, 7]
    boxes_camera: jax.Array  # [B, K, 7]
    scores: jax.Array        # [B, K]
    labels: jax.Array        # [B, K] int32
    valid: jax.Array         # [B, K] bool


class _Network(nn.Module):
    """PFN + scatter + RPN over a voxelized batch.

    The batch is folded into the pillar/point axis before the PFN: it is
    purely per-pillar, so one big matmul serves the whole batch and the
    masked BN statistics span the batch's real pillars — exactly matching
    the reference's ragged concat layout (load_data.py:2190-2195)."""

    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None
    # BEV-grid model parallelism: when set, the canvas and head tensors
    # carry with_sharding_constraint along this mesh axis and XLA SPMD
    # halo-exchanges the conv stack (parallel/spatial.py)
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, voxelized, train: bool = False):
        coords = voxelized.coords
        pillar_mask = voxelized.pillar_mask
        b, p = pillar_mask.shape
        flat = lambda a: a.reshape((b * a.shape[1],) + a.shape[2:])
        if self.cfg.pfn.simple_mean and hasattr(voxelized, "voxel_mean"):
            # SECOND SimpleVoxel from the point-major voxelizer: per-voxel
            # means computed scan-wise, no [P, N, D] tensor materialized
            pillar_feats = flat(voxelized.voxel_mean)
        elif self.cfg.pfn.simple_mean:
            # SECOND SimpleVoxel: per-voxel mean of raw point features
            # (second.pytorch voxel_encoder.SimpleVoxel) — padded slots are
            # zero, so sum / clamped count is the mean over real points
            vox = flat(voxelized.voxels)
            cnt = jnp.maximum(flat(voxelized.num_points), 1)
            pillar_feats = (jnp.sum(vox, axis=1)
                            / cnt[:, None].astype(vox.dtype))
        elif self.cfg.pfn.pointwise:
            # offset per-sample pillar ids into the folded [B*P] space;
            # plain addition keeps them NON-DECREASING (sorted scatters) —
            # non-kept points carry inert values, so no sentinel redirect
            # is needed
            pid = voxelized.point_pillar
            offset = (jnp.arange(b, dtype=jnp.int32) * p)[:, None]
            pid_global = pid + offset
            pfn = PointwisePFN(self.cfg, dtype=self.dtype, name="pfn")
            pillar_feats = pfn(flat(voxelized.points), flat(pid_global),
                               flat(voxelized.point_kept),
                               flat(voxelized.point_mean),
                               flat(voxelized.point_zyx),
                               flat(voxelized.num_points),
                               flat(pillar_mask), train=train)
        else:
            pfn = PillarFeatureNet(self.cfg, dtype=self.dtype, name="pfn")
            pillar_feats = pfn(flat(voxelized.voxels),
                               flat(voxelized.num_points), flat(coords),
                               flat(pillar_mask), train=train)
        pillar_feats = pillar_feats.reshape(b, p, -1)
        _, ny, nx = self.cfg.feature_map_size
        if self.cfg.middle.enabled and self.cfg.middle.sparse:
            # SECOND sparse path: submanifold/strided sparse convs over
            # the active voxel set (full-KITTI grids; models/sparse_middle)
            from pillars_tpu.models.sparse_middle import (
                SparseMiddleExtractor)

            canvas = SparseMiddleExtractor(self.cfg, dtype=self.dtype,
                                           name="middle")(
                pillar_feats, coords, pillar_mask, train)
        elif self.cfg.middle.enabled:
            # SECOND dense path: dense 3D grid -> conv3d middle extractor
            from pillars_tpu.models.middle import (MiddleExtractor3D,
                                                   scatter_to_grid3d)

            nz = self.cfg.voxel.grid_size[2]
            grid = jax.vmap(
                lambda f, c, m: scatter_to_grid3d(f, c, m, nz, ny, nx))(
                    pillar_feats, coords, pillar_mask)
            canvas = MiddleExtractor3D(self.cfg, dtype=self.dtype,
                                       name="middle")(grid, train)
        else:
            canvas = scatter_to_canvas_batched(pillar_feats, coords,
                                               pillar_mask, ny, nx)
        if self.spatial_axis:
            from pillars_tpu.parallel.spatial import shard_canvas

            canvas = shard_canvas(canvas, self.spatial_axis)
        out = RPN(self.cfg, dtype=self.dtype, name="rpn")(canvas, train)
        if self.spatial_axis:
            out = {k: shard_canvas(v, self.spatial_axis)
                   for k, v in out.items()}
        return out


class PillarsDetector:
    """Binds config + static anchor data; exposes pure functions."""

    def __init__(self, config: Config, dtype: Optional[jnp.dtype] = None):
        self.config = config
        self.mcfg = config.model
        if dtype is None and config.runtime.compute_dtype == "bfloat16":
            dtype = jnp.bfloat16
        self.dtype = dtype
        self.anchor_set: AnchorSet = build_anchors(self.mcfg)
        self.network = _Network(self.mcfg, dtype=self.dtype,
                                spatial_axis=config.runtime.spatial_axis)
        if self.mcfg.pfn.pointwise:
            self.voxelize = make_point_voxelizer(self.mcfg.voxel)
        else:
            self.voxelize = make_voxelizer(self.mcfg.voxel)
        _, self.ny, self.nx = self.mcfg.feature_map_size
        gx, gy, gz = self.mcfg.voxel.grid_size
        self.dense_cell = (self.mcfg.pfn.dense_cell
                           and not self.mcfg.middle.enabled
                           and gx * gy * gz <= self.mcfg.voxel.max_voxels)
        self.cell_voxelize = (make_cell_voxelizer(self.mcfg.voxel)
                              if self.dense_cell else None)

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array, batch_size: int = 1) -> Dict[str, Any]:
        vc = self.mcfg.voxel
        dummy_pts = jnp.zeros(
            (batch_size, vc.max_points, self.mcfg.num_point_features),
            jnp.float32)
        dummy_num = jnp.zeros((batch_size,), jnp.int32)
        voxelized = self.voxelize_batch(dummy_pts, dummy_num)
        return self.network.init(rng, voxelized, False)

    # ------------------------------------------------------------------
    def voxelize_batch(self, points, num_valid):
        """[B, MAXPTS, D] + [B] -> VoxelizedSample/VoxelizedPoints batch.

        Deliberately NOT jax.vmap: batched lowering of the voxelizer's
        sort/scan pipeline carries a ~5.5x penalty on TPU (measured on the
        27-tap sparse rulebook, scripts/probe_sparse_mid2.py; same
        pathology as vmapped gathers, CLAUDE.md). B == 1 squeezes;
        B > 1 runs samples sequentially via lax.map — cheaper than the
        vmap penalty at this model's batch sizes."""
        if points.shape[0] == 1:
            out = self.voxelize(points[0], num_valid[0])
            return jax.tree_util.tree_map(lambda a: a[None], out)
        return jax.lax.map(lambda t: self.voxelize(*t), (points, num_valid))

    def anchors_mask_batch(self, coords, pillar_mask, threshold: float):
        # voxel-grid -> feature-map coord downscale (1 for PointPillars,
        # where the canvas IS the feature map; 4 for the SECOND sparse
        # middle, whose stages stride y/x before the RPN)
        stride = max(1, self.mcfg.voxel.grid_size[1] // self.ny)
        return anchors_mask_batched(
            coords, pillar_mask, jnp.asarray(self.anchor_set.sat_corners),
            self.ny, self.nx, threshold,
            structured=self.anchor_set.sat_structured, coord_stride=stride)

    # ------------------------------------------------------------------
    def apply(self, variables, voxelized, train: bool = False,
              mutable=False):
        """Run PFN+scatter+RPN. Returns (preds, new_model_state?)"""
        return self.network.apply(variables, voxelized, train,
                                  mutable=mutable)

    # ------------------------------------------------------------------
    def loss(self, preds: Dict[str, jax.Array], labels, reg_targets
             ) -> LossOutput:
        # NOTE: an optimization_barrier on preds (like postprocess uses)
        # was measured NEUTRAL in-graph and harmful from repacked banks —
        # deliberately not applied here (probe_train_bisect4).
        return detection_loss(
            self.mcfg.loss, self.mcfg.num_class,
            preds["box_preds"], preds["cls_preds"],
            preds.get("dir_cls_preds"), jnp.asarray(self.anchor_set.anchors),
            labels, reg_targets,
            use_direction_classifier=self.mcfg.postprocess.use_direction_classifier)

    # ------------------------------------------------------------------
    def assign_targets(self, gt_boxes, gt_classes, gt_valid, amask):
        return assign_targets_batched(
            jnp.asarray(self.anchor_set.standup_bv),
            jnp.asarray(self.anchor_set.anchors),
            gt_boxes, gt_classes, gt_valid, amask,
            jnp.asarray(self.anchor_set.matched_thresholds),
            jnp.asarray(self.anchor_set.unmatched_thresholds))

    # ------------------------------------------------------------------
    def postprocess(self, preds: Dict[str, jax.Array], anchors_mask,
                    rect, trv2c) -> Predictions:
        """Decode + top-k + NMS + direction flip, vmapped over the batch.

        reference VoxelNet.predict (model/voxelnet.py:1060-1390), moved
        fully on-device with fixed shapes."""
        pp = self.mcfg.postprocess
        use_pallas = (pp.use_pallas_nms
                      and jax.default_backend() not in ("cpu", "gpu"))
        anchors = jnp.asarray(self.anchor_set.anchors)
        batch = preds["box_preds"].shape[0]
        C = self.mcfg.num_class
        barrier = (pp.layout_barrier if pp.layout_barrier is not None
                   else anchors.shape[0] >= 100_000)
        if barrier:
            preds = jax.lax.optimization_barrier(preds)
        # LAYOUT NOTE: the box/dir heads stay in [B, L, T*ch] — ny and nx
        # merge for free (non-minor dims), and the channel dim keeps the
        # conv output's native (possibly lane-padded) layout. Flattening
        # them to 1-D forces a full relayout of the 54M-value box tensor
        # (measured: postprocess costs 6.9 ms fused after the RPN vs
        # 2.9 ms from a repacked bank at KITTI scale — scripts/
        # probe_fuse.py); with row gathers at the native layout only the
        # k=nms_pre selected rows are ever repacked. Channel layout is
        # (anchor_type, field)-minor, so row l holds fields of anchors
        # l*T .. l*T+T-1; skinny [A, ch] views are never materialized
        # (8x128 tiling would lane-pad them ~40x).
        T = self.mcfg.num_anchors_per_loc
        box_lt = preds["box_preds"].astype(jnp.float32).reshape(
            batch, -1, T * self.mcfg.box_code_size)
        dir_lt = (preds["dir_cls_preds"].astype(jnp.float32).reshape(
            batch, -1, T * 2) if pp.use_direction_classifier
            else jnp.zeros((batch, box_lt.shape[1], T * 2), jnp.float32))

        # per-anchor class max/argmax as a MINOR-AXIS reduce on the NHWC
        # head tensor [B, ny, nx, T, C] — the (T, C)-minor split is a free
        # reshape, the reduce is dense vector work, and the flat result
        # preserves anchor order a = (y*nx + x)*T + t. A strided-1-D-slice
        # formulation (best = cls[c::C] compares) measured 30.5 ms at KITTI
        # scale (1.29M anchors, C=3) vs 2.8 ms for this one
        # (scripts/probe_post2.py); sigmoid after max is equal to the
        # reference's max-of-sigmoid (monotone).
        cls_nhwc = preds["cls_preds"]
        if C == 1:
            # sigmoid over the single foreground class
            # (voxelnet.py:1149-1150, num_class_with_bg == 1 path)
            scores_all = jax.nn.sigmoid(
                cls_nhwc.reshape(batch, -1).astype(jnp.float32))
        else:
            split = cls_nhwc.reshape(cls_nhwc.shape[:-1]
                                     + (cls_nhwc.shape[-1] // C, C))
            # max in the head's native dtype (exact: astype-to-f32 then max
            # gives the same values), sigmoid after max == max of sigmoids
            # (monotone). Labels are NOT materialized per anchor here —
            # only the top-k selected rows ever need an argmax, so the
            # class logits ride the same native-layout row gathers as the
            # box/dir heads (probe_kitti_post.py: the full-A argmax+write
            # was a third of the score-chain cost at 1.29M anchors).
            scores_all = jax.nn.sigmoid(
                jnp.max(split, axis=-1).reshape(batch, -1)
                .astype(jnp.float32))
        # native dtype + native layout: only the k gathered rows are ever
        # repacked; argmax ordering is dtype-independent (bf16->f32 is
        # monotone)
        cls_lt = cls_nhwc.reshape(batch, -1, T * C)

        def one(box_p, scores, cls_p, dir_p, amask, rect_i, trv2c_i):
            masked_scores = jnp.where(amask, scores, -jnp.inf)
            if pp.nms_score_threshold > 0.0:
                masked_scores = jnp.where(
                    masked_scores >= pp.nms_score_threshold,
                    masked_scores, -jnp.inf)

            k = pp.nms_pre_max_size
            top_scores, top_idx = jax.lax.top_k(masked_scores, k)
            top_valid = jnp.isfinite(top_scores)
            # native-layout row gathers: anchor a = loc*T + t
            loc = top_idx // T
            t = top_idx % T
            nb = self.mcfg.box_code_size
            sel_box = jnp.take_along_axis(
                box_p[loc].reshape(k, T, nb), t[:, None, None],
                axis=1)[:, 0]                                     # [k, 7]
            sel_anchor = anchors[top_idx]
            dir_pair = jnp.take_along_axis(
                dir_p[loc].reshape(k, T, 2), t[:, None, None],
                axis=1)[:, 0]                                     # [k, 2]
            sel_dir = jnp.argmax(dir_pair, axis=-1)
            # deferred label argmax: [k, C] gathered logits, first-max-wins
            # tie-breaking same as the sequential compare; all-zeros when
            # C == 1 (argmax over a size-1 axis), matching the reference's
            # num_class_with_bg == 1 path
            cls_sel = jnp.take_along_axis(
                cls_p[loc].reshape(k, T, C), t[:, None, None],
                axis=1)[:, 0]                                     # [k, C]
            sel_label = jnp.argmax(cls_sel, axis=-1).astype(jnp.int32)

            decoded = gb.second_box_decode(sel_box, sel_anchor)  # [k, 7]
            bev = decoded[:, jnp.array([0, 1, 3, 4, 6])]
            corners = gb.center_to_corner_box2d(bev[:, :2], bev[:, 2:4],
                                                bev[:, 4])
            standup = gb.corner_to_standup(corners)
            keep_idx, keep_valid = nms_standup(
                standup, top_scores, top_valid, pp.nms_iou_threshold,
                pp.nms_post_max_size, use_pallas=use_pallas)

            out_boxes = decoded[keep_idx]
            out_scores = top_scores[keep_idx]
            out_dir = sel_dir[keep_idx]
            out_label = sel_label[keep_idx]

            if pp.use_direction_classifier:
                # (rot > 0) xor dir  ->  += pi (voxelnet.py:1300-1310)
                opp = jnp.logical_xor(out_boxes[:, 6] > 0, out_dir > 0)
                rot = out_boxes[:, 6] + jnp.where(opp, jnp.pi, 0.0)
                out_boxes = out_boxes.at[:, 6].set(rot)

            cam = gb.box_lidar_to_camera(out_boxes, rect_i, trv2c_i)
            return out_boxes, cam, out_scores, out_label, keep_valid

        outs = jax.vmap(one)(box_lt, scores_all, cls_lt, dir_lt,
                             anchors_mask, rect, trv2c)
        return Predictions(*outs)

    # ------------------------------------------------------------------
    def profile_stages(self, variables, points, num_valid, rect, trv2c,
                       iters: int = 20) -> Dict[str, float]:
        """The reference's measure_time_extended tier (voxelnet.py:753-903):
        per-stage DEVICE ms for t_voxel_features / t_spatial_features /
        t_rpn / t_nms_func, measured with the scan-inside-jit honest clock
        (utils.profiling.device_time_ms — on this image's TPU relay
        block_until_ready does not wait, so per-call wall timing is
        meaningless). For whole-graph numbers use bench.py — stage
        boundaries prevent fusion, so the sum exceeds the fused time."""
        from pillars_tpu.utils.profiling import device_time_ms

        thr = self.config.eval_input.anchor_area_threshold

        voxelized = jax.jit(self.voxelize_batch)(points, num_valid)
        preds = jax.jit(
            lambda v: self.apply(variables, v, train=False))(voxelized)

        return {
            "t_voxel_features": device_time_ms(
                self.voxelize_batch, (points, num_valid), iters),
            "t_spatial_features_plus_rpn": device_time_ms(
                lambda v: self.apply(variables, v, train=False),
                (voxelized,), iters),
            "t_nms_func": device_time_ms(
                lambda v, p: self.postprocess(
                    p, self.anchors_mask_batch(
                        v.coords, v.pillar_mask, thr), rect, trv2c),
                (voxelized, preds), iters),
        }

    # ------------------------------------------------------------------
    def _forward_fast(self, variables, voxelized):
        """Inference forward with the downsample blocks as fused Pallas
        kernels (ops/rpn_pallas.py); PFN/scatter/deconvs/heads stay flax.
        Numerically equivalent to apply(..., train=False) modulo conv
        accumulation order."""
        from pillars_tpu.models.pfn import PointwisePFN
        from pillars_tpu.models.rpn import RPNTail
        from pillars_tpu.ops.rpn_pallas import fused_rpn_blocks

        coords = voxelized.coords
        pillar_mask = voxelized.pillar_mask
        b, p = pillar_mask.shape
        flat = lambda a: a.reshape((b * a.shape[1],) + a.shape[2:])
        pid = voxelized.point_pillar
        offset = (jnp.arange(b, dtype=jnp.int32) * p)[:, None]
        pid_global = pid + offset
        pfn = PointwisePFN(self.mcfg, dtype=self.dtype)
        pillar_feats = pfn.apply(
            {"params": variables["params"]["pfn"],
             "batch_stats": variables["batch_stats"]["pfn"]},
            flat(voxelized.points), flat(pid_global),
            flat(voxelized.point_kept), flat(voxelized.point_mean),
            flat(voxelized.point_zyx),
            flat(voxelized.num_points), flat(pillar_mask),
            train=False)
        pillar_feats = pillar_feats.reshape(b, p, -1)
        canvas = scatter_to_canvas_batched(pillar_feats, coords, pillar_mask,
                                           self.ny, self.nx)
        b1, b2, b3 = fused_rpn_blocks(canvas, variables, self.mcfg.rpn)
        tail = RPNTail(self.mcfg, dtype=self.dtype)
        rpn_vars = {"params": variables["params"]["rpn"],
                    "batch_stats": variables["batch_stats"]["rpn"]}
        return tail.apply(rpn_vars, b1, b2, b3, False)

    # ------------------------------------------------------------------
    def _forward_dense(self, variables, points, num_valid, thr):
        """Dense-cell inference front end: scatter-free voxelization
        (ops/voxelize.py::voxelize_cells) + DenseCellPFN (one wide scatter
        total) + reshape canvas + occupancy-derived anchors mask. Returns
        (head preds, anchors mask). Numerically equivalent to the
        VoxelizedPoints path; the pillar index space is the cell grid, so
        the per-pillar coords/counts scatters (each ~0.3 ms latency-bound
        on TPU) disappear."""
        from pillars_tpu.models.pfn import DenseCellPFN
        from pillars_tpu.models.rpn import RPN as _RPN

        b = points.shape[0]
        nx, ny, nz = self.mcfg.voxel.grid_size
        n_cells = nx * ny * nz
        cv = self.cell_voxelize(points, num_valid)  # batched natively
        flat = lambda a: a.reshape((b * a.shape[1],) + a.shape[2:])
        offset = (jnp.arange(b, dtype=jnp.int32) * n_cells)[:, None]
        cell_global = cv.cell + offset  # stays non-decreasing over the fold

        pfn = DenseCellPFN(self.mcfg, dtype=self.dtype)
        cell_feats, num_points = pfn.apply(
            {"params": variables["params"]["pfn"],
             "batch_stats": variables["batch_stats"]["pfn"]},
            flat(cv.points), flat(cv.cell), flat(cell_global), flat(cv.kept),
            flat(cv.count), flat(cv.mean), jnp.sum(cv.num_pillars),
            b * n_cells, train=False)

        # cell id = (z*ny + y)*nx + x, so the canvas is a reshape; the
        # z-layer SUM preserves the reference's scatter-ADD quirk
        # (ops/scatter.py, reference model/pointpillars.py:314-318)
        canvas = cell_feats.reshape(b, nz, ny, nx, -1).sum(axis=1)
        dense_grid = (num_points > 0).reshape(b, nz, ny, nx).astype(
            jnp.float32).sum(axis=1)
        sat_corners = jnp.asarray(self.anchor_set.sat_corners)
        amask = jax.vmap(
            lambda d: anchors_mask_from_dense(
                d, sat_corners, thr,
                structured=self.anchor_set.sat_structured))(dense_grid)

        rpn_vars = {"params": variables["params"]["rpn"],
                    "batch_stats": variables["batch_stats"]["rpn"]}
        preds = _RPN(self.mcfg, dtype=self.dtype).apply(rpn_vars, canvas,
                                                        False)
        return preds, amask

    # ------------------------------------------------------------------
    def make_inference_fn(self, anchor_area_threshold: Optional[float] = None):
        """One jitted graph: padded pointclouds -> final boxes.

        fn(variables, points [B, MAXPTS, D], num_valid [B],
           rect [B, 4, 4], trv2c [B, 4, 4]) -> Predictions
        """
        thr = (self.config.eval_input.anchor_area_threshold
               if anchor_area_threshold is None else anchor_area_threshold)
        fast = (self.mcfg.rpn.use_pallas_blocks
                and self.mcfg.rpn.use_separable_conv
                and self.mcfg.pfn.pointwise
                and jax.default_backend() not in ("cpu", "gpu"))

        def fn(variables, points, num_valid, rect, trv2c):
            if self.dense_cell:
                preds, amask = self._forward_dense(variables, points,
                                                   num_valid, thr)
            else:
                voxelized = self.voxelize_batch(points, num_valid)
                amask = self.anchors_mask_batch(
                    voxelized.coords, voxelized.pillar_mask, thr)
                if fast:
                    preds = self._forward_fast(variables, voxelized)
                else:
                    preds = self.apply(variables, voxelized, train=False)
            return self.postprocess(preds, amask, rect, trv2c)

        return jax.jit(fn)
