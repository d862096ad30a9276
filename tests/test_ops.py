"""Ops tests: voxelizer vs. the loop-based reference oracle, scatter add
semantics, anchors-mask SAT vs. direct computation, NMS vs. a brute-force
greedy oracle, target assigner vs. a faithful NumPy port of the reference's
create_target_np."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config, ModelConfig
from pillars_tpu.geometry import np_boxes as nb
from pillars_tpu.ops.anchors import anchors_mask, build_anchors
from pillars_tpu.ops.nms import nms_standup
from pillars_tpu.ops.scatter import scatter_to_canvas
from pillars_tpu.ops.targets import assign_targets
from pillars_tpu.ops.voxelize import make_voxelizer, voxelize_np

CFG = Config.default()
VC = CFG.model.voxel


def random_cloud(rng, n, spread=1.0):
    pts = np.zeros((n, 3), dtype=np.float32)
    pts[:, 0] = rng.uniform(-0.5, 7.0 * spread, n)
    pts[:, 1] = rng.uniform(-3.0, 3.0, n)
    pts[:, 2] = rng.uniform(-3.5, 3.5, n)
    return pts


class TestVoxelizer:
    def _compare(self, pts):
        maxpts = 4096
        padded = np.zeros((maxpts, 3), dtype=np.float32)
        padded[: len(pts)] = pts
        fn = jax.jit(make_voxelizer(VC))
        out = fn(jnp.array(padded), jnp.int32(len(pts)))

        ref_vox, ref_coors, ref_num = voxelize_np(
            pts, VC.voxel_size, VC.point_cloud_range,
            VC.max_points_per_voxel, VC.max_voxels)

        got_mask = np.asarray(out.pillar_mask)
        got_coords = np.asarray(out.coords)[got_mask]
        got_vox = np.asarray(out.voxels)[got_mask]
        got_num = np.asarray(out.num_points)[got_mask]

        assert got_mask.sum() == len(ref_coors)
        # align by cell id: the jitted voxelizer orders pillars by cell id,
        # the reference by arrival — compare as sets keyed on (z, y, x)
        def key(coords):
            return coords[:, 0] * 10**8 + coords[:, 1] * 10**4 + coords[:, 2]

        ref_order = np.argsort(key(ref_coors))
        got_order = np.argsort(key(got_coords))
        np.testing.assert_array_equal(got_coords[got_order], ref_coors[ref_order])
        np.testing.assert_array_equal(got_num[got_order], ref_num[ref_order])
        np.testing.assert_allclose(got_vox[got_order], ref_vox[ref_order],
                                   rtol=1e-6)

    def test_random_cloud(self, rng):
        self._compare(random_cloud(rng, 3000))

    def test_dense_pillar_overflow(self, rng):
        # cram >50 points into few cells to exercise the per-pillar cap,
        # preserving "first 50 in input order"
        pts = random_cloud(rng, 2000, spread=0.02)
        self._compare(pts)

    def test_out_of_range_dropped(self, rng):
        pts = np.full((100, 3), 50.0, dtype=np.float32)
        padded = np.zeros((4096, 3), dtype=np.float32)
        padded[:100] = pts
        fn = jax.jit(make_voxelizer(VC))
        out = fn(jnp.array(padded), jnp.int32(100))
        assert int(np.asarray(out.pillar_mask).sum()) == 0

    def test_two_z_layers(self):
        # same (x, y), z on both sides of the z=1.0 layer boundary -> 2 pillars
        pts = np.array([[1.0, 0.0, 0.5], [1.0, 0.0, 1.5]], dtype=np.float32)
        padded = np.zeros((64, 3), dtype=np.float32)
        padded[:2] = pts
        fn = jax.jit(make_voxelizer(VC))
        out = fn(jnp.array(padded), jnp.int32(2))
        mask = np.asarray(out.pillar_mask)
        coords = np.asarray(out.coords)[mask]
        assert mask.sum() == 2
        assert set(coords[:, 0]) == {0, 1}
        assert len(set(map(tuple, coords[:, 1:]))) == 1


class TestScatter:
    def test_add_semantics_two_layers(self):
        # two pillars at the same (y, x), different z -> features summed
        feats = jnp.array([[1.0, 2.0], [10.0, 20.0], [100.0, 200.0]])
        coords = jnp.array([[0, 3, 4], [1, 3, 4], [0, 5, 6]], dtype=jnp.int32)
        mask = jnp.array([True, True, True])
        canvas = scatter_to_canvas(feats, coords, mask, ny=8, nx=8)
        np.testing.assert_allclose(np.asarray(canvas[3, 4]), [11.0, 22.0])
        np.testing.assert_allclose(np.asarray(canvas[5, 6]), [100.0, 200.0])
        assert float(jnp.sum(canvas)) == pytest.approx(333.0)

    def test_padding_dropped(self):
        feats = jnp.array([[5.0], [7.0]])
        coords = jnp.array([[0, 1, 1], [0, 0, 0]], dtype=jnp.int32)
        mask = jnp.array([True, False])
        canvas = scatter_to_canvas(feats, coords, mask, ny=4, nx=4)
        assert float(canvas[1, 1, 0]) == 5.0
        assert float(jnp.sum(canvas)) == 5.0


class TestAnchors:
    def test_count_and_layout(self):
        aset = build_anchors(CFG.model)
        assert aset.anchors.shape == (10240, 7)  # 64*80*2, SURVEY §2.3
        # first two anchors differ only in rotation (rotation fastest axis)
        np.testing.assert_allclose(aset.anchors[0, :6], aset.anchors[1, :6])
        assert aset.anchors[0, 6] == 0.0
        assert aset.anchors[1, 6] == pytest.approx(1.57)
        # x advances fastest after rotation (reference transpose [2,1,0,...])
        assert aset.anchors[2, 0] > aset.anchors[0, 0]
        np.testing.assert_allclose(aset.anchors[:, 3:6],
                                   np.tile([0.6, 0.8, 1.73], (10240, 1)),
                                   rtol=1e-6)

    def test_anchor_centers(self):
        aset = build_anchors(CFG.model)
        a = CFG.model.target.anchor
        # first anchor at offsets
        np.testing.assert_allclose(aset.anchors[0, :3],
                                   [a.offsets[0], a.offsets[1], a.offsets[2]],
                                   rtol=1e-5)

    def test_mask_matches_reference_sat(self, rng):
        aset = build_anchors(CFG.model)
        nx, ny, _ = CFG.model.voxel.grid_size
        # random pillar occupancy
        n_pillars = 200
        coords = np.zeros((n_pillars, 3), dtype=np.int32)
        coords[:, 0] = rng.randint(0, 2, n_pillars)
        coords[:, 1] = rng.randint(0, ny, n_pillars)
        coords[:, 2] = rng.randint(0, nx, n_pillars)
        mask = np.ones(n_pillars, dtype=bool)
        mask[-20:] = False

        got = np.asarray(jax.jit(
            lambda c, m: anchors_mask(c, m, aset.sat_corners, ny, nx, 1.0)
        )(jnp.array(coords), jnp.array(mask)))

        # reference-style dense computation (load_data.py:558-591)
        dense = np.zeros((ny, nx), dtype=np.float32)
        for i in range(n_pillars):
            if mask[i]:
                dense[coords[i, 1], coords[i, 2]] += 1
        sat = dense.cumsum(0).cumsum(1)
        c = aset.sat_corners
        area = (sat[c[:, 3], c[:, 2]] - sat[c[:, 3], c[:, 0]]
                - sat[c[:, 1], c[:, 2]] + sat[c[:, 1], c[:, 0]])
        want = area > 1.0
        np.testing.assert_array_equal(got, want)


def _nms_oracle(boxes, scores, iou_threshold, post_max):
    """Brute-force greedy NMS with the reference's +1 pixel IoU."""
    order = np.argsort(-scores)
    kept = []
    for i in order:
        ok = True
        for j in kept:
            x0 = max(boxes[i, 0], boxes[j, 0])
            y0 = max(boxes[i, 1], boxes[j, 1])
            x1 = min(boxes[i, 2], boxes[j, 2])
            y1 = min(boxes[i, 3], boxes[j, 3])
            w = max(x1 - x0 + 1, 0.0)
            h = max(y1 - y0 + 1, 0.0)
            inter = w * h
            sa = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
            sb = (boxes[j, 2] - boxes[j, 0] + 1) * (boxes[j, 3] - boxes[j, 1] + 1)
            if inter / (sa + sb - inter) > iou_threshold:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept[:post_max]


class TestNMS:
    def test_vs_oracle(self, rng):
        for trial in range(5):
            r = np.random.RandomState(trial)
            k = 100
            centers = r.uniform(0, 6, (k, 2)).astype(np.float32)
            sizes = r.uniform(0.3, 1.0, (k, 2)).astype(np.float32)
            boxes = np.concatenate(
                [centers - sizes / 2, centers + sizes / 2], axis=1)
            scores = r.uniform(0, 1, k).astype(np.float32)
            keep_idx, keep_valid = jax.jit(
                lambda b, s, v: nms_standup(b, s, v, 0.5, 50))(
                    jnp.array(boxes), jnp.array(scores), jnp.ones(k, bool))
            got = list(np.asarray(keep_idx)[np.asarray(keep_valid)])
            want = _nms_oracle(boxes, scores, 0.5, 50)
            assert got == want, trial

    def test_respects_valid_mask(self, rng):
        k = 10
        boxes = np.tile([0.0, 0.0, 1.0, 1.0], (k, 1)).astype(np.float32)
        scores = np.linspace(1, 0.1, k).astype(np.float32)
        valid = np.zeros(k, bool)
        valid[3] = True  # only one valid box
        keep_idx, keep_valid = nms_standup(
            jnp.array(boxes), jnp.array(scores), jnp.array(valid), 0.5, 5)
        got = np.asarray(keep_idx)[np.asarray(keep_valid)]
        assert list(got) == [3]


# ---------------------------------------------------------------------------
# target assigner oracle: direct NumPy port of reference create_target_np
# (load_data.py:331-532, positive_fraction=None path)
# ---------------------------------------------------------------------------

def _create_target_np_oracle(all_anchors, gt_boxes, anchors_mask_np, gt_classes,
                             matched_threshold, unmatched_threshold):
    def similarity(anchors, gts):
        a_bv = nb.rbbox2d_to_near_bbox(anchors[:, [0, 1, 3, 4, 6]])
        g_bv = nb.rbbox2d_to_near_bbox(gts[:, [0, 1, 3, 4, 6]])
        return nb.iou_matrix(a_bv, g_bv)

    def encode(gts, anchors):
        import pillars_tpu.geometry.boxes as gb2
        return np.asarray(gb2.second_box_encode(
            jnp.array(gts, jnp.float32), jnp.array(anchors, jnp.float32)))

    total = all_anchors.shape[0]
    inds_inside = np.where(anchors_mask_np)[0]
    anchors = all_anchors[inds_inside]
    num_inside = len(inds_inside)
    labels = np.full((num_inside,), -1, dtype=np.int32)
    if len(gt_boxes) > 0 and anchors.shape[0] > 0:
        overlap = similarity(anchors, gt_boxes)
        anchor_to_gt_argmax = overlap.argmax(axis=1)
        anchor_to_gt_max = overlap[np.arange(num_inside), anchor_to_gt_argmax]
        gt_to_anchor_argmax = overlap.argmax(axis=0)
        gt_to_anchor_max = overlap[gt_to_anchor_argmax, np.arange(overlap.shape[1])]
        gt_to_anchor_max[gt_to_anchor_max == 0] = -1
        anchors_with_max_overlap = np.where(overlap == gt_to_anchor_max)[0]
        gt_inds_force = anchor_to_gt_argmax[anchors_with_max_overlap]
        labels[anchors_with_max_overlap] = gt_classes[gt_inds_force]
        pos_inds = anchor_to_gt_max >= matched_threshold
        labels[pos_inds] = gt_classes[anchor_to_gt_argmax[pos_inds]]
        bg_inds = np.where(anchor_to_gt_max < unmatched_threshold)[0]
        labels[bg_inds] = 0
        labels[anchors_with_max_overlap] = gt_classes[gt_inds_force]
    else:
        labels[:] = 0
    fg_inds = np.where(labels > 0)[0]
    bbox_targets = np.zeros((num_inside, 7), dtype=np.float32)
    if len(gt_boxes) > 0 and anchors.shape[0] > 0 and len(fg_inds) > 0:
        bbox_targets[fg_inds] = encode(
            gt_boxes[overlap.argmax(axis=1)[fg_inds]], anchors[fg_inds])
    reg_weights = np.zeros((num_inside,), dtype=np.float32)
    reg_weights[labels > 0] = 1.0

    # unmap
    out_labels = np.full((total,), -1, dtype=np.int32)
    out_labels[inds_inside] = labels
    out_targets = np.zeros((total, 7), dtype=np.float32)
    out_targets[inds_inside] = bbox_targets
    out_weights = np.zeros((total,), dtype=np.float32)
    out_weights[inds_inside] = reg_weights
    return out_labels, out_targets, out_weights


class TestTargetAssigner:
    def _run(self, rng, n_gt, mask_frac=0.3, seed=0):
        aset = build_anchors(CFG.model)
        r = np.random.RandomState(seed)
        G = 8
        gt = np.zeros((G, 7), dtype=np.float32)
        gt[:, 3:6] = 1.0  # safe pad dims
        gt_valid = np.zeros(G, dtype=bool)
        gt_valid[:n_gt] = True
        gt[:n_gt, 0] = r.uniform(0.5, 6.0, n_gt)
        gt[:n_gt, 1] = r.uniform(-2.0, 2.0, n_gt)
        gt[:n_gt, 2] = r.uniform(-2.0, -1.0, n_gt)
        gt[:n_gt, 3] = r.uniform(0.4, 0.9, n_gt)
        gt[:n_gt, 4] = r.uniform(0.5, 1.1, n_gt)
        gt[:n_gt, 5] = r.uniform(1.4, 1.9, n_gt)
        gt[:n_gt, 6] = r.uniform(-np.pi, np.pi, n_gt)
        gt_classes = np.ones(G, dtype=np.int32)
        amask = r.uniform(size=len(aset.anchors)) > mask_frac

        got = jax.jit(assign_targets)(
            jnp.array(aset.standup_bv), jnp.array(aset.anchors),
            jnp.array(gt), jnp.array(gt_classes), jnp.array(gt_valid),
            jnp.array(amask), jnp.array(aset.matched_thresholds),
            jnp.array(aset.unmatched_thresholds))

        want_labels, want_targets, want_weights = _create_target_np_oracle(
            aset.anchors, gt[:n_gt], amask, gt_classes[:n_gt],
            CFG.model.target.anchor.matched_threshold,
            CFG.model.target.anchor.unmatched_threshold)
        np.testing.assert_array_equal(np.asarray(got.labels), want_labels)
        # bbox_targets is lane-major [7, A] (TargetAssignment layout)
        np.testing.assert_allclose(np.asarray(got.bbox_targets).T,
                                   want_targets, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.reg_weights), want_weights)

    def test_random_scenes(self, rng):
        for seed in range(4):
            self._run(rng, n_gt=5, seed=seed)

    def test_single_gt(self, rng):
        self._run(rng, n_gt=1, seed=7)

    def test_no_gt_all_background_within_mask(self, rng):
        aset = build_anchors(CFG.model)
        G = 4
        gt = np.zeros((G, 7), dtype=np.float32)
        gt[:, 3:6] = 1.0
        amask = np.zeros(len(aset.anchors), dtype=bool)
        amask[:100] = True
        got = assign_targets(
            jnp.array(aset.standup_bv), jnp.array(aset.anchors),
            jnp.array(gt), jnp.ones(G, jnp.int32), jnp.zeros(G, bool),
            jnp.array(amask), jnp.array(aset.matched_thresholds),
            jnp.array(aset.unmatched_thresholds))
        labels = np.asarray(got.labels)
        assert np.all(labels[:100] == 0)
        assert np.all(labels[100:] == -1)
        assert float(jnp.sum(got.reg_weights)) == 0.0


class TestPillarOverflowArrivalOrder:
    def test_matches_reference_arrival_semantics(self, rng):
        """When a cloud has more distinct cells than max_voxels, the
        reference keeps the FIRST max_voxels pillars in input-arrival order
        (load_data.py:630-637). Both jitted voxelizers must match the
        loop-based oracle exactly in that regime."""
        from pillars_tpu.config import VoxelConfig
        from pillars_tpu.ops.voxelize import (make_point_voxelizer,
                                              make_voxelizer, voxelize_np)

        cfg = VoxelConfig(max_voxels=40, max_points_per_voxel=5,
                          max_points=512)
        pts = random_cloud(rng, 400)  # ~hundreds of distinct cells >> 40
        padded = np.zeros((512, 3), np.float32)
        padded[:400] = pts
        ref_vox, ref_coors, ref_num = voxelize_np(
            pts, cfg.voxel_size, cfg.point_cloud_range,
            cfg.max_points_per_voxel, cfg.max_voxels)
        assert len(ref_coors) == 40  # overflow actually happened

        for mk in (make_voxelizer, make_point_voxelizer):
            out = jax.jit(mk(cfg))(jnp.array(padded), jnp.int32(400))
            mask = np.asarray(out.pillar_mask)
            got_coords = np.asarray(out.coords)[mask]
            got_num = np.asarray(out.num_points)[mask]
            assert mask.sum() == 40
            def key(c):
                return c[:, 0] * 10**8 + c[:, 1] * 10**4 + c[:, 2]
            ro = np.argsort(key(ref_coors))
            go = np.argsort(key(got_coords))
            np.testing.assert_array_equal(got_coords[go], ref_coors[ro])
            np.testing.assert_array_equal(got_num[go], ref_num[ro])


class TestStructuredSATMask:
    """The slice-based anchors mask (StructuredSAT) must equal the gather
    formulation bit for bit on every shipped config."""

    @pytest.mark.parametrize("config_path", [
        "configs/pedestrian_d435i.yaml", "configs/kitti_3class.yaml"])
    def test_structured_equals_gather(self, config_path, rng):
        from pillars_tpu.config import Config
        from pillars_tpu.ops.anchors import anchors_mask_from_dense

        cfg = Config.from_yaml(config_path)
        aset = build_anchors(cfg.model)
        assert aset.sat_structured is not None, (
            "shipped configs must take the structured path")
        nx, ny, _ = cfg.model.voxel.grid_size
        for trial in range(3):
            dense = (rng.rand(ny, nx) < 0.1).astype(np.float32) * (
                1 + rng.randint(0, 2, (ny, nx)))
            got = np.asarray(jax.jit(
                lambda d: anchors_mask_from_dense(
                    d, jnp.asarray(aset.sat_corners), 1.0,
                    structured=aset.sat_structured))(jnp.asarray(dense)))
            want = np.asarray(jax.jit(
                lambda d: anchors_mask_from_dense(
                    d, jnp.asarray(aset.sat_corners), 1.0))(
                        jnp.asarray(dense)))
            np.testing.assert_array_equal(got, want)
            assert want.any()  # non-degenerate scene


class TestVoxelMean:
    """voxelize_points.voxel_mean (SECOND SimpleVoxel features) vs a NumPy
    per-voxel mean of the kept points, on both compaction branches."""

    def _check(self, rng, vc, n):
        from pillars_tpu.config import VoxelConfig
        from pillars_tpu.ops.voxelize import make_point_voxelizer, voxelize_np

        maxpts = 2048
        pcr = vc.point_cloud_range
        pts = np.zeros((maxpts, 4), np.float32)
        pts[:n, 0] = rng.uniform(pcr[0], pcr[3], n)
        pts[:n, 1] = rng.uniform(pcr[1], pcr[4], n)
        pts[:n, 2] = rng.uniform(pcr[2], pcr[5], n)
        pts[:n, 3] = rng.uniform(0, 1, n)
        out = jax.jit(make_point_voxelizer(vc))(jnp.asarray(pts),
                                                jnp.int32(n))
        ref_vox, ref_coors, ref_num = voxelize_np(
            pts[:n], vc.voxel_size, vc.point_cloud_range,
            vc.max_points_per_voxel, vc.max_voxels)
        ref_mean = (ref_vox.sum(axis=1)
                    / np.maximum(ref_num, 1)[:, None].astype(np.float32))

        mask = np.asarray(out.pillar_mask)
        got_coords = np.asarray(out.coords)[mask]
        got_mean = np.asarray(out.voxel_mean)[mask]
        # the jitted voxelizer orders pillars by cell id; align on (z,y,x)
        key = lambda c: (c[:, 0] * 10**8 + c[:, 1] * 10**4 + c[:, 2])
        got_order = np.argsort(key(got_coords))
        ref_order = np.argsort(key(ref_coors))
        assert mask.sum() == len(ref_coors)
        np.testing.assert_array_equal(got_coords[got_order],
                                      ref_coors[ref_order])
        np.testing.assert_allclose(got_mean[got_order], ref_mean[ref_order],
                                   rtol=1e-5, atol=1e-5)

    def test_small_grid_branch(self, rng):
        from pillars_tpu.config import VoxelConfig

        vc = VoxelConfig(max_voxels=12000, max_points=2048)  # cells < P
        self._check(rng, vc, 1500)

    def test_large_grid_branch(self, rng):
        from pillars_tpu.config import VoxelConfig

        # fine voxels -> cells >> max_voxels: the compaction-sort branch
        vc = VoxelConfig(voxel_size=(0.02, 0.02, 0.5), max_voxels=256,
                         max_points=2048)
        self._check(rng, vc, 400)

    def test_large_grid_scatter_tail(self, rng, monkeypatch):
        """The A/B'd scatter tail (ops/voxelize.py::_BIG_GRID_TAIL) must
        produce the same outputs as the default sort tail on big grids —
        it loses on TPU latency (scripts/probe_voxelize_live.py), not
        correctness."""
        from pillars_tpu.config import VoxelConfig
        from pillars_tpu.ops import voxelize as vox

        monkeypatch.setattr(vox, "_BIG_GRID_TAIL", "scatter")
        vc = VoxelConfig(voxel_size=(0.02, 0.02, 0.5), max_voxels=256,
                         max_points=2048)
        self._check(rng, vc, 400)


class TestOverflowCutoff:
    """Reference load_data.py:630-637: the kernel BREAKS the point loop
    when a point would create pillar P+1, dropping every later point —
    even those of existing pillars. Crafted scene: pillar A gets a second
    point only AFTER the overflow point; both voxelizers must drop it."""

    def _pts(self):
        # cells: A=(0.01), B=(1.01), C=(2.01) with max_voxels=2
        # order: A, B, (C -> overflow, break), A-again (must be dropped)
        pts = np.array([
            [0.01, 0.0, 0.0, 0.5],
            [1.01, 0.0, 0.0, 0.5],
            [2.01, 0.0, 0.0, 0.5],   # creates pillar 3 -> break
            [0.02, 0.0, 0.0, 0.9],   # after break: dropped by reference
        ], np.float32)
        padded = np.zeros((16, 4), np.float32)
        padded[:4] = pts
        return padded

    def _vc(self):
        from pillars_tpu.config import VoxelConfig

        return VoxelConfig(point_cloud_range=(0, -1, -1, 8, 1, 1),
                           voxel_size=(1.0, 2.0, 2.0), max_voxels=2,
                           max_points=16, max_points_per_voxel=4)

    def test_oracle_agrees(self):
        from pillars_tpu.ops.voxelize import voxelize_np

        vc = self._vc()
        vox, coors, num = voxelize_np(self._pts()[:4], vc.voxel_size,
                                      vc.point_cloud_range,
                                      vc.max_points_per_voxel, vc.max_voxels)
        assert len(coors) == 2
        np.testing.assert_array_equal(num, [1, 1])  # A's 2nd point dropped

    def test_point_voxelizer(self):
        from pillars_tpu.ops.voxelize import make_point_voxelizer

        vc = self._vc()
        out = jax.jit(make_point_voxelizer(vc))(jnp.asarray(self._pts()),
                                                jnp.int32(4))
        mask = np.asarray(out.pillar_mask)
        assert mask.sum() == 2
        np.testing.assert_array_equal(np.asarray(out.num_points)[mask],
                                      [1, 1])
        # the dropped 4th point must not contaminate the mean either
        np.testing.assert_allclose(
            np.asarray(out.voxel_mean)[mask][0],
            [0.01, 0.0, 0.0, 0.5], atol=1e-6)

    def test_dense_voxelizer(self):
        from pillars_tpu.ops.voxelize import make_voxelizer

        vc = self._vc()
        out = jax.jit(make_voxelizer(vc))(jnp.asarray(self._pts()),
                                          jnp.int32(4))
        mask = np.asarray(out.pillar_mask)
        assert mask.sum() == 2
        np.testing.assert_array_equal(np.asarray(out.num_points)[mask],
                                      [1, 1])
