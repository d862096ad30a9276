"""Multi-class (3-class KITTI-style) model: anchor interleaving, per-anchor
thresholds, head shapes, multi-class postprocess labels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillars_tpu.config import AnchorConfig, Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.ops.anchors import build_anchors


def small_3class_config():
    cfg = Config.default()
    cfg = cfg.override("model.num_class", 3)
    cfg = cfg.override("model.class_names", ["Car", "Pedestrian", "Cyclist"])
    cfg = cfg.override("model.voxel.max_voxels", 1024)
    cfg = cfg.override("model.voxel.max_points", 4096)
    gens = [
        dict(class_name="Car", sizes=[1.6, 3.9, 1.56],
             strides=[0.08, 0.08, 0.0], offsets=[0.08, -2.56, -1.78],
             rotations=[0.0, 1.57], matched_threshold=0.6,
             unmatched_threshold=0.45),
        dict(class_name="Pedestrian", sizes=[0.6, 0.8, 1.73],
             strides=[0.08, 0.08, 0.0], offsets=[0.08, -2.56, -1.465],
             rotations=[0.0, 1.57], matched_threshold=0.5,
             unmatched_threshold=0.35),
        dict(class_name="Cyclist", sizes=[0.6, 1.76, 1.73],
             strides=[0.08, 0.08, 0.0], offsets=[0.08, -2.56, -1.465],
             rotations=[0.0, 1.57], matched_threshold=0.5,
             unmatched_threshold=0.35),
    ]
    cfg = cfg.override("model.target.anchor_generators", gens)
    return cfg


CFG = small_3class_config()


class TestMultiClassAnchors:
    def test_interleaved_per_location(self):
        aset = build_anchors(CFG.model)
        ny, nx = 64, 80
        assert aset.anchors.shape == (ny * nx * 6, 7)
        # the 6 anchors of location 0: car(2 rots), ped(2), cyc(2)
        first6 = aset.anchors[:6]
        np.testing.assert_allclose(first6[0, 3:6], [1.6, 3.9, 1.56], rtol=1e-6)
        np.testing.assert_allclose(first6[2, 3:6], [0.6, 0.8, 1.73], rtol=1e-6)
        np.testing.assert_allclose(first6[4, 3:6], [0.6, 1.76, 1.73], rtol=1e-6)
        # same (x, y) for all 6
        assert len(set(map(tuple, np.round(first6[:, :2], 4)))) == 1
        # rotation alternates within each class pair
        np.testing.assert_allclose(first6[[0, 2, 4], 6], 0.0)
        np.testing.assert_allclose(first6[[1, 3, 5], 6], 1.57)

    def test_thresholds_aligned(self):
        aset = build_anchors(CFG.model)
        np.testing.assert_allclose(aset.matched_thresholds[:6],
                                   [0.6, 0.6, 0.5, 0.5, 0.5, 0.5])
        np.testing.assert_allclose(aset.unmatched_thresholds[:6],
                                   [0.45, 0.45, 0.35, 0.35, 0.35, 0.35])
        # pattern repeats across locations
        np.testing.assert_allclose(aset.matched_thresholds[6:12],
                                   aset.matched_thresholds[:6])

    def test_num_anchors_property(self):
        assert CFG.model.num_anchors_per_loc == 6
        assert CFG.model.num_anchors == 64 * 80 * 6


class TestMultiClassModel:
    @pytest.fixture(scope="class")
    def det_vars(self):
        det = PillarsDetector(CFG)
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)
        return det, variables

    def test_head_shapes(self, det_vars, rng):
        det, variables = det_vars
        pts = np.zeros((1, 4096, 3), np.float32)
        n = 1000
        pts[0, :n, 0] = rng.uniform(0.2, 6.2, n)
        pts[0, :n, 1] = rng.uniform(-2.4, 2.4, n)
        pts[0, :n, 2] = rng.uniform(-2.5, 0.5, n)
        vox = det.voxelize_batch(jnp.array(pts), jnp.array([n], jnp.int32))
        preds = det.apply(variables, vox, train=False)
        assert preds["box_preds"].shape == (1, 64, 80, 6 * 7)
        assert preds["cls_preds"].shape == (1, 64, 80, 6 * 3)
        assert preds["dir_cls_preds"].shape == (1, 64, 80, 6 * 2)

    def test_postprocess_labels(self, det_vars):
        det, _ = det_vars
        A = det.anchor_set.anchors.shape[0]
        ny, nx = det.ny, det.nx
        cls = np.full((1, ny, nx, 18), -10.0, np.float32)
        box = np.zeros((1, ny, nx, 42), np.float32)
        dirp = np.zeros((1, ny, nx, 12), np.float32)
        # activate anchor 2 (pedestrian rot 0) at location (5, 7), class 1
        yy, xx, a = 5, 7, 2
        cls[0, yy, xx, a * 3 + 1] = 5.0
        preds = {"box_preds": jnp.array(box), "cls_preds": jnp.array(cls),
                 "dir_cls_preds": jnp.array(dirp)}
        amask = jnp.ones((1, A), bool)
        eye = jnp.eye(4)[None]
        out = det.postprocess(preds, amask, eye, eye)
        valid = np.asarray(out.valid[0])
        labels = np.asarray(out.labels[0])
        scores = np.asarray(out.scores[0])
        assert valid[0]
        assert labels[0] == 1  # Pedestrian
        assert scores[0] == pytest.approx(1 / (1 + np.exp(-5.0)), rel=1e-4)
        # decoded box sits on the pedestrian anchor at that location
        anchor_idx = (yy * nx + xx) * 6 + a
        np.testing.assert_allclose(
            np.asarray(out.boxes_lidar[0, 0, 3:6]),
            det.anchor_set.anchors[anchor_idx, 3:6], rtol=1e-4)

    def test_loss_runs(self, det_vars, rng):
        det, variables = det_vars
        pts = np.zeros((2, 4096, 3), np.float32)
        n = 800
        pts[:, :n, 0] = rng.uniform(0.2, 6.2, (2, n))
        pts[:, :n, 1] = rng.uniform(-2.4, 2.4, (2, n))
        pts[:, :n, 2] = rng.uniform(-2.5, 0.5, (2, n))
        vox = det.voxelize_batch(jnp.array(pts), jnp.array([n, n], jnp.int32))
        amask = det.anchors_mask_batch(vox.coords, vox.pillar_mask, 1.0)
        gt = np.zeros((2, 8, 7), np.float32)
        gt[..., 3:6] = 1.0
        gt[:, 0] = [3.0, 0.0, -1.78, 1.6, 3.9, 1.56, 0.1]   # car
        gt[:, 1] = [1.5, 1.0, -1.465, 0.6, 0.8, 1.73, 0.5]  # pedestrian
        gt_classes = np.ones((2, 8), np.int32)
        gt_classes[:, 1] = 2
        gt_valid = np.zeros((2, 8), bool)
        gt_valid[:, :2] = True
        targets = det.assign_targets(jnp.array(gt), jnp.array(gt_classes),
                                     jnp.array(gt_valid), amask)
        labels = np.asarray(targets.labels)
        assert (labels == 1).any() and (labels == 2).any()
        preds = det.apply(variables, vox, train=False)
        out = det.loss(preds, targets.labels, targets.bbox_targets)
        assert np.isfinite(float(out.loss))
