"""Rotated NMS and soft-NMS host variants."""

import numpy as np
import pytest

from pillars_tpu.ops.nms_variants import rotated_nms, soft_nms


class TestRotatedNMS:
    def test_suppresses_rotated_duplicates(self):
        # two nearly identical rotated boxes + one far box
        boxes = np.array([
            [2.0, 0.0, 0.6, 0.8, 0.4],
            [2.02, 0.01, 0.6, 0.8, 0.42],
            [5.0, 2.0, 0.6, 0.8, -1.0],
        ], np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        keep = rotated_nms(boxes, scores, iou_threshold=0.5)
        assert list(keep) == [0, 2]

    def test_axis_aligned_equivalence(self):
        """With zero rotations, rotated NMS must keep the same set as the
        classic greedy on standup boxes at the same (non +1) IoU."""
        r = np.random.RandomState(0)
        n = 30
        boxes = np.stack([r.uniform(0, 6, n), r.uniform(-2, 2, n),
                          r.uniform(0.5, 1.5, n), r.uniform(0.5, 1.5, n),
                          np.zeros(n)], axis=1).astype(np.float32)
        scores = r.uniform(0, 1, n).astype(np.float32)
        keep = rotated_nms(boxes, scores, 0.3)
        # oracle
        from pillars_tpu.geometry import np_boxes as nb
        standup = np.concatenate([boxes[:, :2] - boxes[:, 2:4] / 2,
                                  boxes[:, :2] + boxes[:, 2:4] / 2], 1)
        order = np.argsort(-scores)
        kept = []
        for i in order:
            ok = all(nb.iou_matrix(standup[i][None], standup[j][None])[0, 0]
                     <= 0.3 for j in kept)
            if ok:
                kept.append(i)
        assert sorted(keep) == sorted(kept)

    def test_pre_post_limits(self):
        boxes = np.tile([2.0, 0.0, 0.6, 0.8, 0.0], (10, 1)).astype(np.float32)
        boxes[:, 0] += np.arange(10) * 3  # all disjoint
        scores = np.linspace(1, 0.1, 10).astype(np.float32)
        keep = rotated_nms(boxes, scores, 0.5, pre_max_size=6, post_max_size=4)
        assert list(keep) == [0, 1, 2, 3]


class TestSoftNMS:
    def test_decays_overlaps_keeps_disjoint(self):
        boxes = np.array([
            [0, 0, 1, 1], [0.1, 0.1, 1.1, 1.1], [5, 5, 6, 6]], np.float64)
        scores = np.array([0.9, 0.8, 0.7])
        out = soft_nms(boxes, scores)
        assert out[0] == pytest.approx(0.9)       # top box untouched
        assert out[1] < 0.8                       # heavy overlap decayed
        assert out[2] == pytest.approx(0.7, abs=1e-6)  # disjoint untouched

    def test_linear_method(self):
        boxes = np.array([[0, 0, 1, 1], [0.0, 0.0, 1.0, 1.0]], np.float64)
        scores = np.array([0.9, 0.8])
        out = soft_nms(boxes, scores, method="linear")
        assert out[1] == pytest.approx(0.0, abs=1e-9)  # IoU 1 -> zeroed
