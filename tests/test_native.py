"""Native C++ geometry ops vs. the NumPy/JAX twins."""

import numpy as np
import pytest

from pillars_tpu import native
from pillars_tpu.geometry.rotated_iou import rotated_iou_np

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def random_rboxes(rng, n):
    return np.stack([
        rng.uniform(-3, 3, n), rng.uniform(-3, 3, n),
        rng.uniform(0.3, 2.0, n), rng.uniform(0.3, 2.0, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)


class TestNativeRotatedIoU:
    def test_matches_numpy(self, rng):
        b1 = random_rboxes(rng, 40)
        b2 = random_rboxes(rng, 25)
        for crit in (-1, 0, 1, 2):
            got = native.rotated_overlap_matrix(b1, b2, crit)
            want = rotated_iou_np(b1, b2, crit)
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_identity(self, rng):
        b = random_rboxes(rng, 10)
        got = native.rotated_overlap_matrix(b, b, -1)
        np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-5)

    def test_empty(self):
        b = np.zeros((0, 5), np.float32)
        q = random_rboxes(np.random.RandomState(0), 3)
        assert native.rotated_overlap_matrix(b, q, -1).shape == (0, 3)


class TestNativeNMS:
    def test_matches_reference_semantics(self, rng):
        n = 64
        centers = rng.uniform(0, 6, (n, 2)).astype(np.float32)
        sizes = rng.uniform(0.3, 1.0, (n, 2)).astype(np.float32)
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        order = np.argsort(-scores)
        got = native.nms_standup(boxes[order], 0.5, 30)
        # brute-force greedy with +1 convention over sorted boxes
        kept = []
        bs = boxes[order]
        for i in range(n):
            ok = True
            for j in kept:
                x0 = max(bs[i, 0], bs[j, 0]); y0 = max(bs[i, 1], bs[j, 1])
                x1 = min(bs[i, 2], bs[j, 2]); y1 = min(bs[i, 3], bs[j, 3])
                inter = max(x1 - x0 + 1, 0.0) * max(y1 - y0 + 1, 0.0)
                sa = (bs[i, 2] - bs[i, 0] + 1) * (bs[i, 3] - bs[i, 1] + 1)
                sb = (bs[j, 2] - bs[j, 0] + 1) * (bs[j, 3] - bs[j, 1] + 1)
                if inter / (sa + sb - inter) > 0.5:
                    ok = False
                    break
            if ok:
                kept.append(i)
            if len(kept) >= 30:
                break
        np.testing.assert_array_equal(got, kept)


class TestEvalUsesNative:
    def test_bev_overlap_same_result(self, rng):
        from pillars_tpu.eval.kitti_ap import bev_box_overlap
        b1 = random_rboxes(rng, 12)
        b2 = random_rboxes(rng, 9)
        got = bev_box_overlap(b1, b2)
        want = rotated_iou_np(b1, b2, -1)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
