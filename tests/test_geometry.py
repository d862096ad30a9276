"""Unit tests for the geometry library: encode/decode round trips, corner
conventions, rotated IoU vs. a brute-force Monte-Carlo reference, collision
tests, coordinate-frame round trips."""

import numpy as np
import pytest

import jax.numpy as jnp

from pillars_tpu.geometry import boxes as gb
from pillars_tpu.geometry import np_boxes as nb
from pillars_tpu.geometry.rotated_iou import rotated_iou_jax, rotated_iou_np


def random_boxes(rng, n, code=7):
    out = np.zeros((n, code), dtype=np.float32)
    out[:, 0] = rng.uniform(0.5, 6.0, n)      # x
    out[:, 1] = rng.uniform(-2.0, 2.0, n)     # y
    out[:, 2] = rng.uniform(-2.5, 0.5, n)     # z
    out[:, 3] = rng.uniform(0.3, 1.2, n)      # w
    out[:, 4] = rng.uniform(0.3, 1.2, n)      # l
    out[:, 5] = rng.uniform(1.0, 2.0, n)      # h
    out[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return out


class TestCodec:
    def test_encode_decode_roundtrip(self, rng):
        anchors = random_boxes(rng, 64)
        gts = random_boxes(rng, 64)
        enc = gb.second_box_encode(jnp.array(gts), jnp.array(anchors))
        dec = gb.second_box_decode(enc, jnp.array(anchors))
        np.testing.assert_allclose(np.asarray(dec), gts, rtol=1e-4, atol=1e-4)

    def test_decode_zero_residual_is_anchor(self, rng):
        anchors = random_boxes(rng, 8)
        dec = gb.second_box_decode(jnp.zeros((8, 7)), jnp.array(anchors))
        np.testing.assert_allclose(np.asarray(dec), anchors, rtol=1e-5, atol=1e-5)


class TestCorners:
    def test_corners_match_numpy_twin(self, rng):
        centers = rng.uniform(-2, 2, (16, 2)).astype(np.float32)
        dims = rng.uniform(0.2, 2, (16, 2)).astype(np.float32)
        angles = rng.uniform(-np.pi, np.pi, 16).astype(np.float32)
        a = np.asarray(gb.center_to_corner_box2d(
            jnp.array(centers), jnp.array(dims), jnp.array(angles)))
        b = nb.center_to_corner_box2d(centers, dims, angles)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_corner3d_axis2_unrotated(self):
        centers = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
        dims = np.array([[2.0, 4.0, 6.0]], dtype=np.float32)
        corners = nb.center_to_corner_box3d(centers, dims, np.zeros(1))
        # lidar origin (0.5, 0.5, 0): z spans [center_z, center_z + h]
        assert corners[..., 2].min() == pytest.approx(3.0)
        assert corners[..., 2].max() == pytest.approx(9.0)
        assert corners[..., 0].min() == pytest.approx(0.0)
        assert corners[..., 0].max() == pytest.approx(2.0)

    def test_standup(self, rng):
        corners = rng.uniform(-5, 5, (7, 4, 2)).astype(np.float32)
        su = nb.corner_to_standup(corners)
        assert su.shape == (7, 4)
        np.testing.assert_allclose(su[:, 0], corners[..., 0].min(1))
        np.testing.assert_allclose(su[:, 3], corners[..., 1].max(1))

    def test_rbbox_to_near_bbox_rotated(self):
        # a box rotated ~90deg swaps w/l in the standup approximation
        rb = np.array([[0.0, 0.0, 2.0, 4.0, np.pi / 2]], dtype=np.float32)
        near = nb.rbbox2d_to_near_bbox(rb)
        np.testing.assert_allclose(near[0], [-2.0, -1.0, 2.0, 1.0], atol=1e-4)
        rb0 = np.array([[0.0, 0.0, 2.0, 4.0, 0.0]], dtype=np.float32)
        near0 = nb.rbbox2d_to_near_bbox(rb0)
        np.testing.assert_allclose(near0[0], [-1.0, -2.0, 1.0, 2.0], atol=1e-4)


class TestLimitPeriod:
    def test_values(self):
        v = np.array([0.0, np.pi, -np.pi, 3 * np.pi / 2, 2 * np.pi])
        out = nb.limit_period(v, 0.5, 2 * np.pi)
        assert np.all(out >= -np.pi) and np.all(out < np.pi)
        np.testing.assert_allclose(
            np.asarray(gb.limit_period(jnp.array(v), 0.5, 2 * np.pi)), out,
            rtol=1e-6)


class TestFrames:
    def test_camera_lidar_roundtrip(self, rng):
        rect = np.eye(4, dtype=np.float32)
        velo2cam = np.eye(4, dtype=np.float32)
        # a nontrivial rigid transform
        th = 0.3
        velo2cam[:3, :3] = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        velo2cam[:3, 3] = [0.1, -0.2, 0.3]
        b = random_boxes(rng, 10)
        cam = nb.box_lidar_to_camera(b, rect, velo2cam)
        back = nb.box_camera_to_lidar(cam, rect, velo2cam)
        np.testing.assert_allclose(back, b, rtol=1e-4, atol=1e-4)

    def test_jax_matches_numpy(self, rng):
        rect = np.eye(4, dtype=np.float32)
        velo2cam = np.eye(4, dtype=np.float32)
        velo2cam[:3, 3] = [1.0, 2.0, 3.0]
        b = random_boxes(rng, 5)
        a = np.asarray(gb.box_lidar_to_camera(
            jnp.array(b), jnp.array(rect), jnp.array(velo2cam)))
        np.testing.assert_allclose(a, nb.box_lidar_to_camera(b, rect, velo2cam),
                                   rtol=1e-4, atol=1e-4)


class TestPointsInBox:
    def test_center_inside(self, rng):
        b = random_boxes(rng, 6)
        centers = b[:, :3] + np.array([0, 0, 0.01])  # just above bottom
        centers[:, 2] += b[:, 5] / 2  # move into the box vertically
        mask = nb.points_in_rbbox(centers, b)
        assert np.all(np.diag(mask))

    def test_far_outside(self, rng):
        b = random_boxes(rng, 6)
        pts = np.full((4, 3), 100.0, dtype=np.float32)
        assert not nb.points_in_rbbox(pts, b).any()


def _mc_rotated_iou(b1, b2, n=200000, seed=0):
    """Monte-Carlo rotated IoU ground truth for a single pair [5]."""
    rng = np.random.RandomState(seed)
    c1 = nb.center_to_corner_box2d(b1[None, :2], b1[None, 2:4], b1[None, 4:5].ravel())
    c2 = nb.center_to_corner_box2d(b2[None, :2], b2[None, 2:4], b2[None, 4:5].ravel())
    allc = np.concatenate([c1, c2], axis=0).reshape(-1, 2)
    lo, hi = allc.min(0) - 0.1, allc.max(0) + 0.1
    pts = rng.uniform(lo, hi, (n, 2))
    in1 = nb.points_in_convex_polygon_2d(pts, c1)[:, 0]
    in2 = nb.points_in_convex_polygon_2d(pts, c2)[:, 0]
    box_area = np.prod(hi - lo)
    inter = np.mean(in1 & in2) * box_area
    union = np.mean(in1 | in2) * box_area
    return inter / union if union > 0 else 0.0


class TestRotatedIoU:
    def test_identical_boxes(self):
        b = np.array([[1.0, 2.0, 2.0, 4.0, 0.3]], dtype=np.float32)
        iou = rotated_iou_np(b, b)
        np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)

    def test_disjoint(self):
        b1 = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]], dtype=np.float32)
        b2 = np.array([[10.0, 10.0, 1.0, 1.0, 0.7]], dtype=np.float32)
        np.testing.assert_allclose(rotated_iou_np(b1, b2), [[0.0]], atol=1e-7)

    def test_axis_aligned_known(self):
        # two unit squares overlapping by half
        b1 = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]], dtype=np.float32)
        b2 = np.array([[0.5, 0.0, 1.0, 1.0, 0.0]], dtype=np.float32)
        np.testing.assert_allclose(rotated_iou_np(b1, b2), [[0.5 / 1.5]], atol=1e-5)

    def test_45_degree_cross(self):
        # unit square vs the same square rotated 45 degrees: octagon overlap
        b1 = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]], dtype=np.float32)
        b2 = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]], dtype=np.float32)
        inter_expected = 8 * (np.sqrt(2) - 1) / 2 * (np.sqrt(2) / 2 - 0.5)  # octagon
        # analytic: intersection of unit square with itself rotated 45deg
        # = 2*(sqrt(2)-1) ~ 0.8284
        inter_expected = 2 * (np.sqrt(2) - 1)
        iou_expected = inter_expected / (2 - inter_expected)
        np.testing.assert_allclose(rotated_iou_np(b1, b2), [[iou_expected]],
                                   atol=1e-4)

    def test_monte_carlo_random_pairs(self, rng):
        for seed in range(6):
            r = np.random.RandomState(seed)
            b1 = np.array([r.uniform(-1, 1), r.uniform(-1, 1),
                           r.uniform(0.5, 2), r.uniform(0.5, 2),
                           r.uniform(-np.pi, np.pi)], dtype=np.float32)
            b2 = np.array([r.uniform(-1, 1), r.uniform(-1, 1),
                           r.uniform(0.5, 2), r.uniform(0.5, 2),
                           r.uniform(-np.pi, np.pi)], dtype=np.float32)
            exact = rotated_iou_np(b1[None], b2[None])[0, 0]
            mc = _mc_rotated_iou(b1, b2, seed=seed)
            assert abs(exact - mc) < 0.02, (seed, exact, mc)

    def test_jax_matches_numpy(self, rng):
        b1 = np.stack([
            rng.uniform(-2, 2, 12), rng.uniform(-2, 2, 12),
            rng.uniform(0.5, 2, 12), rng.uniform(0.5, 2, 12),
            rng.uniform(-np.pi, np.pi, 12)], axis=1).astype(np.float32)
        b2 = np.stack([
            rng.uniform(-2, 2, 9), rng.uniform(-2, 2, 9),
            rng.uniform(0.5, 2, 9), rng.uniform(0.5, 2, 9),
            rng.uniform(-np.pi, np.pi, 9)], axis=1).astype(np.float32)
        a = np.asarray(rotated_iou_jax(jnp.array(b1), jnp.array(b2)))
        b = rotated_iou_np(b1, b2)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    def test_criteria(self):
        b1 = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]], dtype=np.float32)
        b2 = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]], dtype=np.float32)
        inter = rotated_iou_np(b1, b2, criterion=2)[0, 0]
        np.testing.assert_allclose(inter, 2.0, atol=1e-5)
        np.testing.assert_allclose(rotated_iou_np(b1, b2, 0)[0, 0], 0.5, atol=1e-5)
        np.testing.assert_allclose(rotated_iou_np(b1, b2, 1)[0, 0], 0.5, atol=1e-5)


class TestCollision:
    def test_overlapping(self):
        a = nb.center_to_corner_box2d(
            np.array([[0.0, 0.0]]), np.array([[2.0, 2.0]]), np.array([0.0]))
        b = nb.center_to_corner_box2d(
            np.array([[0.5, 0.5]]), np.array([[2.0, 2.0]]), np.array([0.4]))
        assert nb.box_collision_test(a, b)[0, 0]

    def test_disjoint(self):
        a = nb.center_to_corner_box2d(
            np.array([[0.0, 0.0]]), np.array([[1.0, 1.0]]), np.array([0.0]))
        b = nb.center_to_corner_box2d(
            np.array([[5.0, 5.0]]), np.array([[1.0, 1.0]]), np.array([1.0]))
        assert not nb.box_collision_test(a, b)[0, 0]

    def test_full_containment(self):
        a = nb.center_to_corner_box2d(
            np.array([[0.0, 0.0]]), np.array([[4.0, 4.0]]), np.array([0.2]))
        b = nb.center_to_corner_box2d(
            np.array([[0.0, 0.0]]), np.array([[0.5, 0.5]]), np.array([0.9]))
        assert nb.box_collision_test(a, b)[0, 0]
        assert nb.box_collision_test(b, a)[0, 0]

    def test_matches_iou_positive(self, rng):
        boxes = random_boxes(rng, 20)
        bv = boxes[:, [0, 1, 3, 4, 6]]
        corners = nb.center_to_corner_box2d(bv[:, :2], bv[:, 2:4], bv[:, 4])
        coll = nb.box_collision_test(corners, corners)
        iou = rotated_iou_np(bv, bv)
        # wherever rotated IoU is clearly positive, collision must be true.
        # The diagonal is excluded: identical boxes fail the reference's
        # strict containment predicate too (the reference zeroes the
        # diagonal explicitly, load_data.py:1794-1796).
        overlapping = iou > 1e-3
        np.fill_diagonal(overlapping, False)
        assert np.all(coll[overlapping])


class TestIoUMatrix:
    def test_np_vs_jax(self, rng):
        b1 = np.sort(rng.uniform(-3, 3, (10, 4)).astype(np.float32), axis=-1)[:, [0, 1, 2, 3]]
        b1 = np.concatenate([b1[:, :2], b1[:, :2] + np.abs(b1[:, 2:])], axis=1)
        b2 = np.concatenate([b1[:5, :2] - 0.3, b1[:5, 2:] + 0.2], axis=1)
        a = np.asarray(gb.iou_matrix(jnp.array(b1), jnp.array(b2)))
        b = nb.iou_matrix(b1, b2)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
