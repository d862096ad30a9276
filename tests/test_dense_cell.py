"""The dense-cell inference front end (voxelize_cells + DenseCellPFN +
reshape canvas + occupancy anchors mask) must match the VoxelizedPoints
path end to end: same predictions from the same variables."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.ops.voxelize import voxelize_np


def make_cfg(dense_cell):
    cfg = Config.default()
    cfg = cfg.override("model.voxel.max_points", 8192)
    cfg = cfg.override("model.pfn.dense_cell", dense_cell)
    return cfg


@pytest.fixture(scope="module")
def dets():
    det_dc = PillarsDetector(make_cfg(True))
    det_pw = PillarsDetector(make_cfg(False))
    variables = det_pw.init(jax.random.PRNGKey(0), batch_size=2)
    return det_dc, det_pw, variables


def cloud(rng, n=3000, crowded=False):
    pts = np.zeros((2, 8192, 3), np.float32)
    spread = 0.15 if crowded else 6.0
    pts[:, :n, 0] = rng.uniform(0.2, 0.2 + spread, (2, n))
    pts[:, :n, 1] = rng.uniform(-2.4, 2.4, (2, n))
    pts[:, :n, 2] = rng.uniform(-2.5, 0.5, (2, n))
    return jnp.array(pts), jnp.array([n, n - 500], jnp.int32)


class TestVoxelizeCells:
    """Oracle: the loop-based reference twin (reference load_data.py:593-692)."""

    def _run(self, rng, n, crowded):
        cfg = make_cfg(True)
        det = PillarsDetector(cfg)
        pts, num = cloud(rng, n=n, crowded=crowded)
        cv = det.cell_voxelize(pts, num)
        vc = cfg.model.voxel
        total_pillars = 0
        for b in range(2):
            vox_np, coors_np, npts_np = voxelize_np(
                np.asarray(pts[b, : int(num[b])]), vc.voxel_size,
                vc.point_cloud_range, vc.max_points_per_voxel, vc.max_voxels)
            nx, ny, nz = vc.grid_size
            cells_ref = ((coors_np[:, 0] * ny + coors_np[:, 1]) * nx
                         + coors_np[:, 2])  # coors are (z, y, x)
            # per-cell counts match
            got = {}
            cell = np.asarray(cv.cell[b])
            kept = np.asarray(cv.kept[b])
            count = np.asarray(cv.count[b])
            for c, cnt in zip(cell[kept], count[kept]):
                got[int(c)] = int(cnt)
            want = {int(c): int(n_) for c, n_ in zip(cells_ref, npts_np)}
            assert got == want
            # kept points per cell are exactly the reference's voxel rows
            # (first-N-in-input-order), order-insensitive within the cell
            pts_b = np.asarray(cv.points[b])
            for i, c in enumerate(cells_ref):
                ref_rows = vox_np[i, : npts_np[i]]
                mine = pts_b[kept & (cell == c)]
                assert sorted(map(tuple, ref_rows)) == sorted(map(tuple, mine))
            # mean equals mean over kept points
            for i, c in enumerate(cells_ref):
                ref_mean = vox_np[i, : npts_np[i], :3].mean(axis=0)
                sel = kept & (cell == c)
                np.testing.assert_allclose(
                    np.asarray(cv.mean[b])[sel][0], ref_mean, rtol=1e-5,
                    atol=1e-6)
            total_pillars += len(cells_ref)
        assert int(cv.num_pillars) == total_pillars

    def test_sparse(self, rng):
        self._run(rng, 3000, False)

    def test_crowded_hits_cap(self, rng):
        self._run(rng, 6000, True)

    def test_empty_cloud(self):
        det = PillarsDetector(make_cfg(True))
        pts = jnp.zeros((1, 8192, 3), jnp.float32)
        cv = det.cell_voxelize(pts, jnp.zeros((1,), jnp.int32))
        assert int(cv.num_pillars) == 0
        assert not bool(jnp.any(cv.kept))


class TestDensePathEquivalence:
    def test_predictions_identical(self, dets, rng):
        det_dc, det_pw, variables = dets
        pts, num = cloud(rng)
        eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (2, 1, 1))
        out_dc = det_dc.make_inference_fn()(variables, pts, num, eye, eye)
        out_pw = det_pw.make_inference_fn()(variables, pts, num, eye, eye)
        np.testing.assert_array_equal(np.asarray(out_dc.valid),
                                      np.asarray(out_pw.valid))
        v = np.asarray(out_pw.valid)
        np.testing.assert_allclose(np.asarray(out_dc.scores)[v],
                                   np.asarray(out_pw.scores)[v],
                                   rtol=1e-4, atol=1e-5)
        # random-init heads go through exp() in the decode, so box dims are
        # astronomically amplified; rtol 1e-3 still pins the semantics
        np.testing.assert_allclose(np.asarray(out_dc.boxes_lidar)[v],
                                   np.asarray(out_pw.boxes_lidar)[v],
                                   rtol=1e-3, atol=1e-4)

    def test_predictions_identical_crowded(self, dets, rng):
        """Full pillars exercise the 50-point cap + zero-row edge."""
        det_dc, det_pw, variables = dets
        pts, num = cloud(rng, n=6000, crowded=True)
        eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (2, 1, 1))
        out_dc = det_dc.make_inference_fn()(variables, pts, num, eye, eye)
        out_pw = det_pw.make_inference_fn()(variables, pts, num, eye, eye)
        np.testing.assert_array_equal(np.asarray(out_dc.valid),
                                      np.asarray(out_pw.valid))
        v = np.asarray(out_pw.valid)
        np.testing.assert_allclose(np.asarray(out_dc.scores)[v],
                                   np.asarray(out_pw.scores)[v],
                                   rtol=1e-3, atol=1e-4)

    def test_empty_cloud_no_detections_kept_consistent(self, dets):
        det_dc, det_pw, variables = dets
        pts = jnp.zeros((2, 8192, 3), jnp.float32)
        num = jnp.zeros((2,), jnp.int32)
        eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (2, 1, 1))
        out_dc = det_dc.make_inference_fn()(variables, pts, num, eye, eye)
        out_pw = det_pw.make_inference_fn()(variables, pts, num, eye, eye)
        np.testing.assert_array_equal(np.asarray(out_dc.valid),
                                      np.asarray(out_pw.valid))
