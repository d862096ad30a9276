"""SECOND-style 3D-middle-extractor variant: shapes, scatter, training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.models.middle import scatter_to_grid3d


def second_cfg():
    cfg = Config.from_yaml("configs/second_d435i.yaml")
    cfg = cfg.override("model.voxel.max_voxels", 2048)
    cfg = cfg.override("model.voxel.max_points", 4096)
    return cfg


class TestScatter3D:
    def test_places_by_zyx(self):
        feats = jnp.array([[1.0], [2.0], [3.0]])
        coords = jnp.array([[0, 1, 2], [3, 1, 2], [0, 0, 0]], jnp.int32)
        mask = jnp.array([True, True, False])
        grid = scatter_to_grid3d(feats, coords, mask, nz=4, ny=2, nx=3)
        assert float(grid[0, 1, 2, 0]) == 1.0
        assert float(grid[3, 1, 2, 0]) == 2.0
        assert float(jnp.sum(grid)) == 3.0  # padding dropped


class TestSecondVariant:
    @pytest.fixture(scope="class")
    def det_vars(self):
        cfg = second_cfg()
        assert cfg.model.voxel.grid_size[2] == 16
        det = PillarsDetector(cfg)
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)
        return det, variables

    def test_forward_shapes(self, det_vars, rng):
        det, variables = det_vars
        pts = np.zeros((1, 4096, 3), np.float32)
        n = 1500
        pts[0, :n, 0] = rng.uniform(0.2, 6.2, n)
        pts[0, :n, 1] = rng.uniform(-2.4, 2.4, n)
        pts[0, :n, 2] = rng.uniform(-2.8, 2.8, n)
        vox = det.voxelize_batch(jnp.array(pts), jnp.array([n], jnp.int32))
        # fine z resolution -> many z layers occupied
        zs = np.asarray(vox.coords)[np.asarray(vox.pillar_mask)][:, 0]
        assert len(set(zs.tolist())) > 4
        preds = det.apply(variables, vox, train=False)
        assert preds["box_preds"].shape == (1, 64, 80, 14)
        assert "middle" in variables["params"]
        assert np.all(np.isfinite(np.asarray(preds["box_preds"])))

    def test_train_step_runs(self, det_vars, rng):
        from pillars_tpu.train.loop import create_train_state, make_train_step

        cfg = second_cfg()
        det = PillarsDetector(cfg)
        state, tx = create_train_state(det, jax.random.PRNGKey(0), 2)
        step = make_train_step(det, tx, donate=False)
        pts = np.zeros((2, 4096, 3), np.float32)
        n = 800
        pts[:, :n, 0] = rng.uniform(0.2, 6.2, (2, n))
        pts[:, :n, 1] = rng.uniform(-2.4, 2.4, (2, n))
        pts[:, :n, 2] = rng.uniform(-2.5, 0.5, (2, n))
        gt = np.zeros((2, 24, 7), np.float32)
        gt[..., 3:6] = 1.0
        gt[:, 0] = [3.0, 0.0, -1.5, 0.6, 0.8, 1.73, 0.3]
        gt_valid = np.zeros((2, 24), bool)
        gt_valid[:, 0] = True
        batch = dict(points=pts, num_points=np.full((2,), n, np.int32),
                     gt_boxes=gt, gt_classes=np.ones((2, 24), np.int32),
                     gt_valid=gt_valid)
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics.loss))
        w0 = jax.tree_util.tree_leaves(state.params)[0]
        w1 = jax.tree_util.tree_leaves(state2.params)[0]
        assert not np.allclose(np.asarray(w0), np.asarray(w1))
