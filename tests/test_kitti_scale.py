"""Full-KITTI-scale config (432x496 grid, 3 classes, 1.29M anchors) compiles
and runs end to end (SURVEY §7 config #5 scale-out)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector


class TestKittiScale:
    def test_full_grid_inference(self, rng):
        cfg = Config.from_yaml("configs/kitti_3class.yaml")
        cfg = cfg.override("model.voxel.max_points", 16384)
        cfg = cfg.override("model.voxel.max_voxels", 8000)
        cfg = cfg.override("model.postprocess.nms_pre_max_size", 128)
        cfg = cfg.override("model.postprocess.nms_post_max_size", 64)
        det = PillarsDetector(cfg)
        assert det.anchor_set.anchors.shape == (432 * 496 * 6, 7)
        assert cfg.model.voxel.grid_size == (432, 496, 1)
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)
        n = 8000
        pts = np.zeros((1, 16384, 4), np.float32)
        pts[0, :n, 0] = rng.uniform(0, 69, n)
        pts[0, :n, 1] = rng.uniform(-39, 39, n)
        pts[0, :n, 2] = rng.uniform(-2.5, 0.5, n)
        eye = jnp.eye(4)[None]
        out = det.make_inference_fn()(variables, jnp.asarray(pts),
                                      jnp.asarray([n], jnp.int32), eye, eye)
        assert out.boxes_lidar.shape == (1, 64, 7)
        assert np.all(np.isfinite(np.asarray(out.scores)))
