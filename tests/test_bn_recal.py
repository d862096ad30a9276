"""AdaBN BatchNorm recalibration (train/bn_recal.py) tests.

The eval-vs-train BN distribution shift it corrects was measured on the
kitti3 run (scripts/diag_bn_eval_gap.py: score_max 0.16 running-stats vs
0.69 batch-stats on identical scenes)."""

import jax
import numpy as np
import pytest

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.train.bn_recal import build_recal_fn, recalibrate


def _batch(rng, n=3000, scale=1.0):
    mp = Config.default().model.voxel.max_points
    pts = np.zeros((1, mp, 3), np.float32)
    pts[0, :n, 0] = rng.uniform(0, 6.4, n)
    pts[0, :n, 1] = rng.uniform(-2.56, 2.56, n)
    pts[0, :n, 2] = rng.uniform(-1.5, 1.0, n) * scale
    return {"points": pts, "num_points": np.array([n], np.int32)}


class TestBnRecal:
    def test_params_untouched_stats_move(self):
        cfg = Config.default()
        det = PillarsDetector(cfg)
        v = jax.device_get(det.init(jax.random.PRNGKey(0), batch_size=1))
        rng = np.random.RandomState(0)
        batches = [_batch(rng) for _ in range(4)]
        v2 = recalibrate(cfg, v, batches)
        # params identical objects; batch_stats replaced and changed
        assert v2["params"] is v["params"]
        before = jax.tree_util.tree_leaves(v["batch_stats"])
        after = jax.tree_util.tree_leaves(v2["batch_stats"])
        moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                    for a, b in zip(before, after))
        assert moved
        # input dict untouched
        assert v["batch_stats"] is not v2["batch_stats"]

    def test_stats_track_recal_distribution(self):
        """Recal over a shifted input distribution must pull the EMA means
        toward that distribution's batch statistics."""
        cfg = Config.default()
        det = PillarsDetector(cfg)
        v = jax.device_get(det.init(jax.random.PRNGKey(0), batch_size=1))
        rng = np.random.RandomState(1)
        batches = [_batch(rng, scale=1.0) for _ in range(6)]
        step = build_recal_fn(cfg, momentum=0.5)
        v2 = recalibrate(cfg, v, batches, step=step)
        # one more identical-distribution batch barely moves the stats:
        # they have converged onto the recal distribution
        v3 = recalibrate(cfg, v2, [_batch(np.random.RandomState(2))],
                         step=step)
        d12 = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                  for a, b in zip(jax.tree_util.tree_leaves(v["batch_stats"]),
                                  jax.tree_util.tree_leaves(v2["batch_stats"])))
        d23 = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                  for a, b in zip(jax.tree_util.tree_leaves(v2["batch_stats"]),
                                  jax.tree_util.tree_leaves(v3["batch_stats"])))
        assert d23 < d12 * 0.6

    def test_evaluator_recal_wiring(self, tmp_path):
        """eval_input.bn_recal_batches=K routes eval through recalibrated
        stats without touching the trainer state (integration, synthetic
        dataset, CPU)."""
        from pillars_tpu.cli import main
        import os

        root = str(tmp_path / "d")
        main(["synth-data", "--root", root, "--num-train", "4",
              "--num-test", "2"])
        from pillars_tpu.train.trainer import Evaluator

        cfg = Config.default()
        for k, val in [("eval_input.dataset_root", root),
                       ("eval_input.info_path",
                        os.path.join(root, "kitti_infos_val.pkl")),
                       ("train_input.dataset_root", root),
                       ("train_input.info_path",
                        os.path.join(root, "kitti_infos_train.pkl")),
                       ("eval_input.bn_recal_batches", 2),
                       ("eval_input.batch_size", 1)]:
            cfg = cfg.override(k, val)
        det = PillarsDetector(cfg)
        v = jax.device_get(det.init(jax.random.PRNGKey(0), batch_size=1))
        ev = Evaluator(cfg, det)
        result, bev, d3, aos, score = ev.evaluate(v, max_samples=2)
        assert np.isfinite(score)
        # the recal batch cache was built from the train split
        assert ev._recal_batches is not None and len(ev._recal_batches) == 2
