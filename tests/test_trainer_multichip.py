"""End-to-end Trainer on the 8-device CPU mesh: synthetic dataset, sharded
batches, per-epoch eval, checkpoint artifacts."""

import os

import numpy as np
import pytest

import jax

from pillars_tpu.config import Config
from pillars_tpu.data import synthetic


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = tmp_path_factory.mktemp("synth_mc")
    synthetic.generate_dataset(str(r), num_train=8, num_test=4, seed=1)
    return str(r)


def make_cfg(root, out_dir):
    cfg = Config.default()
    cfg = cfg.override("model.voxel.max_points", 16384)
    cfg = cfg.override("model.voxel.max_voxels", 1024)
    cfg = cfg.override("train_input.info_path", f"{root}/kitti_infos_train.pkl")
    cfg = cfg.override("train_input.dataset_root", root)
    cfg = cfg.override("train_input.sampler.info_path",
                       f"{root}/kitti_dbinfos_train.pkl")
    cfg = cfg.override("train_input.batch_size", 8)  # 1 per device
    cfg = cfg.override("eval_input.info_path", f"{root}/kitti_infos_val.pkl")
    cfg = cfg.override("eval_input.dataset_root", root)
    cfg = cfg.override("eval_input.batch_size", 4)
    cfg = cfg.override("runtime.num_devices", 8)
    cfg = cfg.override("out_dir", out_dir)
    cfg = cfg.override("train_input.num_workers", 1)
    return cfg


class TestTrainerMultichip:
    def test_train_epoch_with_eval(self, root, tmp_path):
        from pillars_tpu.train.trainer import Trainer

        assert len(jax.devices()) >= 8
        cfg = make_cfg(root, str(tmp_path / "out"))
        trainer = Trainer(cfg)
        assert trainer.mesh is not None
        best = trainer.train(epochs=1)
        # artifacts: temp checkpoint + per-epoch result text + metrics csv
        ckpts = os.listdir(trainer.dirs["checkpoints"])
        assert "weights_temp.pkl" in ckpts
        assert os.path.exists(
            os.path.join(trainer.dirs["results"], "model_result_0.txt"))
        assert os.path.exists(
            os.path.join(trainer.dirs["logs"], "metrics.csv"))
        assert np.isfinite(best)

    def test_overfit_fixture(self, root, tmp_path):
        from pillars_tpu.train.trainer import Trainer

        cfg = make_cfg(root, str(tmp_path / "out2"))
        cfg = cfg.override("train.do_evaluate", False)
        trainer = Trainer(cfg)
        batch_file = str(tmp_path / "batch.pkl")
        trainer.train(epochs=1, overfit_first_batch=True,
                      save_batch_file=batch_file, fixture_repeats=3)
        assert os.path.exists(batch_file)
        # replay the recorded batch (from_file_mode)
        trainer2 = Trainer(cfg.override("out_dir", str(tmp_path / "out3")))
        trainer2.train(epochs=1, replay_batch_file=batch_file,
                       fixture_repeats=2)

    def test_sharded_eval_matches_unsharded(self, root, tmp_path):
        """Evaluator shards full eval batches over the data mesh and must
        produce the same annos as the single-device path (the remainder
        batch falls back to one device)."""
        from pillars_tpu.models.detector import PillarsDetector
        from pillars_tpu.train.trainer import Evaluator

        cfg = make_cfg(root, str(tmp_path / "out_ev"))
        cfg = cfg.override("eval_input.batch_size", 4)
        cfg = cfg.override("runtime.num_devices", 4)
        det = PillarsDetector(cfg)
        variables = det.init(jax.random.PRNGKey(0), batch_size=4)

        ev = Evaluator(cfg, det)
        assert ev.mesh is not None and ev.mesh.size == 4
        dt_sharded, gt = ev.run(variables)

        cfg1 = cfg.override("runtime.num_devices", 1)
        ev1 = Evaluator(cfg1, det)
        assert ev1.mesh is None
        dt_single, _ = ev1.run(variables)

        assert len(dt_sharded) == len(dt_single) == len(gt)
        for a, b in zip(dt_sharded, dt_single):
            assert list(a["name"]) == list(b["name"])
            np.testing.assert_allclose(a["score"], b["score"],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(a["location"], b["location"],
                                       rtol=1e-4, atol=1e-4)
