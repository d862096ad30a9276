"""sample_val_dataset_mode: augmented eval-set creation round trip."""

import pickle

import numpy as np
import pytest

from pillars_tpu.config import Config
from pillars_tpu.data import synthetic
from pillars_tpu.data.pipeline import PedestrianDataset
from pillars_tpu.data.val_sampling import create_sampled_val_dataset


class TestValSampling:
    def test_creates_loadable_augmented_set(self, tmp_path):
        root = str(tmp_path)
        synthetic.generate_dataset(root, num_train=6, num_test=3, seed=0)
        cfg = Config.default()
        cfg = cfg.override("model.voxel.max_points", 32768)
        cfg = cfg.override("train_input.info_path",
                           f"{root}/kitti_infos_train.pkl")
        cfg = cfg.override("train_input.dataset_root", root)
        cfg = cfg.override("train_input.sampler.info_path",
                           f"{root}/kitti_dbinfos_train.pkl")
        out = create_sampled_val_dataset(cfg, f"{root}/kitti_infos_val.pkl")
        with open(out, "rb") as f:
            infos = pickle.load(f)
        assert len(infos) == 3
        for info in infos:
            assert "velodyne_sampled" in info["velodyne_path"]
            annos = info["annos"]
            # the sampler pastes extra pedestrians
            assert len(annos["name"]) >= 1
            assert annos["num_points_in_gt"].min() >= 0

        # the augmented set must load through the normal eval pipeline
        cfg2 = cfg.override("eval_input.info_path", out)
        cfg2 = cfg2.override("eval_input.dataset_root", root)
        ds = PedestrianDataset(cfg2, cfg2.eval_input, training=False)
        s = ds[0]
        assert s["num_points"] > 100
        assert s["gt_valid"].sum() == len(infos[0]["annos"]["name"])
