"""kitti3 synthetic profile: full-LiDAR-scale 3-class scenes
(data/synthetic.py::make_scene_kitti) must produce a dataset the whole
KITTI 3-class pipeline (configs/kitti_3class.yaml schema) can train on."""

import numpy as np
import pytest

from pillars_tpu.data import synthetic


class TestSceneGenerator:
    def test_scene_contract(self):
        rng = np.random.RandomState(3)
        pts, gt, names, meta = synthetic.make_scene_kitti(rng)
        assert pts.shape[1] == 4  # x y z intensity
        assert gt.shape[1] == 7
        assert len(names) == len(gt) == len(meta)
        assert set(names) <= {"Car", "Pedestrian", "Cyclist"}
        # KITTI range, ground near -1.7
        assert pts[:, 0].min() >= -1.0 and pts[:, 0].max() <= 70.0
        assert abs(np.median(pts[:, 2]) - (-1.7)) < 0.2
        assert 0.0 <= pts[:, 3].min() and pts[:, 3].max() <= 1.0

    def test_heading_observable(self):
        """Car/cyclist shells must rotate with the label yaw: two boxes
        differing only in yaw produce visibly different point sets."""
        rng = np.random.RandomState(0)
        box = np.array([20.0, 0.0, -1.7, 1.8, 4.2, 1.5, 0.0], np.float32)
        box2 = box.copy()
        box2[6] = np.pi / 2
        a = synthetic._car_points(np.random.RandomState(1), box, 500)
        b = synthetic._car_points(np.random.RandomState(1), box2, 500)
        # extents swap axes under a 90-degree yaw
        assert abs(np.ptp(a[:, 0]) - np.ptp(b[:, 1])) < 0.6
        assert np.ptp(a[:, 0]) > np.ptp(a[:, 1]) + 1.0  # length along x

    def test_difficulty_stratifies(self):
        rng = np.random.RandomState(7)
        occ = {0: 0, 1: 0, 2: 0}
        heights = []
        for _ in range(12):
            _, _, _, meta = synthetic.make_scene_kitti(rng)
            for m in meta:
                occ[m["occluded"]] += 1
                heights.append(m["bbox"][3] - m["bbox"][1])
        heights = np.asarray(heights)
        assert occ[0] > 0 and occ[1] > 0 and occ[2] > 0
        # the pinhole gates must split the population (40/25 px)
        assert (heights >= 40).any() and (heights < 25).any()


class TestDatasetEndToEnd:
    def test_generate_and_load(self, tmp_path):
        from pillars_tpu.config import Config
        from pillars_tpu.data.pipeline import PedestrianDataset

        root = str(tmp_path / "k3")
        synthetic.generate_dataset(root, num_train=3, num_test=2, seed=11,
                                   profile="kitti3")
        # info + gt database artifacts for all three classes
        import pickle
        with open(f"{root}/kitti_dbinfos_train.pkl", "rb") as f:
            db = pickle.load(f)
        assert set(db) & {"Car", "Pedestrian", "Cyclist"}

        cfg = Config.from_yaml("configs/kitti_3class.yaml")
        cfg = cfg.override("train_input.dataset_root", root)
        cfg = cfg.override("train_input.info_path",
                           f"{root}/kitti_infos_train.pkl")
        cfg = cfg.override("train_input.sampler.info_path",
                           f"{root}/kitti_dbinfos_train.pkl")
        ds = PedestrianDataset(cfg, cfg.train_input, training=True)
        item = ds[0]
        assert item["points"].shape == (cfg.model.voxel.max_points, 4)
        assert item["num_points"] > 10000
        # at least one gt survived augmentation, classes in 1..3
        n_gt = int(item["gt_valid"].sum())
        assert n_gt >= 1
        cls = item["gt_classes"][:n_gt]
        assert set(np.unique(cls)) <= {1, 2, 3}


class TestStoredPointOrder:
    def test_written_clouds_are_sweep_interleaved(self, tmp_path):
        """Stored pointclouds must not be background-then-objects BLOCK
        ordered: the voxelizer's first-come-first-kept max_voxels cap (a
        load-bearing reference quirk, load_data.py:631-640) exhausts on a
        45k-point background block before any object point and silently
        drops every object at (unshuffled) eval time — measured 0% of GT
        reachable vs 98% on shuffled inputs with the same checkpoint
        (round-5, scripts/diag_train_eval_gap.py). The writer therefore
        emits points in randomized order like a real sweep's azimuth
        interleave."""
        import pickle

        from pillars_tpu.geometry import np_boxes as nb

        root = str(tmp_path / "ord")
        synthetic.generate_dataset(root, num_train=1, num_test=0, seed=3,
                                   profile="kitti3")
        pts = np.asarray(pickle.load(
            open(f"{root}/training/velodyne/000000.pkl", "rb")))
        infos = pickle.load(open(f"{root}/kitti_infos_train.pkl", "rb"))
        an = infos[0]["annos"]
        boxes = np.concatenate(
            [an["location"], an["dimensions"],
             an["rotation_y"][:, None]], axis=1).astype(np.float32)
        boxes = nb.box_camera_to_lidar(
            boxes, np.eye(4, dtype=np.float32),
            np.asarray(synthetic.VELO2CAM, np.float32))
        inside = nb.points_in_rbbox(pts[:, :3], boxes).any(axis=1)
        assert inside.sum() > 50
        # object points' ranks must be spread over the file, not stacked
        # at the end: mean normalized rank well inside (0.3, 0.7)
        ranks = np.nonzero(inside)[0] / len(pts)
        assert 0.3 < float(ranks.mean()) < 0.7
        # and a healthy share must appear in the FIRST third (the region
        # the voxel cap is guaranteed to consume)
        assert (ranks < 1 / 3).mean() > 0.15
