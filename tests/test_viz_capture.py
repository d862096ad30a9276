"""Viz subsystem + capture tool tests."""

import os
import pickle

import numpy as np
import pytest

from pillars_tpu.data import capture
from pillars_tpu.viz import BoxArray, NullPublisher, OfflinePublisher
from pillars_tpu.viz import plot


class TestPublisher:
    def test_offline_roundtrip(self, tmp_path):
        pub = OfflinePublisher(str(tmp_path))
        boxes = BoxArray.from_boxes7(
            np.array([[1, 2, 3, 0.5, 0.6, 1.7, 0.3]], np.float32),
            confidences=np.array([0.9]))
        pub.publish_boxes("bb_pred_guess_1", boxes)
        pub.publish_boxes("bb_pred_guess_1", boxes)
        pub.publish_points("debug_points", np.zeros((10, 3), np.float32))
        files = sorted(os.listdir(tmp_path / "bb_pred_guess_1"))
        assert files == ["000000.pkl", "000001.pkl"]
        with open(tmp_path / "bb_pred_guess_1" / "000000.pkl", "rb") as f:
            rec = pickle.load(f)
        np.testing.assert_allclose(rec["centers"], [[1, 2, 3]])
        np.testing.assert_allclose(rec["confidences"], [0.9])

    def test_null_publisher(self):
        NullPublisher().publish_boxes("x", BoxArray.from_boxes7(
            np.zeros((0, 7), np.float32)))


class TestPlot:
    def test_bev_png(self, tmp_path, rng):
        pts = rng.uniform(-1, 5, (500, 3)).astype(np.float32)
        gt = np.array([[2, 0, -1.4, 0.6, 0.8, 1.7, 0.2]], np.float32)
        out = str(tmp_path / "bev.png")
        plot.plot_bev(points=pts, gt_boxes=gt, pred_boxes=gt,
                      scores=np.array([0.8]), save_path=out)
        assert os.path.getsize(out) > 1000

    def test_confidence_map(self, tmp_path, rng):
        cls = rng.randn(64, 80, 2).astype(np.float32)
        out = str(tmp_path / "conf.png")
        plot.confidence_map(cls, (0, -2.56, -3, 6.4, 2.56, 3),
                            (0.08, 0.08, 4.0), save_path=out)
        assert os.path.getsize(out) > 1000

    def test_replay_offline_topic(self, tmp_path, rng):
        pub = OfflinePublisher(str(tmp_path / "rec"))
        boxes = BoxArray.from_boxes7(
            np.array([[2, 0, -1.4, 0.6, 0.8, 1.7, 0.2]], np.float32))
        pub.publish_boxes("preds", boxes)
        outs = plot.replay_offline_topic(str(tmp_path / "rec" / "preds"),
                                         str(tmp_path / "png"))
        assert len(outs) == 1 and os.path.exists(outs[0])


class TestCapture:
    def test_d435i_transform(self):
        # a point 2 m in front of the camera (z forward in image coords)
        # must land 2 m ahead in lidar x, lifted by 1 m
        pts = np.array([[0.0, 0.0, 2.0]] * 4, np.float32)
        out = capture.d435i_to_lidar(pts, subsample=1)
        np.testing.assert_allclose(out[0], [2.0, 0.0, 1.0], atol=1e-5)
        # subsampling 1::4-style keeps every 4th
        out4 = capture.d435i_to_lidar(np.repeat(pts, 2, 0), subsample=4)
        assert len(out4) == 2

    def test_annotation_session_keys(self):
        s = capture.AnnotationSession()
        x0 = s.box.x
        s.apply("w")
        s.apply("w")
        s.apply("s")
        assert s.box.x == pytest.approx(x0 + capture.AnnotationSession.STEP_POS)
        y0 = s.box.yaw
        s.apply("q")
        assert s.box.yaw == pytest.approx(y0 + capture.AnnotationSession.STEP_ROT)

    def test_predefined_capture_writes_dataset(self, tmp_path, rng):
        frames = [rng.uniform(-1, 1, (400, 3)).astype(np.float32)
                  for _ in range(16)]
        n = capture.capture_predefined(frames, str(tmp_path), every_nth=4,
                                       already_lidar=True)
        assert n == 4
        for d in ("velodyne", "label_2", "calib"):
            assert len(os.listdir(tmp_path / "training" / d)) == 4
        # labels carry the cycling predefined rotations
        from pillars_tpu.data.kitti_infos import get_label_anno
        rots = []
        for i in range(4):
            anno = get_label_anno(str(tmp_path / "training" / "label_2"
                                      / f"{i:06d}.txt"))
            assert anno["name"][0] == "Pedestrian"
            rots.append(float(anno["rotation_y"][0]))
        assert len(set(np.round(rots, 3))) == 4  # distinct rotations

    def test_capture_is_ingestible(self, tmp_path, rng):
        """A captured dataset must round-trip through create-data."""
        from pillars_tpu.data import kitti_infos as ki

        frames = [rng.uniform(0.5, 3.0, (300, 3)).astype(np.float32)
                  for _ in range(4)]
        capture.capture_predefined(frames, str(tmp_path), every_nth=1,
                                   already_lidar=True)
        info_path = ki.create_info_file(str(tmp_path), list(range(4)))
        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        assert len(infos) == 4
        assert infos[0]["annos"]["name"][0] == "Pedestrian"
