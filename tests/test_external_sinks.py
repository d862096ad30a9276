"""Exercise the import-gated external sinks (wandb, ROS) via stub modules.

These paths are real framework surface — reference train.py logs to wandb
(libraries/train_helper_functions.py:6-39), rviz_show_predictions.py /
send_3d_bbox publish jsk BoundingBoxArray messages, and the production loop
subscribes to the RealSense pointcloud topic (load_data.py:2077-2127) — but
the image has neither wandb nor ROS installed, so without stubs they carry
zero test coverage (round-1 review, VERDICT weak #8). The stubs implement
exactly the API surface the code touches; everything downstream of the
import (message assembly, quaternion convention, topic bookkeeping, the
image->lidar transform) is the real code under test.
"""

import sys
import types

import numpy as np
import pytest


def _install(monkeypatch, name, module):
    monkeypatch.setitem(sys.modules, name, module)
    return module


# ---------------------------------------------------------------------------
# wandb sink
# ---------------------------------------------------------------------------


class _FakeWandb(types.ModuleType):
    def __init__(self):
        super().__init__("wandb")
        self.init_calls = []
        self.log_calls = []

    def init(self, **kw):
        self.init_calls.append(kw)

    def log(self, metrics, step=None):
        self.log_calls.append((step, dict(metrics)))


class TestWandbSink:
    def test_train_and_eval_keys(self, monkeypatch, tmp_path):
        fake = _install(monkeypatch, "wandb", _FakeWandb())
        from pillars_tpu.train.metrics_log import MetricLogger

        logger = MetricLogger(log_dir=str(tmp_path), use_wandb=True,
                              wandb_project="proj", run_name="r1")
        assert fake.init_calls == [{"project": "proj", "name": "r1"}]

        m = types.SimpleNamespace(loc_loss_reduced=1.5, cls_loss_reduced=0.5,
                                  dir_loss_reduced=0.25, loss=2.25,
                                  learning_rate=2e-3)
        logger.log_train_step(10, 3, m)
        step, metrics = fake.log_calls[-1]
        assert step == 10
        # reference key names (train_helper_functions.py:6-14)
        assert metrics == {"loc_loss_reduced": 1.5,
                           "cls_loss_reduced": 0.5,
                           "dir_loss_reduced": 0.25, "loss": 2.25,
                           "learning_rate": 2e-3, "epochs": 3.0}

        ap = np.arange(6, dtype=np.float64).reshape(1, 1, 6)
        logger.log_eval(11, ap, ap * 2, ap * 3, score=42.0)
        step, metrics = fake.log_calls[-1]
        assert step == 11
        assert metrics["ev_3d_50"] == 0.0 and metrics["ev_3d_75"] == 5.0
        # BEV keys use the reference's 70-95 labels (its BEV IoU ladder)
        assert metrics["ev_aos_60"] == 4.0 and metrics["ev_bev_70"] == 0.0
        assert metrics["ev_bev_95"] == 15.0
        assert metrics["avg"] == 42.0
        # CSV sink ran alongside wandb
        assert (tmp_path / "metrics.csv").exists()

    def test_broken_wandb_falls_back(self, monkeypatch, tmp_path, capsys):
        broken = types.ModuleType("wandb")
        broken.init = lambda **kw: (_ for _ in ()).throw(RuntimeError("no net"))
        _install(monkeypatch, "wandb", broken)
        from pillars_tpu.train.metrics_log import MetricLogger

        logger = MetricLogger(log_dir=str(tmp_path), use_wandb=True)
        assert logger._wandb is None
        logger.log(0, {"loss": 1.0})  # must not raise
        assert "wandb unavailable" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# ROS stubs shared by publisher + source tests
# ---------------------------------------------------------------------------


class _FakeTime:
    @staticmethod
    def now():
        return 123456789


class _FakePublisher:
    def __init__(self, topic, msg_type, queue_size=10):
        self.topic = topic
        self.msg_type = msg_type
        self.queue_size = queue_size
        self.published = []

    def publish(self, msg):
        self.published.append(msg)


def _fake_rospy(monkeypatch):
    rospy = types.ModuleType("rospy")
    rospy.Time = _FakeTime
    rospy.Publisher = _FakePublisher
    rospy.get_node_uri = lambda: "fake://node"
    rospy.init_node = lambda *a, **k: None
    subs = []

    def Subscriber(topic, msg_type, callback, queue_size=1):
        sub = types.SimpleNamespace(topic=topic, msg_type=msg_type,
                                    callback=callback, queue_size=queue_size)
        subs.append(sub)
        return sub

    rospy.Subscriber = Subscriber
    rospy._subs = subs
    return _install(monkeypatch, "rospy", rospy)


class _Vec3:
    def __init__(self):
        self.x = self.y = self.z = 0.0


class _Quat(_Vec3):
    def __init__(self):
        super().__init__()
        self.w = 1.0


class _Pose:
    def __init__(self):
        self.position = _Vec3()
        self.orientation = _Quat()


class _Header:
    def __init__(self):
        self.stamp = None
        self.frame_id = ""


class _BoundingBox:
    def __init__(self):
        self.header = _Header()
        self.pose = _Pose()
        self.dimensions = _Vec3()
        self.value = 0.0


class _BoundingBoxArray:
    def __init__(self):
        self.header = _Header()
        self.boxes = []


def _fake_ros_msgs(monkeypatch):
    std_msgs = types.ModuleType("std_msgs")
    std_msgs.msg = types.ModuleType("std_msgs.msg")
    std_msgs.msg.Header = _Header
    _install(monkeypatch, "std_msgs", std_msgs)
    _install(monkeypatch, "std_msgs.msg", std_msgs.msg)

    jsk = types.ModuleType("jsk_recognition_msgs")
    jsk.msg = types.ModuleType("jsk_recognition_msgs.msg")
    jsk.msg.BoundingBox = _BoundingBox
    jsk.msg.BoundingBoxArray = _BoundingBoxArray
    _install(monkeypatch, "jsk_recognition_msgs", jsk)
    _install(monkeypatch, "jsk_recognition_msgs.msg", jsk.msg)

    class _PointField:
        FLOAT32 = 7

        def __init__(self, name, offset, datatype, count):
            self.name, self.offset = name, offset
            self.datatype, self.count = datatype, count

    sensor = types.ModuleType("sensor_msgs")
    sensor.msg = types.ModuleType("sensor_msgs.msg")
    sensor.msg.PointField = _PointField
    sensor.msg.PointCloud2 = type("PointCloud2", (), {})
    pc2 = types.ModuleType("sensor_msgs.point_cloud2")
    pc2.create_cloud = lambda header, fields, pts: {
        "header": header, "fields": fields, "points": np.asarray(pts)}
    sensor.point_cloud2 = pc2
    _install(monkeypatch, "sensor_msgs", sensor)
    _install(monkeypatch, "sensor_msgs.msg", sensor.msg)
    _install(monkeypatch, "sensor_msgs.point_cloud2", pc2)


class TestRosPublisher:
    def test_publish_boxes_message_assembly(self, monkeypatch):
        _fake_rospy(monkeypatch)
        _fake_ros_msgs(monkeypatch)
        from pillars_tpu.viz.publisher import BoxArray, RosPublisher

        pub = RosPublisher(frame_id="camera_color_frame")
        boxes = BoxArray.from_boxes7(
            np.array([[1.0, 2.0, -0.5, 0.6, 0.8, 1.7, 0.3],
                      [3.0, -1.0, -1.0, 0.5, 0.5, 1.6, -1.2]], np.float32),
            confidences=np.array([0.9, -50.0], np.float32))
        pub.publish_boxes("bb_pred_guess_1", boxes)

        p = pub._pubs["bb_pred_guess_1"]
        assert p.topic == "bb_pred_guess_1"
        (arr,) = p.published
        assert arr.header.frame_id == "camera_color_frame"
        assert len(arr.boxes) == 2
        b0 = arr.boxes[0]
        assert (b0.pose.position.x, b0.pose.position.y,
                b0.pose.position.z) == (1.0, 2.0, -0.5)
        assert (b0.dimensions.x, b0.dimensions.y,
                b0.dimensions.z) == pytest.approx((0.6, 0.8, 1.7), abs=1e-6)
        # quaternion convention: R.from_euler('z', -yaw)
        # (eval_helper_functions.py:107-145)
        from scipy.spatial.transform import Rotation as R

        want = R.from_euler("z", -0.3).as_quat()
        got = np.array([b0.pose.orientation.x, b0.pose.orientation.y,
                        b0.pose.orientation.z, b0.pose.orientation.w])
        np.testing.assert_allclose(got, want, atol=1e-7)
        assert b0.value == pytest.approx(0.9)
        # confidence clamp at -10 (reference b.value = max(-10, score))
        assert arr.boxes[1].value == -10.0

    def test_publish_points_and_topic_reuse(self, monkeypatch):
        _fake_rospy(monkeypatch)
        _fake_ros_msgs(monkeypatch)
        from pillars_tpu.viz.publisher import RosPublisher

        pub = RosPublisher()
        pts = np.arange(12, dtype=np.float32).reshape(4, 3)
        pub.publish_points("debug_points", pts)
        pub.publish_points("debug_points", pts * 2)
        p = pub._pubs["debug_points"]
        assert len(pub._pubs) == 1  # publisher object reused per topic
        assert len(p.published) == 2
        np.testing.assert_array_equal(p.published[0]["points"], pts)
        names = [f.name for f in p.published[0]["fields"]]
        assert names == ["x", "y", "z"]

    def test_make_publisher_auto_prefers_ros(self, monkeypatch, tmp_path):
        _fake_rospy(monkeypatch)
        _fake_ros_msgs(monkeypatch)
        from pillars_tpu.viz.publisher import (RosPublisher, OfflinePublisher,
                                               NullPublisher, make_publisher)

        assert isinstance(make_publisher("auto"), RosPublisher)
        # and falls back in ROS-less envs (the real modules stay absent
        # outside this monkeypatch context)
        monkeypatch.delitem(sys.modules, "rospy")
        assert isinstance(make_publisher("auto", out_dir=str(tmp_path)),
                          OfflinePublisher)
        assert isinstance(make_publisher("auto"), NullPublisher)
        with pytest.raises(Exception):
            make_publisher("ros")


class TestRosSource:
    def test_subscribe_and_transform(self, monkeypatch):
        rospy = _fake_rospy(monkeypatch)
        _fake_ros_msgs(monkeypatch)
        ros_numpy = types.ModuleType("ros_numpy")
        ros_numpy.point_cloud2 = types.SimpleNamespace(
            pointcloud2_to_xyz_array=lambda msg: msg["xyz"])
        _install(monkeypatch, "ros_numpy", ros_numpy)

        from pillars_tpu.data.capture import d435i_to_lidar
        from pillars_tpu.data.stream import LatestFrameMailbox, ros_source

        mailbox = LatestFrameMailbox()
        sub = ros_source(mailbox, topic="/camera/depth/color/points",
                         subsample=2)
        assert sub.topic == "/camera/depth/color/points"
        assert rospy._subs == [sub]

        xyz = np.arange(30, dtype=np.float32).reshape(10, 3)
        sub.callback({"xyz": xyz})
        frame, skipped = mailbox.take(timeout=1.0)
        assert skipped == 0
        # the callback routes through the real image->lidar transform
        np.testing.assert_allclose(frame, d435i_to_lidar(xyz, subsample=2),
                                   rtol=1e-6)
