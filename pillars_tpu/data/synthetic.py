"""Synthetic d435i-like pedestrian dataset generator.

The real dataset (reference README.md:44-75, recorded with an Intel RealSense
d435i) is not shipped; this generates a structurally identical dataset on
disk — pickled float32 pointclouds, KITTI label/calib text files, info pkls
and a GT database — so every flow (train / eval / create-data / bench /
streaming replay) runs end to end and tests are hermetic.

Scenes: a ground plane + wall clutter + N pedestrians (ellipsoid point blobs
with legs/torso structure), annotated in CAMERA coordinates like the
reference capture tool does (realsense_make_dataset.py:622-801).
"""

from __future__ import annotations

import pathlib
import pickle
from typing import Tuple

import numpy as np

from pillars_tpu.data import kitti_infos as ki
from pillars_tpu.geometry import np_boxes as nb

# d435i capture frame: identity rect, identity velo2cam is WRONG for KITTI
# but matches the reference custom dataset ("rect is just the unity matrix
# for d435i data", load_data.py:2466-2469) apart from axis naming: we use an
# axis-permuting velo2cam so camera(x right, y down, z fwd) <-> lidar
# (x fwd, y left, z up) conversions stay non-trivial, exercising the math.
VELO2CAM = np.array([
    [0.0, -1.0, 0.0, 0.0],
    [0.0, 0.0, -1.0, 0.0],
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 1.0],
], dtype=np.float32)
RECT = np.eye(4, dtype=np.float32)


def _pedestrian_points(rng, box, n=None):
    """Point blob shaped like a standing person inside a lidar box
    [x, y, z, w, l, h, r] (z = bottom)."""
    x, y, z, w, l, h, r = box
    n = n or int(rng.randint(80, 400))
    t = rng.uniform(0, 1, n)
    torso = t > 0.45
    pts = np.zeros((n, 3), dtype=np.float32)
    pts[:, 2] = z + t * h
    radius = np.where(torso, 0.5, 0.3)
    ang = rng.uniform(-np.pi, np.pi, n)
    rad = rng.uniform(0, 1, n) ** 0.5 * radius
    pts[:, 0] = x + np.cos(ang) * rad * w / 2 * 1.6
    pts[:, 1] = y + np.sin(ang) * rad * l / 2 * 1.6
    # camera sees only the front: keep points facing the sensor + noise
    pts[:, :2] += rng.normal(0, 0.02, (n, 2))
    return pts


def _scene_background(rng, n=15000):
    pts = np.zeros((n, 3), dtype=np.float32)
    n_floor = n // 2
    pts[:n_floor, 0] = rng.uniform(0.0, 6.4, n_floor)
    pts[:n_floor, 1] = rng.uniform(-2.56, 2.56, n_floor)
    pts[:n_floor, 2] = rng.normal(-1.45, 0.03, n_floor)
    n_wall = n - n_floor
    wall_x = rng.uniform(5.5, 6.4)
    pts[n_floor:, 0] = rng.normal(wall_x, 0.05, n_wall)
    pts[n_floor:, 1] = rng.uniform(-2.56, 2.56, n_wall)
    pts[n_floor:, 2] = rng.uniform(-1.45, 1.2, n_wall)
    return pts


def make_scene(rng, max_peds: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (points [N,3] lidar, gt_boxes_lidar [K,7])."""
    n_ped = rng.randint(1, max_peds + 1)
    boxes = []
    for _ in range(n_ped):
        for _try in range(20):
            box = np.array([
                rng.uniform(0.8, 5.8), rng.uniform(-2.2, 2.2), -1.45,
                rng.uniform(0.5, 0.7), rng.uniform(0.6, 1.0),
                rng.uniform(1.5, 1.9), rng.uniform(-np.pi, np.pi)],
                dtype=np.float32)
            if not boxes:
                break
            bv = np.array(boxes)[:, [0, 1]]
            if np.all(np.linalg.norm(bv - box[:2], axis=1) > 1.2):
                break
        boxes.append(box)
    gt = np.array(boxes, dtype=np.float32)
    pts = [_scene_background(rng)]
    for b in gt:
        pts.append(_pedestrian_points(rng, b))
    return np.concatenate(pts, axis=0).astype(np.float32), gt


def _write_kitti_label(path, gt_boxes_lidar):
    """Write lidar boxes as KITTI-format camera-frame labels."""
    cam = nb.box_lidar_to_camera(gt_boxes_lidar, RECT, VELO2CAM)
    lines = []
    for b in cam:
        x, y, z, l, h, w, ry = b
        # kitti file order: h w l, camera loc at box BOTTOM center (y down):
        # our lidar->camera conversion maps z-bottom to y via -z, so the
        # camera y already refers to the bottom in this synthetic frame.
        alpha = -np.arctan2(-b[0], b[2]) + ry
        lines.append(
            f"Pedestrian 0.00 0 {alpha:.2f} 300.00 150.00 400.00 350.00 "
            f"{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {ry:.2f}")
    pathlib.Path(path).write_text("\n".join(lines) + "\n" if lines else "")


def _write_calib(path):
    p = " ".join(["0"] * 12)
    pr = " ".join(str(v) for v in np.eye(3, 4).reshape(-1))
    r0 = " ".join(str(v) for v in np.eye(3).reshape(-1))
    v2c = " ".join(str(v) for v in VELO2CAM[:3].reshape(-1))
    imu = " ".join(["0"] * 12)
    pathlib.Path(path).write_text(
        f"P0: {pr}\nP1: {pr}\nP2: {pr}\nP3: {pr}\nR0_rect: {r0}\n"
        f"Tr_velo_to_cam: {v2c}\nTr_imu_to_velo: {imu}\n")


def generate_dataset(root: str, num_train: int = 32, num_test: int = 8,
                     seed: int = 0, max_peds: int = 3) -> str:
    """Create a full reference-format dataset under ``root``. Returns root."""
    rng = np.random.RandomState(seed)
    rootp = pathlib.Path(root)
    for sub, count, training in (("training", num_train, True),
                                 ("testing", num_test, False)):
        for d in ("velodyne", "label_2", "calib"):
            (rootp / sub / d).mkdir(parents=True, exist_ok=True)
        for i in range(count):
            sid = "%06d" % i
            points, gt = make_scene(rng, max_peds)
            with open(rootp / sub / "velodyne" / f"{sid}.pkl", "wb") as f:
                pickle.dump(points, f, 2)
            _write_kitti_label(rootp / sub / "label_2" / f"{sid}.txt", gt)
            _write_calib(rootp / sub / "calib" / f"{sid}.txt")

    ki.create_info_file(root, list(range(num_train)), training=True,
                        filename="kitti_infos_train.pkl")
    # eval infos point at the testing split
    infos_val = ki.get_image_infos(root, list(range(num_test)), training=False)
    ki.calculate_num_points_in_gt(root, infos_val)
    with open(rootp / "kitti_infos_val.pkl", "wb") as f:
        pickle.dump(infos_val, f, 2)
    ki.create_groundtruth_database(root, used_classes=["Pedestrian"])
    return root
