"""CLI surface tests: the full synth-data -> create-data -> train ->
evaluate -> visualize loop through pillars_tpu.cli.main on tiny configs."""

import contextlib
import io
import os

import numpy as np
import pytest

from pillars_tpu import cli


def run_cli(args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(args)
    return buf.getvalue()


TINY = ["model.voxel.max_points=4096", "model.voxel.max_voxels=512",
        "model.target.max_gt_boxes=8"]


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = str(tmp_path_factory.mktemp("cli_ds"))
    out = run_cli(["synth-data", "--root", r, "--num-train", "4",
                   "--num-test", "2"])
    assert "synthetic dataset" in out
    return r


class TestCLI:
    def test_create_data_regenerates_infos(self, root):
        out = run_cli(["create-data", "--root", root, "--num-train", "4",
                       "--num-test", "2"])
        assert "info file" in out and "gt database" in out
        assert os.path.exists(f"{root}/kitti_infos_train.pkl")

    def test_train_then_evaluate_checkpoint(self, root, tmp_path):
        out_dir = str(tmp_path / "out")
        out = run_cli([
            "train", "--epochs", "1",
            "--set", *TINY,
            f"train_input.info_path={root}/kitti_infos_train.pkl",
            f"train_input.dataset_root={root}",
            f"train_input.sampler.info_path={root}/kitti_dbinfos_train.pkl",
            "train_input.batch_size=2", "train_input.num_workers=1",
            f"eval_input.info_path={root}/kitti_infos_val.pkl",
            f"eval_input.dataset_root={root}", "eval_input.batch_size=2",
            "runtime.num_devices=1",
            f"out_dir={out_dir}"])
        assert "best eval score" in out
        ckpt = f"{out_dir}/model_1/checkpoints/weights_temp.pkl"
        assert os.path.exists(ckpt)

        out = run_cli([
            "evaluate", "--checkpoint", ckpt,
            "--set", *TINY,
            f"eval_input.info_path={root}/kitti_infos_val.pkl",
            f"eval_input.dataset_root={root}", "eval_input.batch_size=2",
            "runtime.num_devices=1"])
        assert "aggregate score" in out
        assert "bev  AP" in out

    def test_evaluate_coco(self, root):
        out = run_cli([
            "evaluate", "--coco", "--max-samples", "2",
            "--set", *TINY,
            f"eval_input.info_path={root}/kitti_infos_val.pkl",
            f"eval_input.dataset_root={root}", "eval_input.batch_size=2",
            "runtime.num_devices=1"])
        assert "coco AP@" in out
        assert "aggregate score" not in out

    def test_evaluate_no_annos_mode(self, root, tmp_path):
        """no_annos_mode: eval a dataset WITHOUT labels — predictions are
        pickled for the visualizer, no AP is computed (reference
        README.md:247-260, train.py:876-880, load_data.py:1983/:2411)."""
        import pickle

        with open(f"{root}/kitti_infos_val.pkl", "rb") as f:
            infos = pickle.load(f)
        for info in infos:
            info.pop("annos", None)
        live = str(tmp_path / "kitti_infos_val_live.pkl")
        with open(live, "wb") as f:
            pickle.dump(infos, f, 2)

        save = str(tmp_path / "result.pkl")
        out = run_cli([
            "evaluate", "--save-predictions", save,
            "--set", *TINY,
            f"eval_input.info_path={root}/kitti_infos_val.pkl",
            "eval_input.no_annos_mode=true",
            f"eval_input.no_annos_info_path={live}",
            f"eval_input.dataset_root={root}", "eval_input.batch_size=2",
            "runtime.num_devices=1"])
        assert "no_annos_mode" in out and "saved to" in out
        assert "aggregate score" not in out
        with open(save, "rb") as f:
            dt_annos = pickle.load(f)
        assert len(dt_annos) == len(infos)
        assert all("score" in a and "location" in a for a in dt_annos)

    def test_capture_then_create_data(self, tmp_path):
        """capture --mode predefined (the reference few-annotation trick,
        realsense_make_dataset.py live_mode_off): every Nth synthetic cloud
        saved with the predefined box at a fixed rotation, then create-data
        builds infos over the captured set."""
        root = str(tmp_path / "cap_ds")
        out = run_cli(["capture", "--root", root, "--mode", "predefined",
                       "--source", "synthetic", "--rotation", "-3.14",
                       "--end", "12", "--every-nth", "4"])
        assert "saved 3 predefined clouds" in out
        labels = sorted(os.listdir(f"{root}/training/label_2"))
        assert len(labels) == 3
        with open(f"{root}/training/label_2/{labels[0]}") as f:
            line = f.read().strip()
        assert line.startswith("Pedestrian")

        out = run_cli(["create-data", "--root", root, "--num-train", "3",
                       "--num-test", "0"])
        assert os.path.exists(f"{root}/kitti_infos_train.pkl")

        out = run_cli(["capture", "--root", root, "--mode", "unannotated",
                       "--source", f"replay:{root}", "--max-frames", "2"])
        assert "saved 2 unannotated clouds" in out
        assert len(os.listdir(f"{root}/testing/velodyne")) == 2

    def test_visualize(self, root, tmp_path):
        out_dir = str(tmp_path / "viz")
        out = run_cli(["visualize", "--root", root,
                       "--info", "kitti_infos_val.pkl",
                       "--out", out_dir, "--max-frames", "2"])
        assert "rendered 2 frames" in out
        assert len(os.listdir(out_dir)) == 2

    def test_bad_override_fails_loudly(self, root):
        with pytest.raises(KeyError):
            run_cli(["evaluate", "--set", "model.nope=1"])

    def test_boolean_overrides_parse_yaml_scalars(self):
        """--set key=false must DISABLE the flag — the lowercase YAML
        spelling must not fall through as a truthy string — and a string
        landing on a bool field fails loudly instead of enabling it."""
        from pillars_tpu.config import Config

        cfg = Config.default()
        assert cfg.overrides(["model.rpn.remat=false"]).model.rpn.remat \
            is False
        assert cfg.overrides(["model.rpn.remat=true"]).model.rpn.remat \
            is True
        assert cfg.overrides(
            ["train.load_weights=null"]).train.load_weights is None
        with pytest.raises(ValueError):
            cfg.override("model.rpn.remat", "yes")

    def test_runtime_xla_flags_appended_once(self, monkeypatch):
        """runtime.xla_flags lands in $XLA_FLAGS (deduplicated) so compiler
        knobs ship with the config; existing flags are preserved."""
        monkeypatch.setenv("XLA_FLAGS", "--xla_existing=1")
        cli._apply_xla_flags("--xla_tpu_enable_latency_hiding_scheduler=true")
        cli._apply_xla_flags("--xla_tpu_enable_latency_hiding_scheduler=true "
                             "--xla_existing=1")
        assert os.environ["XLA_FLAGS"] == (
            "--xla_existing=1 --xla_tpu_enable_latency_hiding_scheduler=true")
