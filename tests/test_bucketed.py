"""Bucketed static-shape inference dispatch (pillars_tpu/infer.py).

The load-bearing claim: a cloud voxelizes IDENTICALLY in every bucket
that holds it, so bucket dispatch is a pure compile-time/latency
optimization with zero numeric effect. Pinned here by running the same
cloud through every rung of a ladder and demanding bit-equal outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.infer import BucketedInference, default_bucket_ladder
from pillars_tpu.models.detector import PillarsDetector


def small_config():
    cfg = Config.default()
    cfg = cfg.override("model.voxel.max_voxels", 2048)
    cfg = cfg.override("model.voxel.max_points", 4096)
    return cfg


CFG = small_config()


@pytest.fixture(scope="module")
def variables():
    det = PillarsDetector(CFG)
    return det.init(jax.random.PRNGKey(0), batch_size=1)


def make_cloud(rng, n, width):
    pts = np.zeros((1, width, 3), np.float32)
    pts[0, :n, 0] = rng.uniform(0.2, 6.2, n)
    pts[0, :n, 1] = rng.uniform(-2.4, 2.4, n)
    pts[0, :n, 2] = rng.uniform(-2.5, 0.5, n)
    return pts


class TestLadder:
    def test_default_ladder_halves_to_floor(self):
        assert default_bucket_ladder(131072) == (32768, 65536, 131072)
        assert default_bucket_ladder(4096) == (4096,)
        assert default_bucket_ladder(32768, levels=4, min_bucket=4096) == \
            (4096, 8192, 16384, 32768)

    def test_select_bucket(self):
        bi = BucketedInference(CFG, buckets=[1024, 2048, 4096])
        assert bi.select_bucket(0) == 1024
        assert bi.select_bucket(1024) == 1024
        assert bi.select_bucket(1025) == 2048
        assert bi.select_bucket(4096) == 4096
        # oversize clouds fall back to the top bucket (truncation,
        # matching the fixed single-graph path)
        assert bi.select_bucket(999999) == 4096

    def test_rejects_bad_buckets(self):
        with pytest.raises(ValueError):
            BucketedInference(CFG, buckets=[])
        with pytest.raises(ValueError):
            BucketedInference(CFG, buckets=[0, 1024])

    def test_parse_bucket_arg_validation(self):
        """Malformed CLI specs exit with a usage message (not an int()
        traceback); rungs above max_points clamp with a warning — a wider
        bucket would compile an unwarmed graph mid-eval (ADVICE r3)."""
        from pillars_tpu.infer import parse_bucket_arg

        assert parse_bucket_arg("", 4096) is None
        assert parse_bucket_arg(None, 4096) is None
        assert parse_bucket_arg("auto", 131072) == (32768, 65536, 131072)
        assert parse_bucket_arg("4096,1024", 4096) == (1024, 4096)
        with pytest.raises(SystemExit):
            parse_bucket_arg("32k", 4096)
        with pytest.raises(SystemExit):
            parse_bucket_arg("-5,100", 4096)
        assert parse_bucket_arg("1024,999999", 4096) == (1024, 4096)

    def test_evaluator_pads_batch_up_to_wide_bucket(self):
        """A CLI bucket wider than the dataset's padded width must pad UP
        in _device_put so dispatch keys an exact (warmed) rung instead of
        compiling a new graph mid-eval (ADVICE r3)."""
        from pillars_tpu.train.trainer import Evaluator

        ev = object.__new__(Evaluator)  # dataset-free: pin _device_put only
        ev._bucketed = BucketedInference(CFG, buckets=[4096])
        ev.mesh = None
        ev.cfg = CFG
        batch = {"points": np.zeros((2, 1000, 3), np.float32),
                 "num_points": np.array([500, 700], np.int32)}
        out = ev._device_put(batch)
        assert np.asarray(out["points"]).shape[1] == 4096
        # and slicing down still works
        wide = {"points": np.zeros((2, 8192, 3), np.float32),
                "num_points": np.array([10, 10], np.int32)}
        out = ev._device_put(wide)
        assert np.asarray(out["points"]).shape[1] == 4096


class TestEquality:
    """Same cloud, every rung: bit-equal predictions."""

    def test_bucket_invariance(self, variables, rng):
        n = 700
        pts = make_cloud(rng, n, 4096)
        num = np.asarray([n], np.int32)
        eye = jnp.eye(4, dtype=jnp.float32)[None]

        bi = BucketedInference(CFG, buckets=[1024, 2048, 4096])
        outs = []
        for b in bi.buckets:
            out = bi._fn(b)(variables, jnp.asarray(pts[:, :b]),
                            jnp.asarray(num), eye, eye)
            outs.append(jax.tree_util.tree_map(np.asarray, out))
        ref = outs[-1]
        for out in outs[:-1]:
            for a, b_ in zip(jax.tree_util.tree_leaves(ref),
                             jax.tree_util.tree_leaves(out)):
                np.testing.assert_array_equal(a, b_)

    def test_dispatch_matches_fixed_graph(self, variables, rng):
        """__call__ (slice/pad + bucket pick) == the fixed worst-case
        graph on the same cloud."""
        n = 700
        pts = make_cloud(rng, n, 4096)
        num = np.asarray([n], np.int32)
        eye = jnp.eye(4, dtype=jnp.float32)[None]

        det = PillarsDetector(CFG)
        fixed = det.make_inference_fn()(variables, jnp.asarray(pts),
                                        jnp.asarray(num), eye, eye)

        bi = BucketedInference(CFG, buckets=[1024, 4096])
        assert bi.select_bucket(n) == 1024
        out = bi(variables, pts, num, eye, eye)
        for a, b_ in zip(jax.tree_util.tree_leaves(
                             jax.tree_util.tree_map(np.asarray, fixed)),
                         jax.tree_util.tree_leaves(
                             jax.tree_util.tree_map(np.asarray, out))):
            np.testing.assert_array_equal(a, b_)

    def test_dispatch_pads_short_input(self, variables, rng):
        """A tight [1, n, 3] input (the streaming path) pads up to the
        bucket and matches the pre-padded call."""
        n = 50
        pts = make_cloud(rng, n, n)  # no padding at all
        num = np.asarray([n], np.int32)
        eye = jnp.eye(4, dtype=jnp.float32)[None]

        bi = BucketedInference(CFG, buckets=[1024, 4096])
        out_tight = bi(variables, pts, num, eye, eye)
        padded = np.zeros((1, 4096, 3), np.float32)
        padded[:, :n] = pts
        out_padded = bi(variables, padded, num, eye, eye)
        # same bucket (1024) both times -> bit-equal
        for a, b_ in zip(jax.tree_util.tree_leaves(
                             jax.tree_util.tree_map(np.asarray, out_tight)),
                         jax.tree_util.tree_leaves(
                             jax.tree_util.tree_map(np.asarray, out_padded))):
            np.testing.assert_array_equal(a, b_)


class TestEvaluatorIntegration:
    def test_bucketed_eval_matches_fixed(self, tmp_path):
        """Evaluator(buckets=...) slices batches to the bucket before
        device_put and must produce the same annos as the fixed graph."""
        from pillars_tpu.data import synthetic
        from pillars_tpu.train.trainer import Evaluator

        root = str(tmp_path / "synth")
        synthetic.generate_dataset(root, num_train=2, num_test=3, seed=5)
        cfg = CFG.override("eval_input.info_path",
                           f"{root}/kitti_infos_val.pkl")
        cfg = cfg.override("eval_input.dataset_root", root)
        cfg = cfg.override("eval_input.batch_size", 2)
        cfg = cfg.override("runtime.num_devices", 1)
        cfg = cfg.override("eval_input.num_workers", 0)
        det = PillarsDetector(cfg)
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)

        dt_fixed, gt = Evaluator(cfg, det).run(variables, progress=False)
        ev = Evaluator(cfg, det, buckets=[1024, 4096])
        dt_bucketed, _ = ev.run(variables, progress=False)

        assert len(dt_fixed) == len(dt_bucketed) == len(gt)
        for a, b in zip(dt_fixed, dt_bucketed):
            assert list(a["name"]) == list(b["name"])
            np.testing.assert_allclose(a["score"], b["score"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(a["location"], b["location"],
                                       rtol=1e-5, atol=1e-5)


class TestStreamIntegration:
    def test_run_stream_with_buckets(self, variables):
        from pillars_tpu.data.stream import run_stream
        det = PillarsDetector(CFG)
        stats = run_stream(CFG, det, variables, hz=60.0, duration_s=0.5,
                           source="synthetic", window=2,
                           buckets=[1024, 4096])
        assert stats["frames_processed"] >= 1
