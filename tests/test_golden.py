"""Golden-file regression tests: a fixed cloud through seeded params must
keep producing the same detections (decode-chain regressions are the
hardest bugs to notice — SURVEY §7 hard part #1).

The golden file is generated on first run (committed to the repo); any
numerical drift in voxelizer/PFN/RPN/postprocess breaks these tests loudly.
Regenerate deliberately with REGEN_GOLDEN=1 after an intentional change.
"""

import os
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector

GOLDEN = pathlib.Path(__file__).parent / "golden" / "inference_v1.npz"


def build():
    cfg = Config.default()
    cfg = cfg.override("model.voxel.max_voxels", 2048)
    cfg = cfg.override("model.voxel.max_points", 8192)
    det = PillarsDetector(cfg)
    variables = det.init(jax.random.PRNGKey(42), batch_size=1)
    rng = np.random.RandomState(7)
    pts = np.zeros((1, 8192, 3), np.float32)
    n = 4000
    pts[0, :n, 0] = rng.uniform(0.2, 6.2, n)
    pts[0, :n, 1] = rng.uniform(-2.4, 2.4, n)
    pts[0, :n, 2] = rng.uniform(-2.5, 0.5, n)
    # a dense pedestrian-like blob to give the net structure
    pts[0, :300, 0] = rng.normal(3.0, 0.2, 300)
    pts[0, :300, 1] = rng.normal(0.0, 0.15, 300)
    pts[0, :300, 2] = rng.uniform(-1.45, 0.3, 300)
    eye = jnp.eye(4)[None]
    out = det.make_inference_fn()(variables, jnp.array(pts),
                                  jnp.array([n], jnp.int32), eye, eye)
    return out


class TestGoldenInference:
    def test_matches_golden(self):
        out = build()
        got = {
            "boxes": np.asarray(out.boxes_lidar[0], np.float32),
            "scores": np.asarray(out.scores[0], np.float32),
            "valid": np.asarray(out.valid[0]),
        }
        if not GOLDEN.exists() or os.environ.get("REGEN_GOLDEN"):
            GOLDEN.parent.mkdir(parents=True, exist_ok=True)
            np.savez(GOLDEN, **got)
            pytest.skip("golden file (re)generated")
        ref = np.load(GOLDEN)
        np.testing.assert_array_equal(got["valid"], ref["valid"])
        np.testing.assert_allclose(got["scores"], ref["scores"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got["boxes"], ref["boxes"],
                                   rtol=1e-3, atol=1e-4)
