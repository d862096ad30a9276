"""BEV-grid spatial model parallelism (parallel/spatial.py): the sharded
forward must equal the replicated forward bit-for-bit-ish on a
host-simulated 8-device mesh, and the outputs must actually be sharded."""

import numpy as np
import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.parallel.spatial import spatial_mesh


def _cloud(rng, cfg, n=4000):
    pts = np.zeros((1, cfg.model.voxel.max_points, 3), np.float32)
    pts[0, :n, 0] = rng.uniform(0, 6.4, n)
    pts[0, :n, 1] = rng.uniform(-2.5, 2.5, n)
    pts[0, :n, 2] = rng.uniform(-2.9, 2.9, n)
    return jnp.asarray(pts), jnp.asarray([n], jnp.int32)


class TestSpatialParallel:
    def test_sharded_forward_matches_replicated(self, rng):
        cfg = Config.default()
        cfg = cfg.override("model.voxel.max_points", 8192)
        base = PillarsDetector(cfg)
        variables = base.init(jax.random.PRNGKey(0), batch_size=1)
        pts, num = _cloud(rng, cfg)

        vox = jax.jit(base.voxelize_batch)(pts, num)
        want = jax.jit(lambda v: base.apply(variables, v, train=False))(vox)

        scfg = cfg.override("runtime.spatial_axis", "spatial")
        sdet = PillarsDetector(scfg)
        mesh = spatial_mesh(8)
        assert mesh.devices.size == 8
        with mesh:
            got = jax.jit(
                lambda v: sdet.apply(variables, v, train=False))(vox)
            # head tensors really shard along BEV y (H of NHWC)
            spec = tuple(got["box_preds"].sharding.spec)
            # PartitionSpec drops trailing Nones
            assert spec[:2] == (None, "spatial"), spec

        for k in want:
            np.testing.assert_allclose(np.asarray(want[k]),
                                       np.asarray(got[k]),
                                       rtol=1e-3, atol=1e-4)

    def test_sharded_postprocess_end_to_end(self, rng):
        """Full inference (net + mask + postprocess) under the spatial mesh
        stays correct — top_k/NMS gather across shards via XLA collectives."""
        cfg = Config.default()
        cfg = cfg.override("model.voxel.max_points", 8192)
        base = PillarsDetector(cfg)
        variables = base.init(jax.random.PRNGKey(0), batch_size=1)
        pts, num = _cloud(rng, cfg)
        thr = cfg.eval_input.anchor_area_threshold
        eye = jnp.eye(4, dtype=jnp.float32)[None]

        def infer(det):
            def fn(p, n):
                v = det.voxelize_batch(p, n)
                amask = det.anchors_mask_batch(v.coords, v.pillar_mask, thr)
                preds = det.apply(variables, v, train=False)
                out = det.postprocess(preds, amask, eye, eye)
                return out.boxes_lidar, out.scores, out.valid
            return fn

        want = jax.jit(infer(base))(pts, num)

        scfg = cfg.override("runtime.spatial_axis", "spatial")
        sdet = PillarsDetector(scfg)
        with spatial_mesh(8):
            got = jax.jit(infer(sdet))(pts, num)

        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=1e-3, atol=1e-4)
