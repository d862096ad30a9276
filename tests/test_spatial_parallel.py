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

    def test_sharded_train_step_matches_replicated(self, rng):
        """A full TRAIN step (voxelize -> targets -> forward -> loss ->
        backward -> optimizer) under the spatial mesh must reproduce the
        replicated step: loss metrics and the GRADIENTS agree. Heads and
        canvas shard along BEV y (detector.py:127-133); the [B, A] loss /
        target tensors follow via XLA's partitioner (anchor order is
        (y, x, T)-major, parallel/spatial.py::shard_anchors_flat).

        Post-AdamW params are deliberately NOT compared element-exact:
        Adam's first update is ~lr*sign(g), so reduction-order noise on a
        near-zero gradient component legitimately flips it by 2*lr."""
        from pillars_tpu.train.loop import create_train_state, make_train_step

        cfg = Config.default()
        cfg = cfg.override("model.voxel.max_points", 8192)
        pts, num = _cloud(rng, cfg)
        g = np.zeros((1, 4, 7), np.float32)
        g[0, :, :3] = [[3.0, 0.5, -1.0], [1.5, -1.0, -1.2],
                       [5.0, 1.5, -0.8], [2.5, 0.0, -1.1]]
        g[0, :, 3:6] = [0.6, 0.8, 1.7]
        g[0, :, 6] = [0.3, -1.1, 2.0, 0.0]
        batch = {
            "points": pts, "num_points": num,
            "gt_boxes": jnp.asarray(g),
            "gt_classes": jnp.ones((1, 4), jnp.int32),
            "gt_valid": jnp.ones((1, 4), bool),
        }
        thr = cfg.train_input.anchor_area_threshold

        def build(config):
            det = PillarsDetector(config)
            state, tx = create_train_state(det, jax.random.PRNGKey(0),
                                           batch_size=1)
            return det, state, tx

        def grads_of(det, state):
            def loss_fn(params):
                vox = det.voxelize_batch(batch["points"],
                                         batch["num_points"])
                amask = det.anchors_mask_batch(vox.coords, vox.pillar_mask,
                                               thr)
                tgt = det.assign_targets(batch["gt_boxes"],
                                         batch["gt_classes"],
                                         batch["gt_valid"], amask)
                preds, _ = det.network.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    vox, True, mutable=["batch_stats"])
                return det.loss(preds, tgt.labels, tgt.bbox_targets).loss
            return jax.jit(jax.grad(loss_fn))(state.params)

        det, state, tx = build(cfg)
        want_g = grads_of(det, state)
        _, want_m = make_train_step(det, tx, donate=False)(state, batch)

        scfg = cfg.override("runtime.spatial_axis", "spatial")
        with spatial_mesh(8):
            sdet, sstate, stx = build(scfg)
            got_g = grads_of(sdet, sstate)
            got_state, got_m = make_train_step(sdet, stx, donate=False)(
                sstate, batch)
            # the step actually ran sharded and produced finite state
            assert int(got_state.step) == 1

        np.testing.assert_allclose(np.asarray(got_m.loss),
                                   np.asarray(want_m.loss),
                                   rtol=1e-5, atol=1e-6)
        for name in ("loc_loss_reduced", "cls_loss_reduced",
                     "dir_loss_reduced"):
            np.testing.assert_allclose(
                np.asarray(getattr(got_m, name)),
                np.asarray(getattr(want_m, name)), rtol=1e-5, atol=1e-7,
                err_msg=name)
        assert int(got_m.num_positives) == int(want_m.num_positives) > 0

        # Per-leaf relative L2, not element-wise: GSPMD legitimately
        # re-partitions the PFN/BN reductions (the canvas constraint
        # propagates backward), so f32 summation order differs and
        # cancellation-heavy leaves (BN bias) carry ~3e-3 relative noise.
        # A real sharding bug (broken halo exchange, wrong anchor split)
        # produces O(1) relative error, far above this bound.
        flat_w = jax.tree_util.tree_flatten_with_path(want_g)[0]
        flat_g = jax.tree_util.tree_leaves(got_g)
        assert len(flat_w) == len(flat_g)
        for (path, w), gl in zip(flat_w, flat_g):
            w = np.asarray(w, np.float64)
            gl = np.asarray(gl, np.float64)
            rel = (np.linalg.norm(gl - w)
                   / max(np.linalg.norm(w), 1e-12))
            assert rel < 1e-2, (jax.tree_util.keystr(path), rel)
