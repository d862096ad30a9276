"""Composed data x spatial sharding on the FULL train step.

The 2-D mesh shards the batch over 'data' and the BEV canvas / RPN
activations / head tensors over 'spatial' (parallel/spatial.py) inside ONE
jitted train step (voxelize + targets + fwd/bwd + adamw). XLA GSPMD inserts
the conv halo exchanges and the gradient reductions; the test pins the
result against the unsharded step numerically on the host-simulated
8-device mesh (tests/conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.parallel import make_mesh_2d, shard_batch
from pillars_tpu.train.loop import create_train_state, make_train_step


def _small_cfg():
    cfg = Config.default()
    cfg = cfg.override("model.voxel.max_voxels", 1024)
    cfg = cfg.override("model.voxel.max_points", 4096)
    cfg = cfg.override("model.target.max_gt_boxes", 8)
    return cfg


def _batch(rng, cfg, batch_size):
    n = 500
    maxpts = cfg.model.voxel.max_points
    g = cfg.model.target.max_gt_boxes
    points = np.zeros((batch_size, maxpts, 3), np.float32)
    points[:, :n, 0] = rng.uniform(0, 6.4, (batch_size, n))
    points[:, :n, 1] = rng.uniform(-2.5, 2.5, (batch_size, n))
    points[:, :n, 2] = rng.uniform(-2.9, 0.5, (batch_size, n))
    gt = np.zeros((batch_size, g, 7), np.float32)
    gt[..., 3:6] = 1.0
    gt[:, 0] = [3.0, 0.0, -1.5, 0.6, 0.8, 1.73, 0.3]
    return dict(
        points=points,
        num_points=np.full((batch_size,), n, np.int32),
        gt_boxes=gt,
        gt_classes=np.ones((batch_size, g), np.int32),
        gt_valid=np.pad(np.ones((batch_size, 1), bool),
                        ((0, 0), (0, g - 1))),
    )


class TestSpatialTrain:
    def test_2d_mesh_step_matches_unsharded(self, rng):
        cfg = _small_cfg()
        B = 4

        base = PillarsDetector(cfg)
        state0, tx = create_train_state(base, jax.random.PRNGKey(0), B)
        step = make_train_step(base, tx, donate=False)
        batch = _batch(rng, cfg, B)
        want_state, want_m = step(state0, batch)

        scfg = cfg.override("runtime.spatial_axis", "spatial")
        sdet = PillarsDetector(scfg)
        mesh = make_mesh_2d(2, 4)
        with mesh:  # init traces shard_canvas -> needs the ambient mesh
            # same rng -> identical params (spatial_axis changes sharding
            # annotations only, not the module tree)
            sstate0, stx = create_train_state(sdet, jax.random.PRNGKey(0), B)
            sstep = make_train_step(sdet, stx, donate=False)
            sbatch = shard_batch(batch, mesh)
            got_state, got_m = sstep(sstate0, sbatch)
            got_m = jax.device_get(got_m)

        np.testing.assert_allclose(float(got_m.loss), float(want_m.loss),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(got_m.loc_loss_reduced),
                                   float(want_m.loc_loss_reduced), rtol=1e-4)
        assert int(got_m.num_positives) == int(want_m.num_positives)

        # updated parameters agree across the whole tree (grads rode the
        # spatial partition + data all-reduce). AdamW's first step is
        # sign(grad)*lr, so a gradient element near zero can FLIP SIGN
        # under the partitioned reduction's different f32 summation order —
        # allow a <=1% per-leaf fraction of such flips, everything else
        # must match tightly.
        flat_w = jax.tree_util.tree_leaves(want_state.params)
        flat_g = jax.tree_util.tree_leaves(jax.device_get(got_state.params))
        assert len(flat_w) == len(flat_g)
        for w, g in zip(flat_w, flat_g):
            w = np.asarray(w)
            g = np.asarray(g)
            bad = np.abs(g - w) > 2e-5 + 2e-3 * np.abs(w)
            assert bad.mean() <= 0.01, (
                f"{bad.sum()}/{bad.size} param elements diverge "
                f"(max |diff| {np.abs(g - w).max():.2e})")

    def test_second_step_runs_sharded(self, rng):
        """Two consecutive sharded steps (state threads through with its
        shardings) — the smoke for an actual sharded training loop."""
        cfg = _small_cfg().override("runtime.spatial_axis", "spatial")
        det = PillarsDetector(cfg)
        B = 4
        mesh = make_mesh_2d(2, 4)
        with mesh:
            state, tx = create_train_state(det, jax.random.PRNGKey(1), B)
            step = make_train_step(det, tx, donate=False)
            batch = shard_batch(_batch(rng, cfg, B), mesh)
            state, m1 = step(state, batch)
            state, m2 = step(state, batch)
            m1, m2 = jax.device_get((m1, m2))
        assert np.isfinite(float(m1.loss)) and np.isfinite(float(m2.loss))
        assert float(m2.loss) != float(m1.loss)  # params actually moved
