"""The pointwise (bandwidth-optimal) PFN must match the dense-layout PFN
exactly: same parameters, same outputs, same BN statistics updates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector


def make_cfg(pointwise):
    cfg = Config.default()
    cfg = cfg.override("model.voxel.max_voxels", 2048)
    cfg = cfg.override("model.voxel.max_points", 8192)
    cfg = cfg.override("model.pfn.pointwise", pointwise)
    return cfg


@pytest.fixture(scope="module")
def both():
    det_pw = PillarsDetector(make_cfg(True))
    det_dn = PillarsDetector(make_cfg(False))
    variables = det_pw.init(jax.random.PRNGKey(0), batch_size=2)
    # same param tree must be valid for both paths
    return det_pw, det_dn, variables


def cloud(rng, n=3000, crowded=False):
    pts = np.zeros((2, 8192, 3), np.float32)
    spread = 0.15 if crowded else 6.0
    pts[:, :n, 0] = rng.uniform(0.2, 0.2 + spread, (2, n))
    pts[:, :n, 1] = rng.uniform(-2.4, 2.4, (2, n))
    pts[:, :n, 2] = rng.uniform(-2.5, 0.5, (2, n))
    return jnp.array(pts), jnp.array([n, n - 500], jnp.int32)


class TestEquivalence:
    def test_eval_forward_identical(self, both, rng):
        det_pw, det_dn, variables = both
        pts, num = cloud(rng)
        preds_pw = det_pw.apply(variables, det_pw.voxelize_batch(pts, num))
        preds_dn = det_dn.apply(variables, det_dn.voxelize_batch(pts, num))
        # the pointwise path's segmented-scan cluster mean is exact to
        # ~2e-7 (verified against float64); the dense path's per-pillar f32
        # sum rounds at ~1e-6, which the conv stack amplifies to ~2e-4 on
        # raw head logits. Tolerance covers that accumulation-order gap,
        # not semantics.
        np.testing.assert_allclose(np.asarray(preds_pw["box_preds"]),
                                   np.asarray(preds_dn["box_preds"]),
                                   rtol=1e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(preds_pw["cls_preds"]),
                                   np.asarray(preds_dn["cls_preds"]),
                                   rtol=1e-3, atol=5e-4)

    def test_eval_forward_identical_with_full_pillars(self, both, rng):
        """Crowded cloud -> pillars hit the 50-point cap, exercising the
        zero-row-contribution edge (full pillars must NOT see relu(bn(0)))."""
        det_pw, det_dn, variables = both
        pts, num = cloud(rng, n=6000, crowded=True)
        vox = det_pw.voxelize_batch(pts, num)
        assert int(jnp.max(vox.num_points)) == 50  # cap actually reached
        preds_pw = det_pw.apply(variables, vox)
        preds_dn = det_dn.apply(variables, det_dn.voxelize_batch(pts, num))
        # fp accumulation order differs (segment scatter-add vs per-pillar
        # sum); tolerance covers that, not semantics
        np.testing.assert_allclose(np.asarray(preds_pw["box_preds"]),
                                   np.asarray(preds_dn["box_preds"]),
                                   rtol=2e-2, atol=1e-4)

    def test_train_stats_identical(self, both, rng):
        det_pw, det_dn, variables = both
        pts, num = cloud(rng)
        _, st_pw = det_pw.apply(variables, det_pw.voxelize_batch(pts, num),
                                train=True, mutable=["batch_stats"])
        _, st_dn = det_dn.apply(variables, det_dn.voxelize_batch(pts, num),
                                train=True, mutable=["batch_stats"])
        m_pw = np.asarray(st_pw["batch_stats"]["pfn"]["bn"]["mean"])
        m_dn = np.asarray(st_dn["batch_stats"]["pfn"]["bn"]["mean"])
        np.testing.assert_allclose(m_pw, m_dn, rtol=1e-4, atol=1e-6)
        v_pw = np.asarray(st_pw["batch_stats"]["pfn"]["bn"]["var"])
        v_dn = np.asarray(st_dn["batch_stats"]["pfn"]["bn"]["var"])
        np.testing.assert_allclose(v_pw, v_dn, rtol=1e-3, atol=1e-6)

    def test_grads_flow_pointwise(self, both, rng):
        det_pw, _, variables = both
        pts, num = cloud(rng)
        vox = det_pw.voxelize_batch(pts, num)

        def loss_fn(params):
            preds, _ = det_pw.network.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                vox, True, mutable=["batch_stats"])
            return jnp.sum(preds["box_preds"] ** 2)

        grads = jax.grad(loss_fn)(variables["params"])
        g = np.asarray(grads["pfn"]["dense"]["kernel"])
        assert np.all(np.isfinite(g))
        assert np.abs(g).max() > 0
