"""Fused Pallas RPN blocks vs. the flax path (interpreter mode, inference)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.ops.rpn_pallas import fused_rpn_blocks


def small_cfg():
    cfg = Config.default()
    cfg = cfg.override("model.voxel.max_voxels", 512)
    cfg = cfg.override("model.voxel.max_points", 2048)
    return cfg


class TestFusedRPNBlocks:
    def test_matches_flax_blocks(self, rng):
        cfg = small_cfg()
        det = PillarsDetector(cfg)
        variables = det.init(jax.random.PRNGKey(3), batch_size=1)
        canvas = jnp.array(
            rng.randn(1, 64, 80, cfg.model.pfn.num_filters).astype(np.float32))
        # flax reference: run each block module in eval mode
        from pillars_tpu.models.rpn import _Block

        x = canvas
        want = []
        for i in range(3):
            blk = _Block(cfg.model.rpn.num_filters[i],
                         cfg.model.rpn.layer_nums[i],
                         cfg.model.rpn.layer_strides[i],
                         cfg.model.rpn.bn_momentum, cfg.model.rpn.bn_eps,
                         separable=True)
            x = blk.apply(
                {"params": variables["params"]["rpn"][f"block{i + 1}"],
                 "batch_stats": variables["batch_stats"]["rpn"][f"block{i + 1}"]},
                x, False)
            want.append(np.asarray(x))

        got = fused_rpn_blocks(canvas, variables, cfg.model.rpn,
                               interpret=True)
        for i in range(3):
            # tolerance covers conv-vs-9-MAC accumulation order only
            np.testing.assert_allclose(np.asarray(got[i]), want[i],
                                       rtol=5e-2, atol=2e-3)

    def test_shapes(self, rng):
        cfg = small_cfg()
        det = PillarsDetector(cfg)
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)
        canvas = jnp.zeros((1, 64, 80, 128))
        outs = fused_rpn_blocks(canvas, variables, cfg.model.rpn,
                                interpret=True)
        assert outs[0].shape == (1, 64, 80, 64)
        assert outs[1].shape == (1, 32, 40, 128)
        assert outs[2].shape == (1, 16, 20, 256)
