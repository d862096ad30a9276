"""Pallas NMS kernel vs. the lax formulation (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillars_tpu.ops.nms import _pixel_iou_matrix
from pillars_tpu.ops.nms_pallas import nms_keep_mask_pallas


def _lax_keep_mask(boxes_s, valid_s, thresh):
    k = boxes_s.shape[0]
    iou = _pixel_iou_matrix(boxes_s)
    overlap = (iou > thresh) & valid_s[:, None] & valid_s[None, :]

    def body(i, kept):
        suppressed = jnp.any(overlap[:, i] & kept & (jnp.arange(k) < i))
        return kept.at[i].set(valid_s[i] & ~suppressed)

    return jax.lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))


class TestPallasNMS:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_lax(self, seed):
        r = np.random.RandomState(seed)
        k = 128
        centers = r.uniform(0, 6, (k, 2)).astype(np.float32)
        sizes = r.uniform(0.3, 1.0, (k, 2)).astype(np.float32)
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)
        scores = r.uniform(0, 1, k).astype(np.float32)
        order = np.argsort(-scores)
        boxes_s = jnp.array(boxes[order])
        valid = np.ones(k, bool)
        valid[r.choice(k, 20, replace=False)] = False
        valid_s = jnp.array(valid[order])
        got = np.asarray(nms_keep_mask_pallas(boxes_s, valid_s, 0.5,
                                              interpret=True))
        want = np.asarray(_lax_keep_mask(boxes_s, valid_s, 0.5))
        np.testing.assert_array_equal(got, want)

    def test_all_invalid(self):
        boxes = jnp.zeros((64, 4))
        valid = jnp.zeros((64,), bool)
        got = np.asarray(nms_keep_mask_pallas(boxes, valid, 0.5,
                                              interpret=True))
        assert not got.any()
