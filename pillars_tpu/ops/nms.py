"""Greedy standup-box NMS inside the jitted graph.

Replaces the reference's numba-CUDA bitmask kernel + serial mask reduction
(reference libraries/eval_helper_functions.py:463-547, nms_kernel/
nms_postprocess). At nms_pre_max_size = 100 boxes the full O(K^2) IoU matrix
is a single [100, 100] VPU tile — a masked greedy sweep over it is far below
the cost of one RPN conv layer, and it keeps the whole postprocess on device
(the reference pays a device->host copy plus a CUDA launch per cloud here).

QUIRK PRESERVED: the reference's iou_device uses the +1 PIXEL CONVENTION on
METRIC boxes (width = right - left + 1, eval_helper_functions.py:553-561) —
a Faster-RCNN carry-over that inflates IoUs of sub-meter pedestrian boxes.
Suppression behavior depends on it, so we replicate it exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pixel_iou_matrix(boxes: jax.Array) -> jax.Array:
    """[K, 4] standup boxes -> [K, K] IoU with the reference's +1 convention
    (reference eval_helper_functions.py:553-561, iou_device)."""
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x1 - x0 + 1.0) * (y1 - y0 + 1.0)
    left = jnp.maximum(x0[:, None], x0[None, :])
    right = jnp.minimum(x1[:, None], x1[None, :])
    top = jnp.maximum(y0[:, None], y0[None, :])
    bottom = jnp.minimum(y1[:, None], y1[None, :])
    width = jnp.maximum(right - left + 1.0, 0.0)
    height = jnp.maximum(bottom - top + 1.0, 0.0)
    inter = width * height
    return inter / (area[:, None] + area[None, :] - inter)


def nms_standup(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
                iou_threshold: float, post_max_size: int,
                use_pallas: bool = False):
    """Greedy NMS over [K, 4] standup boxes.

    Boxes are processed in descending score order (the reference sorts before
    its kernel, eval_helper_functions.py:508-512); a box is kept iff no
    higher-scored KEPT box overlaps it with iou > threshold (strict, like the
    CUDA kernel's ``iou > nms_overlap_thresh``).

    Returns (keep_indices [post_max], keep_valid [post_max]) where
    keep_indices index into the INPUT arrays.
    """
    k = boxes.shape[0]
    neg = jnp.asarray(-jnp.inf, dtype=scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg), stable=True)[::-1]
    boxes_s = boxes[order]
    valid_s = valid[order]

    if use_pallas:
        from pillars_tpu.ops.nms_pallas import nms_keep_mask_pallas

        kept = nms_keep_mask_pallas(boxes_s, valid_s, iou_threshold)
    else:
        iou = _pixel_iou_matrix(boxes_s)
        overlap = (iou > iou_threshold) & valid_s[:, None] & valid_s[None, :]

        def body(i, kept):
            # suppressed if any earlier kept box overlaps it
            suppressed = jnp.any(overlap[:, i] & kept & (jnp.arange(k) < i))
            return kept.at[i].set(valid_s[i] & ~suppressed)

        kept = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))

    # stable-compact the kept boxes (they are already score-ordered) and trim
    kept_rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    slot = jnp.where(kept, kept_rank, post_max_size)
    out_idx = jnp.zeros((post_max_size,), dtype=jnp.int32)
    out_idx = out_idx.at[slot].set(order.astype(jnp.int32), mode="drop")
    n_kept = jnp.minimum(jnp.sum(kept.astype(jnp.int32)), post_max_size)
    out_valid = jnp.arange(post_max_size) < n_kept
    return out_idx, out_valid
