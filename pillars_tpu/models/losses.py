"""Detection losses — exact ports of the reference loss semantics.

- sigmoid focal classification loss (reference model/voxelnet.py:262-363)
- weighted smooth-L1 localization loss (reference model/voxelnet.py:366-453)
- softmax direction-classifier loss (reference model/voxelnet.py:180-233)
- per-anchor weight preparation, NormByNumPositives
  (reference model/voxelnet.py:461-512)
- total loss assembly (reference model/voxelnet.py:922-1049)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pillars_tpu.config import LossConfig
from pillars_tpu.geometry.boxes import add_sin_difference


def _sigmoid_cross_entropy_with_logits(logits, labels):
    """tf.nn.sigmoid_cross_entropy_with_logits formulation used by the
    reference (model/voxelnet.py:237-259, incl. the clip-by-value guard)."""
    loss = jnp.clip(logits, 0.0, 10000.0) - logits * labels
    return loss + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(cfg: LossConfig, logits, one_hot_targets, weights):
    """[B, A, C] logits/targets, [B, A] weights -> [B, A, C] focal loss.

    reference model/voxelnet.py:262-363."""
    alpha, gamma = cfg.focal_alpha, cfg.focal_gamma
    per_entry = _sigmoid_cross_entropy_with_logits(logits, one_hot_targets)
    probs = jax.nn.sigmoid(logits)
    p_t = one_hot_targets * probs + (1 - one_hot_targets) * (1 - probs)
    modulating = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    alpha_w = (one_hot_targets * alpha + (1 - one_hot_targets) * (1 - alpha)
               if alpha is not None else 1.0)
    return modulating * alpha_w * per_entry * weights[..., None]


def weighted_smooth_l1_loss(cfg: LossConfig, preds, targets, weights):
    """[B, A, 7] preds/targets, [B, A] weights -> [B, A, 7].

    reference model/voxelnet.py:366-453 (sigma=3, code_weights)."""
    sigma = cfg.smooth_l1_sigma
    code_w = jnp.asarray(cfg.code_weights, dtype=preds.dtype)
    diff = code_w.reshape(1, 1, -1) * (preds - targets)
    abs_diff = jnp.abs(diff)
    lt = (abs_diff <= 1.0 / (sigma**2)).astype(abs_diff.dtype)
    loss = (lt * 0.5 * jnp.power(abs_diff * sigma, 2)
            + (abs_diff - 0.5 / (sigma**2)) * (1.0 - lt))
    return loss * weights[..., None]


def softmax_direction_loss(logits, one_hot_targets, weights):
    """[B, A, 2] -> [B, A]. reference model/voxelnet.py:156-233."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    per_anchor = -jnp.sum(one_hot_targets * logprobs, axis=-1)
    return per_anchor * weights


def prepare_loss_weights(labels, cfg: LossConfig):
    """[B, A] labels -> (cls_weights, reg_weights, cared).

    reference model/voxelnet.py:461-512, NormByNumPositives."""
    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (negatives.astype(jnp.float32) * cfg.neg_class_weight
                   + positives.astype(jnp.float32) * cfg.pos_class_weight)
    reg_weights = positives.astype(jnp.float32)
    if cfg.loss_norm_type == "NormByNumPositives":
        pos_norm = jnp.sum(positives.astype(jnp.float32), axis=1, keepdims=True)
        pos_norm = jnp.clip(pos_norm, 1.0, 100000.0)
        reg_weights = reg_weights / pos_norm
        cls_weights = cls_weights / pos_norm
    return cls_weights, reg_weights, cared


def get_direction_target(anchors, reg_targets):
    """[B, A, 7] -> [B, A, 2] one-hot of (rot_gt > 0).

    reference model/voxelnet.py:38-46."""
    rot_gt = reg_targets[..., -1] + anchors[..., -1]
    dir_cls = (rot_gt > 0).astype(jnp.int32)
    return jax.nn.one_hot(dir_cls, 2, dtype=reg_targets.dtype)


class LossOutput(NamedTuple):
    loss: jax.Array
    loc_loss_reduced: jax.Array
    cls_loss_reduced: jax.Array
    dir_loss_reduced: jax.Array
    cls_pos_loss: jax.Array
    cls_neg_loss: jax.Array


def detection_loss(cfg: LossConfig, num_class: int, box_preds, cls_preds,
                   dir_preds, anchors, labels, reg_targets,
                   use_direction_classifier: bool = True) -> LossOutput:
    """Total detection loss for one batch.

    box_preds/cls_preds/dir_preds: [B, H, W, C_head] raw head outputs.
    anchors: [A, 7] (shared across batch). labels: [B, A] int32.
    reg_targets: [B, A, 7].

    reference model/voxelnet.py:922-1049 + train.yaml weights
    (loc 1.5 / cls 1.0 / dir 0.5)."""
    batch_size = labels.shape[0]
    # losses always in f32, independent of the network compute dtype
    box_preds = box_preds.astype(jnp.float32).reshape(batch_size, -1, 7)
    cls_preds = cls_preds.astype(jnp.float32).reshape(batch_size, -1, num_class)
    if dir_preds is not None:
        dir_preds = dir_preds.astype(jnp.float32)
    cls_weights, reg_weights, cared = prepare_loss_weights(labels, cfg)
    cls_targets = labels * cared.astype(labels.dtype)

    one_hot_targets = jax.nn.one_hot(cls_targets, num_class + 1,
                                     dtype=box_preds.dtype)[..., 1:]

    if cfg.encode_rad_error_by_sin:
        box_preds_sin, reg_targets_sin = add_sin_difference(box_preds, reg_targets)
    else:
        box_preds_sin, reg_targets_sin = box_preds, reg_targets

    loc_loss = weighted_smooth_l1_loss(cfg, box_preds_sin, reg_targets_sin,
                                       reg_weights)
    cls_loss = sigmoid_focal_loss(cfg, cls_preds, one_hot_targets, cls_weights)

    loc_loss_reduced = jnp.sum(loc_loss) / batch_size * cfg.localization_weight
    cls_loss_reduced = jnp.sum(cls_loss) / batch_size * cfg.classification_weight

    # debug-only pos/neg split (reference model/voxelnet.py:48-61)
    if num_class == 1:
        cls_flat = cls_loss.reshape(batch_size, -1)
        cls_pos = jnp.sum((labels > 0) * cls_flat) / batch_size
        cls_neg = jnp.sum((labels == 0) * cls_flat) / batch_size
    else:
        cls_pos = jnp.sum(cls_loss[..., 1:]) / batch_size
        cls_neg = jnp.sum(cls_loss[..., 0]) / batch_size

    loss = loc_loss_reduced + cls_loss_reduced

    dir_loss_reduced = jnp.zeros((), dtype=box_preds.dtype)
    if use_direction_classifier:
        anchors_b = jnp.broadcast_to(anchors[None], (batch_size,) + anchors.shape)
        dir_targets = get_direction_target(anchors_b, reg_targets)
        dir_logits = dir_preds.reshape(batch_size, -1, 2)
        weights = (labels > 0).astype(dir_logits.dtype)
        weights = weights / jnp.clip(
            jnp.sum(weights, axis=-1, keepdims=True), 1.0, 9999999.0)
        dir_loss = softmax_direction_loss(dir_logits, dir_targets, weights)
        dir_loss_reduced = (jnp.sum(dir_loss) / batch_size
                            * cfg.direction_weight)
        loss = loss + dir_loss_reduced

    return LossOutput(loss, loc_loss_reduced, cls_loss_reduced,
                      dir_loss_reduced, cls_pos, cls_neg)
