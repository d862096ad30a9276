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


def _heads_to_lane_major(x, batch_size, fields):
    """[B, H, W, T*fields] head tensor -> [B, fields, A] with the ANCHOR
    axis minor (lane dim). LAYOUT NOTE: the naive [B, A, fields] layout
    tiles fields (7/3/2) onto 128 lanes, so every elementwise pass costs
    up to 18x its true HBM traffic — at KITTI scale (1.29M anchors) the
    loss chain measured 37 ms forward / ~3x that backward. Lane-major
    packs the 1.29M-anchor axis densely; the one transpose here replaces
    ~10 padded passes."""
    b = batch_size
    lt = x.reshape(b, -1, x.shape[-1] // fields, fields)   # [B, L, T, f]
    return jnp.transpose(lt, (0, 3, 1, 2)).reshape(b, fields, -1)


def detection_loss(cfg: LossConfig, num_class: int, box_preds, cls_preds,
                   dir_preds, anchors, labels, reg_targets,
                   use_direction_classifier: bool = True) -> LossOutput:
    """Total detection loss for one batch.

    box_preds/cls_preds/dir_preds: [B, H, W, C_head] raw head outputs.
    anchors: [A, 7] (shared across batch). labels: [B, A] int32.
    reg_targets: [B, A, 7].

    reference model/voxelnet.py:922-1049 + train.yaml weights
    (loc 1.5 / cls 1.0 / dir 0.5). Internally computed in a lane-major
    [B, fields, A] layout (see _heads_to_lane_major); semantics are
    identical — only the elementwise layout and summation order differ."""
    batch_size = labels.shape[0]
    # losses always in f32, independent of the network compute dtype
    box_preds = _heads_to_lane_major(
        box_preds.astype(jnp.float32), batch_size, 7)          # [B, 7, A]
    cls_preds = _heads_to_lane_major(
        cls_preds.astype(jnp.float32), batch_size, num_class)  # [B, C, A]
    if reg_targets.shape[-1] == 7:  # [B, A, 7] -> lane-major [B, 7, A]
        reg_targets = jnp.transpose(reg_targets, (0, 2, 1))
    # else: already [B, 7, A] (ops/targets.py TargetAssignment layout)

    cls_weights, reg_weights, cared = prepare_loss_weights(labels, cfg)
    cls_targets = labels * cared.astype(labels.dtype)

    one_hot_targets = jax.nn.one_hot(
        cls_targets, num_class + 1, axis=1,
        dtype=box_preds.dtype)[:, 1:, :]                       # [B, C, A]

    if cfg.encode_rad_error_by_sin:
        # sin(a - b) encoding on the rotation field (geometry
        # add_sin_difference, reference voxelnet.py:63-69) in lane-major
        rp = box_preds[:, 6:7, :]
        rt = reg_targets[:, 6:7, :]
        box_preds_sin = jnp.concatenate(
            [box_preds[:, :6, :], jnp.sin(rp) * jnp.cos(rt)], axis=1)
        reg_targets_sin = jnp.concatenate(
            [reg_targets[:, :6, :], jnp.cos(rp) * jnp.sin(rt)], axis=1)
    else:
        box_preds_sin, reg_targets_sin = box_preds, reg_targets

    # weighted smooth L1 (sigma=3, code_weights), fields on axis 1
    sigma = cfg.smooth_l1_sigma
    code_w = jnp.asarray(cfg.code_weights, jnp.float32).reshape(1, -1, 1)
    diff = code_w * (box_preds_sin - reg_targets_sin)
    abs_diff = jnp.abs(diff)
    lt_mask = (abs_diff <= 1.0 / (sigma**2)).astype(abs_diff.dtype)
    loc_loss = (lt_mask * 0.5 * jnp.power(abs_diff * sigma, 2)
                + (abs_diff - 0.5 / (sigma**2)) * (1.0 - lt_mask))
    loc_loss = loc_loss * reg_weights[:, None, :]

    # sigmoid focal loss, classes on axis 1
    alpha, gamma = cfg.focal_alpha, cfg.focal_gamma
    per_entry = _sigmoid_cross_entropy_with_logits(cls_preds, one_hot_targets)
    probs = jax.nn.sigmoid(cls_preds)
    p_t = (one_hot_targets * probs
           + (1 - one_hot_targets) * (1 - probs))
    modulating = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    alpha_w = (one_hot_targets * alpha + (1 - one_hot_targets) * (1 - alpha)
               if alpha is not None else 1.0)
    cls_loss = modulating * alpha_w * per_entry * cls_weights[:, None, :]

    loc_loss_reduced = jnp.sum(loc_loss) / batch_size * cfg.localization_weight
    cls_loss_reduced = jnp.sum(cls_loss) / batch_size * cfg.classification_weight

    # debug-only pos/neg split (reference model/voxelnet.py:48-61)
    if num_class == 1:
        cls_flat = cls_loss.reshape(batch_size, -1)
        cls_pos = jnp.sum((labels > 0) * cls_flat) / batch_size
        cls_neg = jnp.sum((labels == 0) * cls_flat) / batch_size
    else:
        cls_pos = jnp.sum(cls_loss[:, 1:, :]) / batch_size
        cls_neg = jnp.sum(cls_loss[:, 0, :]) / batch_size

    loss = loc_loss_reduced + cls_loss_reduced

    dir_loss_reduced = jnp.zeros((), dtype=box_preds.dtype)
    if use_direction_classifier:
        # direction target: (rot_gt > 0) one-hot (voxelnet.py:38-46)
        rot_gt = reg_targets[:, 6, :] + anchors[None, :, 6]    # [B, A]
        dir_cls = (rot_gt > 0).astype(jnp.int32)
        dir_targets = jax.nn.one_hot(dir_cls, 2, axis=1,
                                     dtype=jnp.float32)        # [B, 2, A]
        dir_logits = _heads_to_lane_major(
            dir_preds.astype(jnp.float32), batch_size, 2)      # [B, 2, A]
        weights = (labels > 0).astype(jnp.float32)
        weights = weights / jnp.clip(
            jnp.sum(weights, axis=-1, keepdims=True), 1.0, 9999999.0)
        logprobs = jax.nn.log_softmax(dir_logits, axis=1)
        dir_loss = -jnp.sum(dir_targets * logprobs, axis=1) * weights
        dir_loss_reduced = (jnp.sum(dir_loss) / batch_size
                            * cfg.direction_weight)
        loss = loss + dir_loss_reduced

    return LossOutput(loss, loc_loss_reduced, cls_loss_reduced,
                      dir_loss_reduced, cls_pos, cls_neg)
