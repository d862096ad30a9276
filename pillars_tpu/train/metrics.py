"""Streaming train-time metrics — functional port of the reference's
libraries/metrics.py (Scalar / Accuracy / PrecisionRecall, metrics.py:33-198).

The reference implements these as Keras models with tf.Variable state and
notes "metrics is currently not used" (train.py:48); they are provided
here as jit-safe pure functions (state in, state out — no side effects)
so they can run INSIDE the fused train step at zero host-sync cost, which
the reference's eager design could not.

Semantics preserved exactly, including the quirks:
- Scalar skips zero values (metrics.py:41-43);
- Accuracy counts matches UNWEIGHTED while counting examples weighted
  (metrics.py:80-82);
- PrecisionRecall freezes a threshold's accumulators on batches with no
  positives for it (metrics.py:128-134);
- default weights mask ``labels != -1`` (ignore index).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


PR_THRESHOLDS = (0.1, 0.3, 0.5, 0.7, 0.8, 0.9, 0.95)
IGNORE_IDX = -1


class ScalarState(NamedTuple):
    total: jax.Array
    count: jax.Array

    @classmethod
    def init(cls) -> "ScalarState":
        return cls(jnp.zeros(()), jnp.zeros(()))

    @property
    def value(self) -> jax.Array:
        return self.total / jnp.maximum(self.count, 1.0)


def scalar_update(state: ScalarState, value: jax.Array) -> ScalarState:
    """Running mean that ignores exact-zero values (metrics.py:39-43)."""
    nz = (value != 0.0).astype(jnp.float32)
    return ScalarState(state.total + nz * value.astype(jnp.float32),
                       state.count + nz)


class AccuracyState(NamedTuple):
    total: jax.Array
    count: jax.Array

    @classmethod
    def init(cls) -> "AccuracyState":
        return cls(jnp.zeros(()), jnp.zeros(()))

    @property
    def value(self) -> jax.Array:
        return self.total / jnp.maximum(self.count, 1.0)


def accuracy_update(state: AccuracyState, labels: jax.Array,
                    cls_preds: jax.Array,
                    weights: Optional[jax.Array] = None,
                    threshold: float = 0.5) -> AccuracyState:
    """metrics.py:46-84 (encode_background_as_zeros path): predicted label
    is argmax+1 where any sigmoid score clears the threshold, else
    background 0. labels [B, A], cls_preds [B, A, C]."""
    scores = jax.nn.sigmoid(cls_preds)
    labels_pred = jnp.argmax(cls_preds, axis=-1) + 1
    pred_labels = jnp.where(jnp.any(scores > threshold, axis=-1),
                            labels_pred, 0)
    if weights is None:
        weights = (labels != IGNORE_IDX).astype(jnp.float32)
    else:
        weights = weights.astype(jnp.float32)
    num_examples = jnp.clip(jnp.sum(weights), 1.0, 1e6)
    # quirk preserved: matches counted UNWEIGHTED (metrics.py:80-82)
    total = jnp.sum((pred_labels == labels).astype(jnp.float32))
    return AccuracyState(state.total + total, state.count + num_examples)


class PrecisionRecallState(NamedTuple):
    prec_total: jax.Array
    prec_count: jax.Array
    rec_total: jax.Array
    rec_count: jax.Array

    @classmethod
    def init(cls, n: int = len(PR_THRESHOLDS)) -> "PrecisionRecallState":
        z = jnp.zeros((n,))
        return cls(z, z, z, z)

    @property
    def precision(self) -> jax.Array:
        return self.prec_total / jnp.clip(self.prec_count, 1.0, 1e5)

    @property
    def recall(self) -> jax.Array:
        return self.rec_total / jnp.clip(self.rec_count, 1.0, 1e5)


def precision_recall_update(state: PrecisionRecallState, labels: jax.Array,
                            cls_preds: jax.Array,
                            weights: Optional[jax.Array] = None,
                            thresholds: Tuple[float, ...] = PR_THRESHOLDS
                            ) -> PrecisionRecallState:
    """metrics.py:87-141: binary foreground PR at fixed score thresholds.
    labels [B, A], cls_preds [B, A, C] (sigmoid scores, max over C)."""
    scores = jnp.max(jax.nn.sigmoid(cls_preds), axis=-1)
    if weights is None:
        weights = (labels != IGNORE_IDX).astype(jnp.float32)
    else:
        weights = weights.astype(jnp.float32)
    trues = labels > 0
    pt, pc, rt, rc = [], [], [], []
    for i, thresh in enumerate(thresholds):
        pred_trues = scores > thresh
        tp = jnp.sum(weights * (trues & pred_trues).astype(jnp.float32))
        fp = jnp.sum(weights * ((~trues) & pred_trues).astype(jnp.float32))
        fn = jnp.sum(weights * (trues & (~pred_trues)).astype(jnp.float32))
        rec_count = tp + fn
        prec_count = tp + fp
        # quirk preserved: accumulators freeze when a batch contributes no
        # candidates for this threshold (metrics.py:128-134)
        rgate = (rec_count > 0).astype(jnp.float32)
        pgate = (prec_count > 0).astype(jnp.float32)
        rt.append(state.rec_total[i] + rgate * tp)
        rc.append(state.rec_count[i] + rgate * rec_count)
        pt.append(state.prec_total[i] + pgate * tp)
        pc.append(state.prec_count[i] + pgate * prec_count)
    return PrecisionRecallState(jnp.stack(pt), jnp.stack(pc),
                                jnp.stack(rt), jnp.stack(rc))


class TrainMetricsState(NamedTuple):
    """Aggregate used by the reference's update_metrics (metrics.py:166-198)."""

    rpn_acc: AccuracyState
    rpn_pr: PrecisionRecallState
    rpn_cls_loss: ScalarState
    rpn_loc_loss: ScalarState

    @classmethod
    def init(cls) -> "TrainMetricsState":
        return cls(AccuracyState.init(), PrecisionRecallState.init(),
                   ScalarState.init(), ScalarState.init())


def update_metrics(state: TrainMetricsState, cls_loss, loc_loss, cls_preds,
                   labels, num_class: int,
                   sampled: Optional[jax.Array] = None):
    """reference metrics.py:166-198: one streaming update; returns
    (new_state, dict of current running values). cls_preds [B, ..., C]
    reshaped to [B, A, C] like the reference."""
    b = cls_preds.shape[0]
    cls_preds = cls_preds.reshape(b, -1, num_class)
    acc = accuracy_update(state.rpn_acc, labels, cls_preds, sampled)
    pr = precision_recall_update(state.rpn_pr, labels, cls_preds, sampled)
    cl = scalar_update(state.rpn_cls_loss, cls_loss)
    ll = scalar_update(state.rpn_loc_loss, loc_loss)
    new = TrainMetricsState(acc, pr, cl, ll)
    ret = {
        "cls_loss": cl.value,
        "cls_loss_rt": cls_loss,
        "loc_loss": ll.value,
        "loc_loss_rt": loc_loss,
        "rpn_acc": acc.value,
    }
    for i, thresh in enumerate(PR_THRESHOLDS):
        ret[f"prec@{int(thresh * 100)}"] = pr.precision[i]
        ret[f"rec@{int(thresh * 100)}"] = pr.recall[i]
    return new, ret
