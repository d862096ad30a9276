"""The jitted train step and training state.

One jit boundary covers the ENTIRE step: voxelization, anchors mask, target
assignment, forward, loss, backward, optimizer update. The reference splits
this across host numpy (voxelize/targets, load_data.py:2543-3116) and a
tf.function (train.py:265-304); fusing it removes every host<->device
round-trip from the hot loop.

Batch layout (all dense, padded, batch-shardable over the 'data' mesh axis):
    points      [B, MAXPTS, D] float32
    num_points  [B]            int32
    gt_boxes    [B, G, 7]      float32 (padding rows have dims == 1)
    gt_classes  [B, G]         int32
    gt_valid    [B, G]         bool
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.train import metrics as tm
from pillars_tpu.train.optim import exponential_decay_schedule, make_optimizer


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


class StepMetrics(NamedTuple):
    """Names follow the reference's wandb keys
    (libraries/train_helper_functions.py:6-14)."""

    loss: jax.Array
    loc_loss_reduced: jax.Array
    cls_loss_reduced: jax.Array
    dir_loss_reduced: jax.Array
    cls_pos_loss: jax.Array
    cls_neg_loss: jax.Array
    learning_rate: jax.Array
    num_positives: jax.Array


def create_train_state(detector: PillarsDetector, rng: jax.Array,
                       batch_size: int) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = detector.init(rng, batch_size=batch_size)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(detector.config.train.optimizer, batch_size, params)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats,
                      opt_state), tx


def make_train_step(detector: PillarsDetector,
                    tx: optax.GradientTransformation,
                    anchor_area_threshold: Optional[float] = None,
                    donate: bool = True, with_metrics: bool = False):
    """Returns jitted ``step(state, batch) -> (state, StepMetrics)``.

    ``with_metrics=True`` (config ``train.train_metrics``) additionally
    threads a streaming :class:`pillars_tpu.train.metrics.TrainMetricsState`
    through the step — accuracy / precision-recall@thresholds computed
    INSIDE the fused graph at zero host-sync cost (the reference's
    libraries/metrics.py never ran, train.py:48 "metrics is currently not
    used"; here it is live behind the flag). Signature becomes
    ``step(state, tm_state, batch) -> (state, tm_state, StepMetrics,
    running-values dict)``."""
    thr = (detector.config.train_input.anchor_area_threshold
           if anchor_area_threshold is None else anchor_area_threshold)
    schedule = exponential_decay_schedule(
        detector.config.train.optimizer,
        detector.config.train_input.batch_size)
    num_class = detector.config.model.num_class

    def _core(state: TrainState, batch: Dict[str, jax.Array]):
        voxelized = detector.voxelize_batch(batch["points"],
                                            batch["num_points"])
        amask = detector.anchors_mask_batch(
            voxelized.coords, voxelized.pillar_mask, thr)
        targets = detector.assign_targets(
            batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"], amask)

        def loss_fn(params):
            preds, mutated = detector.network.apply(
                {"params": params, "batch_stats": state.batch_stats},
                voxelized, True, mutable=["batch_stats"])
            out = detector.loss(preds, targets.labels, targets.bbox_targets)
            return out.loss, (mutated["batch_stats"], out, preds["cls_preds"])

        grads, (new_stats, out, cls_preds) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, new_params, new_stats,
                               new_opt_state)
        metrics = StepMetrics(
            loss=out.loss,
            loc_loss_reduced=out.loc_loss_reduced,
            cls_loss_reduced=out.cls_loss_reduced,
            dir_loss_reduced=out.dir_loss_reduced,
            cls_pos_loss=out.cls_pos_loss,
            cls_neg_loss=out.cls_neg_loss,
            learning_rate=schedule(state.step),
            num_positives=jnp.sum((targets.labels > 0).astype(jnp.int32)),
        )
        return new_state, metrics, out, cls_preds, targets

    if not with_metrics:
        def step(state: TrainState, batch: Dict[str, jax.Array]):
            new_state, metrics, _, _, _ = _core(state, batch)
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def step_m(state: TrainState, tm_state: tm.TrainMetricsState,
               batch: Dict[str, jax.Array]):
        new_state, metrics, out, cls_preds, targets = _core(state, batch)
        new_tm, values = tm.update_metrics(
            tm_state, out.cls_loss_reduced, out.loc_loss_reduced,
            cls_preds.astype(jnp.float32), targets.labels, num_class)
        return new_state, new_tm, metrics, values

    # do NOT donate tm_state: its freshly-init'd leaves are deduplicated
    # zeros sharing ONE buffer, and donating that buffer twice is a runtime
    # error ("attempt to donate the same buffer twice"); the state is a
    # handful of scalars, so donation buys nothing anyway
    return jax.jit(step_m, donate_argnums=(0,) if donate else ())
