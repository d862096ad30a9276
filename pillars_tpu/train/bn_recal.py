"""AdaBN-style BatchNorm recalibration for evaluation.

Round-5 diagnosis (scripts/diag_bn_eval_gap.py, kitti3 run model_600):
the training distribution the BN running statistics average over is
NOT the eval distribution — train batches carry sampler-pasted objects
(up to ~30 extra per scene) plus global rotation/scale/translate, so the
RPN's EMA statistics systematically mismatch raw eval scenes. Measured on
the same val scenes at epoch 17: eval-mode (running stats) score_max
0.16 / matched_frac 0.006 vs batch-stat normalization score_max 0.69 /
matched_frac 0.05 — the eval path was scoring a different effective
network than the one being trained. The reference inherits the same
shift silently (keras defaults, /root/reference/model/voxelnet.py:577);
at its 2.7k-anchor d435i scale the score compression is survivable, at
1.29M anchors it floors AP.

Fix (Li et al., "Revisiting Batch Normalization for Practical Domain
Adaptation", arXiv:1603.04779 — AdaBN): before evaluating, refresh the
running statistics by running K forward passes over UNAUGMENTED scenes
(the train split read through the eval-mode pipeline — no labels used,
so this is unsupervised recalibration, not test-set tuning) with a fast
EMA momentum. Parameters are untouched; only the batch_stats collection
is replaced for the eval call. Host-side batch building is cached, so a
per-epoch recalibration costs K jitted forwards (~2 s device time).
"""

from __future__ import annotations

from typing import Dict, List

import jax

from pillars_tpu.config import Config


def build_recal_fn(cfg: Config, momentum: float = 0.9):
    """Returns jitted step(variables, points, num_points) -> batch_stats.

    The recal detector is the SAME network rebuilt with every BN momentum
    overridden to ``momentum`` (identical param/batch_stats tree — only
    the EMA constant differs), applied in train mode so batch statistics
    flow into the EMA. After K batches the init stats retain a
    ``momentum**K`` weight (0.9**32 ~ 0.03)."""
    from pillars_tpu.models.detector import PillarsDetector

    cfg2 = (cfg.override("model.pfn.bn_momentum", momentum)
               .override("model.rpn.bn_momentum", momentum))
    det = PillarsDetector(cfg2)

    @jax.jit
    def step(variables, points, num_points):
        vox = det.voxelize_batch(points, num_points)
        _, mut = det.network.apply(variables, vox, True,
                                   mutable=["batch_stats"])
        return mut["batch_stats"]

    return step


def recalibrate(cfg: Config, variables: Dict, batches: List[Dict],
                momentum: float = 0.9, step=None) -> Dict:
    """Refresh ``variables['batch_stats']`` over ``batches`` (each a dict
    with 'points' [B, N, D] and 'num_points' [B]). Returns a NEW variables
    dict; the input (and the training state) is untouched. Pass a cached
    ``step`` from build_recal_fn when calling repeatedly — a fresh one
    re-jits (and on a remote TPU, recompiles) every call."""
    if step is None:
        step = build_recal_fn(cfg, momentum)
    bs = variables["batch_stats"]
    for b in batches:
        bs = step({"params": variables["params"], "batch_stats": bs},
                  b["points"], b["num_points"])
    return dict(variables, batch_stats=bs)
