"""Greedy NMS as a single Pallas TPU kernel.

The lax formulation in ops/nms.py runs the greedy sweep as a 100-iteration
``fori_loop`` of tiny XLA ops; as one Pallas kernel the whole [K, K] IoU
tile lives in VMEM and the sequential sweep runs register-resident — one
kernel launch instead of a hundred loop steps.

Semantics identical to ops/nms.py::nms_standup's core (and thus to the
reference CUDA kernel, eval_helper_functions.py:553-598): boxes arrive
score-sorted; box i is kept iff no earlier KEPT box overlaps it with
IoU > threshold, where the IoU uses the reference's +1 pixel convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, valid_row_ref, out_ref, overlap_ref, *,
                iou_threshold: float, k: int):
    boxes = boxes_ref[:]                    # [K, 4] f32, score-sorted
    valid = valid_ref[:] > 0                # [K, 1] bool
    valid_t = valid_row_ref[:] > 0          # [1, K] bool (Mosaic cannot
    #                                          transpose i1 vectors)

    x0 = boxes[:, 0:1]
    y0 = boxes[:, 1:2]
    x1 = boxes[:, 2:3]
    y1 = boxes[:, 3:4]
    area = (x1 - x0 + 1.0) * (y1 - y0 + 1.0)          # [K, 1]
    left = jnp.maximum(x0, x0.T)                       # [K, K]
    right = jnp.minimum(x1, x1.T)
    top = jnp.maximum(y0, y0.T)
    bottom = jnp.minimum(y1, y1.T)
    inter = jnp.maximum(right - left + 1.0, 0.0) * jnp.maximum(
        bottom - top + 1.0, 0.0)
    iou = inter / (area + area.T - inter)
    overlap = (iou > iou_threshold) & valid & valid_t  # [K, K]
    # overlap_ref[i, j] = 1 iff j can suppress i (given j kept and j < i);
    # materialized to VMEM so the sweep can DYNAMIC-SLICE one row per step
    # (Mosaic cannot dynamic-slice values, only refs). The row-sweep is
    # O(K) per step; the previous formulation extracted column i with a
    # [K, K] iota mask every step — O(K^2) per step, ~1.9 ms at K=1000.
    overlap_ref[:] = overlap.astype(jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    valid_row = valid_row_ref[:]            # [1, K] int32

    def body(i, kept):                      # kept: [1, K] int32
        row = overlap_ref[pl.ds(i, 1), :]   # suppressors of box i, [1, K]
        suppressed = jnp.any((row > 0) & (kept > 0) & (lane < i))
        valid_i = jnp.any((valid_row > 0) & (lane == i))
        keep_i = (valid_i & ~suppressed).astype(jnp.int32)
        return jnp.where(lane == i, keep_i, kept)

    kept = jax.lax.fori_loop(0, k, body, jnp.zeros((1, k), dtype=jnp.int32))
    out_ref[:] = kept


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_keep_mask_pallas(boxes_sorted: jax.Array, valid_sorted: jax.Array,
                         iou_threshold: float,
                         interpret: bool = False) -> jax.Array:
    """[K, 4] score-sorted standup boxes + [K] validity -> [K] keep mask.

    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    tests)."""
    k = boxes_sorted.shape[0]
    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=float(iou_threshold),
                          k=k),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.int32)],
        interpret=interpret,
    )(boxes_sorted.astype(jnp.float32),
      valid_sorted.astype(jnp.int32).reshape(k, 1),
      valid_sorted.astype(jnp.int32).reshape(1, k))
    return out[0] > 0
