"""Spatial (BEV-grid) model parallelism — the framework's CP/SP analogue.

The reference has no model/sequence scaling axis (SURVEY §2.4/§5.7); the
analogous axis here is the BEV grid. For grids too large for one chip's
step-time budget (full KITTI and beyond), the canvas and every RPN
activation shard along the BEV y rows of a ('spatial',) mesh:
`with_sharding_constraint` marks the canvas and head tensors, and XLA's
SPMD partitioner inserts the halo exchanges for the 3x3 convolutions over
ICI automatically — no hand-written collectives, the same model code runs
1-chip or N-chip (the "annotate, don't rewrite" recipe the data-parallel
trainer already uses for the batch axis).

Contract: set ``runtime.spatial_axis`` ONLY when the jitted computation
runs under a mesh that defines that axis (``with spatial_mesh(n):``) —
with_sharding_constraint resolves the axis against the ambient mesh.
Front end (voxelize + PFN) stays replicated: it is O(points) and cheap
relative to the conv stack; the scatter writes a replicated canvas whose
first sharded consumer triggers one partition step. Anchor order is
(y, x, type)-major, so [A]-flat per-anchor tensors split along y exactly
like the canvas (shard_anchors_flat).

Validated numerically on a host-simulated 8-device mesh in
tests/test_spatial_parallel.py.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import PartitionSpec as P


SPATIAL_AXIS = "spatial"


def spatial_mesh(num_devices: int = 0):
    from pillars_tpu.parallel.mesh import make_mesh

    return make_mesh(num_devices, axis_name=SPATIAL_AXIS)


def shard_canvas(x: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """Constrain an NHWC canvas/head tensor to shard along H (BEV y)."""
    if not axis_name:
        return x
    return jax.lax.with_sharding_constraint(
        x, P(None, axis_name, None, None))


def shard_anchors_flat(x: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """Constrain a [B, A] per-anchor tensor (anchor order (y, x, T)-major)
    to the same y split as the canvas."""
    if not axis_name:
        return x
    return jax.lax.with_sharding_constraint(x, P(None, axis_name))
