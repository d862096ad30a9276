"""Pillar features -> dense BEV canvas, as one scatter (no Python batch loop).

The reference loops over the batch in Python and issues one tf.scatter_nd per
sample with index y*nx + x (reference model/pointpillars.py:285-341). Here the
batch dimension is handled by vmap and the canvas is produced NHWC natively
(the reference produces NCHW and transposes inside the RPN,
reference model/voxelnet.py:697).

ADD semantics are load-bearing: the shipped config has two z-layers (see
ops/voxelize.py), so two pillars can map to the same (y, x) canvas cell; the
reference's tf.scatter_nd sums them, and so do we.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_to_canvas(features: jax.Array, coords: jax.Array,
                      pillar_mask: jax.Array, ny: int, nx: int) -> jax.Array:
    """[P, C] features + [P, 3] (z, y, x) coords -> [ny, nx, C] canvas.

    Padding pillars are zeroed and routed out of bounds (dropped)."""
    feats = jnp.where(pillar_mask[:, None], features, 0)
    flat_idx = coords[:, 1] * nx + coords[:, 2]
    flat_idx = jnp.where(pillar_mask, flat_idx, ny * nx)  # OOB -> dropped
    canvas = jnp.zeros((ny * nx, features.shape[-1]), dtype=features.dtype)
    canvas = canvas.at[flat_idx].add(feats, mode="drop")
    return canvas.reshape(ny, nx, features.shape[-1])


def scatter_to_canvas_batched(features, coords, pillar_mask, ny: int, nx: int):
    """[B, P, C] -> [B, ny, nx, C] via vmap."""
    return jax.vmap(
        lambda f, c, m: scatter_to_canvas(f, c, m, ny, nx))(
            features, coords, pillar_mask)
