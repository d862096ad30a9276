"""SECOND-style voxel middle extractor (the second model family).

The reference repo is a PointPillars customization of traveller59's
second.pytorch; SECOND itself runs a sparse 3D-conv middle extractor over a
voxel grid before the same RPN (SURVEY §7 config #5). The TPU-native take:
the voxel grid is scattered DENSE ([nz, ny, nx, C]) and processed with
regular 3D convolutions — on TPU, dense conv3d on a modest grid beats
emulating sparse gather/scatter convolutions, which fight the MXU. Each
conv block halves nz; the final z-layers fold into channels to produce the
BEV map the RPN consumes.

Scope: sized for d435i-scale grids (e.g. 80 x 64 x 16 at voxel_z 0.375).
Full-KITTI-scale sparse grids (41 x 1600 x 1408 in SECOND) need a genuinely
sparse kernel — tracked as future work in TODO.md.

Usage: set model.middle.enabled=true and give voxel_size a z resolution
finer than the z extent, e.g.:
    model.voxel.voxel_size=[0.08, 0.08, 0.375]  -> nz = 16
    model.middle.enabled=true
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pillars_tpu.config import ModelConfig
from pillars_tpu.models.layers import he_uniform


def scatter_to_grid3d(features: jax.Array, coords: jax.Array,
                      pillar_mask: jax.Array, nz: int, ny: int,
                      nx: int) -> jax.Array:
    """[V, C] voxel features + [V, 3] (z, y, x) -> [nz, ny, nx, C] dense."""
    flat = (coords[:, 0] * ny + coords[:, 1]) * nx + coords[:, 2]
    flat = jnp.where(pillar_mask, flat, nz * ny * nx)
    feats = jnp.where(pillar_mask[:, None], features, 0)
    grid = jnp.zeros((nz * ny * nx, features.shape[-1]), dtype=features.dtype)
    grid = grid.at[flat].add(feats, mode="drop")
    return grid.reshape(nz, ny, nx, features.shape[-1])


class MiddleExtractor3D(nn.Module):
    """Dense 3D conv stack over the voxel grid; folds z into channels.

    Structure mirrors SECOND's middle extractor (3x3x3 convs, z-stride 2
    between stages) with BN+ReLU per conv."""

    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid, train: bool = False):
        """grid [B, nz, ny, nx, C] -> BEV canvas [B, ny, nx, C_out]."""
        mcfg = self.cfg.middle
        x = grid
        for i, feats in enumerate(mcfg.num_filters):
            x = nn.Conv(feats, kernel_size=(3, 3, 3), strides=(2, 1, 1),
                        padding="SAME", use_bias=False,
                        kernel_init=he_uniform, dtype=self.dtype,
                        name=f"conv3d_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.cfg.rpn.bn_momentum,
                             epsilon=self.cfg.rpn.bn_eps, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        # fold remaining z into channels: [B, nz', ny, nx, C] -> [B, ny, nx, nz'*C]
        b, nz, ny, nx, c = x.shape
        return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, ny, nx, nz * c)
