"""PillarFeatureNet: point-feature augmentation + per-point MLP + masked max.

reference model/pointpillars.py:65-225. Input here is the padded per-sample
layout (voxels [P, N, 3], num_points [P], coords [P, 3] (z, y, x),
pillar_mask [P]); the batch axis is added by vmap in the detector.

The Dense(num_filters) is the first big MXU matmul of the network:
[P*N, 8] @ [8, 128].
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from pillars_tpu.config import ModelConfig
from pillars_tpu.models.layers import MaskedBatchNorm, he_uniform


class PillarFeatureNet(nn.Module):
    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, voxels, num_points, coords, pillar_mask,
                 train: bool = False):
        """voxels [P, N, D>=3] -> pillar features [P, num_filters]."""
        pcfg = self.cfg.pfn
        vx, vy = self.cfg.voxel.voxel_size[:2]
        pcr = self.cfg.voxel.point_cloud_range
        x_offset = vx / 2 + pcr[0]
        y_offset = vy / 2 + pcr[1]
        num_max_points = voxels.shape[1]

        npts = jnp.maximum(num_points, 1).astype(voxels.dtype)[:, None, None]

        # cluster offset: distance to the pillar's point mean
        # (reference pointpillars.py:143-149)
        points_mean = jnp.sum(voxels[:, :, :3], axis=1, keepdims=True) / npts
        f_cluster = voxels[:, :, :3] - points_mean

        # center offset: distance to the geometric pillar center
        # (reference pointpillars.py:156-176; coords are (z, y, x))
        cx = coords[:, 2].astype(voxels.dtype) * vx + x_offset
        cy = coords[:, 1].astype(voxels.dtype) * vy + y_offset
        f_center = jnp.stack(
            [voxels[:, :, 0] - cx[:, None], voxels[:, :, 1] - cy[:, None]],
            axis=-1)

        features = [voxels, f_cluster, f_center]
        if pcfg.with_distance:
            features.append(
                jnp.linalg.norm(voxels[:, :, :3], axis=2, keepdims=True))
        feats = jnp.concatenate(features, axis=-1)  # [P, N, 8]

        # zero the padded points (reference pointpillars.py:197-203)
        point_mask = (jnp.arange(num_max_points)[None, :]
                      < num_points[:, None]).astype(feats.dtype)
        feats = feats * point_mask[..., None]

        feats = nn.Dense(pcfg.num_filters, use_bias=False,
                         kernel_init=he_uniform, dtype=self.dtype,
                         name="dense")(feats)
        feats = MaskedBatchNorm(momentum=pcfg.bn_momentum, epsilon=pcfg.bn_eps,
                                dtype=self.dtype, name="bn")(
            feats, pillar_mask[:, None], use_running_average=not train)
        feats = nn.relu(feats)

        # max over the point axis (includes the processed zero-points,
        # exactly like the reference, pointpillars.py:219)
        pillar_feats = jnp.max(feats, axis=1)
        # padding pillars must contribute nothing to the canvas scatter
        return jnp.where(pillar_mask[:, None], pillar_feats, 0)
