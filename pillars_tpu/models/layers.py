"""Shared flax building blocks: masked batch norm and separable conv."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

he_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics are computed only over rows selected
    by a mask.

    Needed because the TPU pipeline pads the pillar dimension to a static
    size: the reference's BN (model/pointpillars.py:109) sees only REAL
    pillars (ragged concat); naive BN over the padded tensor would pollute
    the statistics with all-zero padding pillars. The mask selects real
    pillars; padded POINTS inside real pillars still contribute zeros,
    exactly like the reference.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool):
        """x: [..., C]; mask: broadcastable to x[..., 0] (True = real)."""
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = jnp.broadcast_to(mask[..., None], x.shape).astype(jnp.float32)
            count = jnp.maximum(jnp.sum(m) / features, 1.0)
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf * m, axis=tuple(range(x.ndim - 1))) / count
            mean2 = jnp.sum(xf * xf * m, axis=tuple(range(x.ndim - 1))) / count
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class SeparableConv(nn.Module):
    """Depthwise-separable 2D conv (keras SeparableConv2D, depth_multiplier=1,
    no bias) — the reference's deliberate RPN customization
    (model/voxelnet.py:576, :584, :607, ...)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: str | tuple = "SAME"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(features=in_ch, kernel_size=(self.kernel_size,) * 2,
                    strides=(self.stride,) * 2, padding=self.padding,
                    feature_group_count=in_ch, use_bias=False,
                    kernel_init=he_uniform, dtype=self.dtype,
                    name="depthwise")(x)
        x = nn.Conv(features=self.features, kernel_size=(1, 1), use_bias=False,
                    kernel_init=he_uniform, dtype=self.dtype,
                    name="pointwise")(x)
        return x
