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


def depthwise_shift_add(x, kernel, stride: int = 1,
                        padding="SAME") -> jnp.ndarray:
    """Depthwise 2D conv expressed as k*k shifted multiply-adds.

    Mathematically identical to a grouped (feature_group_count=C) conv with
    the same [kh, kw, 1, C] kernel, but lowered as pad/strided-slice/
    multiply/add chains — pure elementwise VPU work that XLA fuses into one
    bandwidth-bound pass, with an autodiff transpose of the same shape.
    Grouped convs keep the MXU idle (one "input channel" per group), so this
    formulation is a candidate fast path for both forward and backward.

    ``padding`` is "SAME" (stride 1 only) or an explicit
    ((top, bottom), (left, right)) tuple applied before a VALID conv —
    the two cases the RPN uses (models/rpn.py:_Block._conv).
    """
    kh, kw, _, c = kernel.shape
    if padding == "SAME":
        if stride != 1:
            raise ValueError("SAME shift-add path supports stride 1 only")
        ph0 = (kh - 1) // 2
        pw0 = (kw - 1) // 2
        pads = ((ph0, kh - 1 - ph0), (pw0, kw - 1 - pw0))
    else:
        pads = tuple(padding)
    xp = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    b, hp, wp, _ = xp.shape
    oh = (hp - kh) // stride + 1
    ow = (wp - kw) // stride + 1
    out = None
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (b, dy + (oh - 1) * stride + 1,
                 dx + (ow - 1) * stride + 1, c),
                (1, stride, stride, 1))
            term = tap * kernel[dy, dx, 0][None, None, None, :]
            out = term if out is None else out + term
    return out


class _DepthwiseShiftAdd(nn.Module):
    """Param-tree twin of nn.Conv(name="depthwise", feature_group_count=C):
    same "kernel" param, applied via depthwise_shift_add. Checkpoints
    interchange with the grouped-conv path."""

    kernel_size: int
    stride: int
    padding: "str | tuple"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from flax.linen.dtypes import promote_dtype

        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", he_uniform,
            (self.kernel_size, self.kernel_size, 1, in_ch))
        x, kernel = promote_dtype(x, kernel, dtype=self.dtype)
        return depthwise_shift_add(x, kernel, self.stride, self.padding)


class SeparableConv(nn.Module):
    """Depthwise-separable 2D conv (keras SeparableConv2D, depth_multiplier=1,
    no bias) — the reference's deliberate RPN customization
    (model/voxelnet.py:576, :584, :607, ...).

    ``shift_add`` swaps the depthwise stage's lowering from a grouped conv
    to the shift-add formulation (same params, same math)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: str | tuple = "SAME"
    dtype: Optional[jnp.dtype] = None
    shift_add: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if self.shift_add:
            x = _DepthwiseShiftAdd(self.kernel_size, self.stride,
                                   self.padding, dtype=self.dtype,
                                   name="depthwise")(x)
        else:
            x = nn.Conv(features=in_ch, kernel_size=(self.kernel_size,) * 2,
                        strides=(self.stride,) * 2, padding=self.padding,
                        feature_group_count=in_ch, use_bias=False,
                        kernel_init=he_uniform, dtype=self.dtype,
                        name="depthwise")(x)
        x = nn.Conv(features=self.features, kernel_size=(1, 1), use_bias=False,
                    kernel_init=he_uniform, dtype=self.dtype,
                    name="pointwise")(x)
        return x
