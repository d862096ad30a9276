"""RPN: SSD-style backbone of separable convs + transposed-conv up-branches
+ 1x1 detection heads, NHWC end to end.

reference model/voxelnet.py:517-717. Three downsample blocks
(layer_nums [3,5,5], strides [1,2,2], filters [64,128,256]; each block is
1 strided separable conv + N same-padding separable convs, every conv
followed by BN+ReLU), three ConvTranspose up-branches to 128 channels each,
concat to 384, then conv_box (14ch), conv_cls (2ch), conv_dir_cls (4ch).

The reference scatters NCHW and transposes to NHWC inside the RPN
(voxelnet.py:697); here the canvas arrives NHWC natively.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flax.linen.dtypes import promote_dtype

from pillars_tpu.config import ModelConfig
from pillars_tpu.models.layers import SeparableConv, he_uniform


class _SplitHead(nn.Module):
    """1x1 detection head applied per up-branch without the concat.

    ``conv1x1(concat(u1, u2, u3), W) == sum_i einsum(u_i, W[slice_i])``
    with W split along its input-channel axis, so this is mathematically
    identical to the reference's Conv2D-on-concat head (voxelnet.py:600-612)
    while never materializing the [ny, nx, 384] concat — pure HBM traffic
    worth ~1 ms/cloud at KITTI scale (scripts/probe_rpn_tail_variants.py:
    tail 2.27 -> 1.28 ms). The param tree matches nn.Conv(features, (1, 1))
    exactly, so checkpoints are interchangeable with the concat path."""

    features: int
    dtype: Optional[jnp.dtype] = None
    bias_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, ups):
        ctot = sum(u.shape[-1] for u in ups)
        kernel = self.param("kernel", he_uniform,
                            (1, 1, ctot, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        # unpack the branches as separate args: promote_dtype would
        # jnp.asarray-STACK a list, crashing on mixed branch widths
        *ups, kernel, bias = promote_dtype(*ups, kernel, bias,
                                           dtype=self.dtype)
        acc = None
        off = 0
        for u in ups:
            c = u.shape[-1]
            term = jnp.einsum("bhwi,io->bhwo", u, kernel[0, 0, off:off + c])
            acc = term if acc is None else acc + term
            off += c
        return acc + bias


def _apply_heads(cfg: ModelConfig, ups, dtype) -> Dict[str, jnp.ndarray]:
    """The three 1x1 heads (conv_box/conv_cls/conv_dir_cls) over the list
    of up-branches (a one-element list when the concat materialized)."""
    n_anchor = cfg.num_anchors_per_loc
    num_cls = n_anchor * (cfg.num_class if cfg.encode_background_as_zeros
                          else cfg.num_class + 1)
    box = _SplitHead(n_anchor * cfg.box_code_size, dtype=dtype,
                     name="conv_box")(ups)
    # focal-loss prior bias init (RetinaNet sec. 4.1): b = -log((1-pi)/pi)
    # starts every anchor's background probability at ~pi instead of ~0.5,
    # skipping the multi-epoch background sweep that dominates early
    # training at large anchor counts (measured: the kitti3 1.29M-anchor
    # run's AP stayed 0.00 for 20+ epochs purely on sweep progress —
    # benchmarks/kitti3_synth). Default off (None) = reference behavior
    # (zeros, voxelnet.py:676-691).
    cls_bias = nn.initializers.zeros
    if cfg.rpn.cls_bias_prior is not None:
        p = float(cfg.rpn.cls_bias_prior)
        cls_bias = nn.initializers.constant(-np.log((1.0 - p) / p))
    cls = _SplitHead(num_cls, dtype=dtype, bias_init=cls_bias,
                     name="conv_cls")(ups)
    out = {"box_preds": box, "cls_preds": cls}
    if cfg.postprocess.use_direction_classifier:
        out["dir_cls_preds"] = _SplitHead(n_anchor * 2, dtype=dtype,
                                          name="conv_dir_cls")(ups)
    return out


class _Block(nn.Module):
    """One downsample block: strided conv + n same convs, BN+ReLU each.

    ``separable`` follows the reference's SeparableConv2D customization
    (voxelnet.py:576); set model.rpn.use_separable_conv=false for plain 3x3
    convs — on TPU the MXU makes full convs at these channel counts both
    faster and stronger, the depthwise split only pays off on edge GPUs."""

    features: int
    num_layers: int
    stride: int
    bn_momentum: float
    bn_eps: float
    separable: bool = True
    shift_add: bool = False
    dtype: Optional[jnp.dtype] = None
    # rpn.remat_bf16: the caller hands a bfloat16 boundary tensor (the
    # remat-stored residual); upcast to f32 HERE so every conv/BN inside
    # still computes in f32 — only the stored copy is half-width
    in_upcast: bool = False

    def _conv(self, x, stride, padding, name):
        if self.separable:
            return SeparableConv(self.features, 3, stride, padding=padding,
                                 dtype=self.dtype, shift_add=self.shift_add,
                                 name=name)(x)
        return nn.Conv(self.features, (3, 3), strides=(stride, stride),
                       padding=padding, use_bias=False,
                       kernel_init=he_uniform, dtype=self.dtype, name=name)(x)

    @nn.compact
    def __call__(self, x, train: bool):
        if self.in_upcast:
            x = x.astype(jnp.float32)
        # explicit ((1,1),(1,1)) zero pad + VALID conv == keras
        # ZeroPadding2D + SeparableConv2D(valid) (voxelnet.py:574-576)
        x = self._conv(x, self.stride, ((1, 1), (1, 1)), "conv0")
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=self.bn_eps,
                         dtype=self.dtype, name="bn0")(x)
        x = nn.relu(x)
        for i in range(self.num_layers):
            x = self._conv(x, 1, "SAME", f"conv{i + 1}")
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=self.bn_eps,
                             dtype=self.dtype, name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        return x


class _Deconv(nn.Module):
    """Up-branch: ConvTranspose(kernel == stride) + BN + ReLU
    (voxelnet.py:589-598)."""

    features: int
    stride: int
    bn_momentum: float
    bn_eps: float
    dtype: Optional[jnp.dtype] = None
    in_upcast: bool = False  # see _Block.in_upcast

    @nn.compact
    def __call__(self, x, train: bool):
        if self.in_upcast:
            x = x.astype(jnp.float32)
        x = nn.ConvTranspose(self.features,
                             kernel_size=(self.stride, self.stride),
                             strides=(self.stride, self.stride),
                             padding="VALID", use_bias=False,
                             kernel_init=he_uniform, dtype=self.dtype,
                             name="deconv")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=self.bn_eps,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class RPNTail(nn.Module):
    """Deconv branches + heads only — used by the fast inference path where
    the downsample blocks run as fused Pallas kernels (ops/rpn_pallas.py).
    Child names match RPN's, so RPN's param tree slices in directly."""

    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, b1, b2, b3, train: bool = False):
        rcfg = self.cfg.rpn
        ups = []
        for i, b in enumerate((b1, b2, b3)):
            ups.append(
                _Deconv(rcfg.num_upsample_filters[i], rcfg.upsample_strides[i],
                        rcfg.bn_momentum, rcfg.bn_eps, dtype=self.dtype,
                        name=f"deconv{i + 1}")(b, train))
        if not rcfg.no_concat_heads:
            ups = [jnp.concatenate(ups, axis=-1)]
        return _apply_heads(self.cfg, ups, self.dtype)


class RPN(nn.Module):
    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        """x: [B, ny, nx, C] canvas -> head outputs (NHWC)."""
        rcfg = self.cfg.rpn
        # rpn.remat: recompute each block's activations in backward
        # (jax.checkpoint) instead of storing them — see RPNConfig.remat
        Block = (nn.remat(_Block, static_argnums=(2,)) if rcfg.remat
                 else _Block)
        Deconv = (nn.remat(_Deconv, static_argnums=(2,)) if rcfg.remat
                  else _Deconv)
        # rpn.remat_bf16: the residuals the remat backward stores are
        # exactly the boundary tensors between checkpointed modules (the
        # canvas, the three block outputs, the three deconv outputs).
        # Casting each boundary to bf16 halves that stored-activation HBM
        # traffic — the measured wall of the KITTI backward — while the
        # modules upcast on entry so every conv/BN/grad stays f32. The
        # same bf16 array feeds both the deconv and the next block, so
        # each boundary is stored once.
        bf16 = bool(rcfg.remat and rcfg.remat_bf16 and self.dtype is None)

        def cast(a):
            return a.astype(jnp.bfloat16) if bf16 else a

        ups = []
        x = cast(x)
        for i in range(3):
            x = cast(Block(rcfg.num_filters[i], rcfg.layer_nums[i],
                           rcfg.layer_strides[i], rcfg.bn_momentum,
                           rcfg.bn_eps, separable=rcfg.use_separable_conv,
                           shift_add=rcfg.depthwise_shift_add,
                           dtype=self.dtype, in_upcast=bf16,
                           name=f"block{i + 1}")(x, train))
            ups.append(cast(
                Deconv(rcfg.num_upsample_filters[i], rcfg.upsample_strides[i],
                       rcfg.bn_momentum, rcfg.bn_eps, dtype=self.dtype,
                       in_upcast=bf16, name=f"deconv{i + 1}")(x, train)))
        if not rcfg.no_concat_heads:
            ups = [jnp.concatenate(ups, axis=-1)]  # [B, ny, nx, 384]
        # under bf16 boundaries the heads receive bf16 ups: promote_dtype
        # against the f32 kernels computes (and returns) f32, while the
        # heads' own saved residuals stay the half-width ups
        return _apply_heads(self.cfg, ups, self.dtype)
