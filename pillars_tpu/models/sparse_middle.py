"""SECOND sparse voxel middle extractor — TPU-native (ops/sparse_conv.py).

Mirrors second.pytorch's SpMiddleFHD topology (the middle extractor of the
SECOND voxelnet the reference repo descends from): stages of submanifold
3x3x3 convs over the active voxel set, a strided sparse conv between
stages, then the surviving z-layers fold into channels to form the BEV
canvas the RPN consumes. Dense conv3d (models/middle.py) covers d435i-scale
grids; THIS module covers full-KITTI grids (1408 x 1600 x 40, ~0.02%%
active) where a dense activation grid cannot exist.

Batch handling: rulebooks are built per sample WITHOUT vmap (see
_map_samples — batched sort lowering carries a ~5.5x penalty), then the
batch folds into the row axis for conv/BN — one MXU matmul per kernel
tap serves the whole batch, and BN statistics span every active voxel in
the batch (BatchNorm1d-over-active-rows semantics, matching
second.pytorch).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pillars_tpu.config import ModelConfig
from pillars_tpu.models.pfn import _PointwiseMaskedBN
from pillars_tpu.ops import sparse_conv as sp


def _map_samples(fn, *args):
    """Apply a per-sample function over the batch WITHOUT jax.vmap.

    Batched lowering of the sort/scan/gather pipeline is ~5.5x slower than
    the unbatched form on TPU (measured: the 27-tap rulebook costs 3.8 ms
    unvmapped vs 20.8 ms under vmap at B=1, scripts/probe_sparse_mid2.py —
    same pathology as vmapped gathers, CLAUDE.md). B == 1 squeezes and
    re-expands; B > 1 runs samples sequentially via lax.map, which is
    cheaper than the vmap penalty for the small batches this model trains
    with."""
    b = args[0].shape[0]
    if b == 1:
        out = fn(*(a[0] for a in args))
        return jax.tree_util.tree_map(lambda x: x[None], out)
    return jax.lax.map(lambda t: fn(*t), tuple(args))


def _he_taps(key, shape, dtype=jnp.float32):
    """He-uniform over fan_in = K * Cin for [K, Cin, Cout] tap weights."""
    k, cin, _ = shape
    bound = float(np.sqrt(6.0 / (k * cin)))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _SparseConvLayer(nn.Module):
    """One sparse conv (subm or strided, decided by the rulebook passed
    in) + masked BN + ReLU over batch-folded rows."""

    features: int
    taps: int
    bn_momentum: float
    bn_eps: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, nbr_global, valid, train: bool):
        """x [R, Cin] folded rows, nbr_global [Ro, K] global row indices
        (sentinel R), valid [Ro] output-row mask."""
        cin = x.shape[-1]
        w = self.param("kernel", _he_taps, (self.taps, cin, self.features))
        y = sp.gather_conv(x.astype(self.dtype or x.dtype), nbr_global,
                           w.astype(self.dtype or x.dtype))
        bn = _PointwiseMaskedBN(momentum=self.bn_momentum,
                                epsilon=self.bn_eps, dtype=self.dtype,
                                name="bn")
        y, _ = bn(y, valid, jnp.sum(valid), use_running_average=not train)
        # keep padding rows exactly zero so they stay inert for the next
        # layer's gathers and the final canvas scatter
        return jnp.where(valid[:, None], nn.relu(y), 0)


class SparseMiddleExtractor(nn.Module):
    """cfg.middle: num_filters per stage, subm_per_stage submanifold convs
    per stage, then a strided conv with downsample_strides[i] /
    downsample_kernels[i] mapping to the next stage's width."""

    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    def _stage_plan(self):
        m = self.cfg.middle
        n = len(m.num_filters)
        strides = m.downsample_strides or tuple(
            (2, 1, 1) for _ in range(n))
        kernels = m.downsample_kernels or tuple(
            (3, 3, 3) for _ in range(n))
        assert len(strides) == n and len(kernels) == n, (
            "downsample_strides/kernels must have one entry per stage")
        return m.num_filters, strides, kernels

    @nn.compact
    def __call__(self, features, coords, mask, train: bool = False):
        """features [B, V, C], coords [B, V, 3] (z, y, x) in ascending key
        order (the voxelizer layout), mask [B, V] -> BEV [B, ny', nx', C']."""
        m = self.cfg.middle
        gx, gy, gz = self.cfg.voxel.grid_size
        dims = (int(gz), int(gy), int(gx))
        b, V, _ = features.shape
        max_active = m.max_active or V
        filters, strides, kernels = self._stage_plan()

        n_cells = dims[0] * dims[1] * dims[2]
        keys = ((coords[..., 0] * dims[1] + coords[..., 1]) * dims[2]
                + coords[..., 2])
        keys = jnp.where(mask, keys, n_cells).astype(jnp.int32)
        valid = mask

        x = features.reshape(b * V, -1)
        cap = V  # rows per sample at the current stage

        def fold_rulebook(nbr, cap):
            """per-sample [B, Vo, K] (sentinel=cap) -> global rows
            [B*Vo, K] (sentinel = B*cap)."""
            row_off = (jnp.arange(b, dtype=jnp.int32)
                       * jnp.int32(cap))[:, None, None]
            g = jnp.where(nbr == cap, b * cap, nbr + row_off)
            return g.reshape(-1, g.shape[-1])

        for i, f in enumerate(filters):
            subm_kernel = (3, 3, 3)
            k_taps = 27
            nbr = _map_samples(
                lambda kk, vv: sp.neighbor_indices(kk, vv, dims,
                                                   subm_kernel), keys, valid)
            nbr_g = fold_rulebook(nbr, cap)
            vflat = valid.reshape(-1)
            n_subm = m.subm_per_stage + (1 if i == 0 else 0)
            for j in range(n_subm):
                x = _SparseConvLayer(
                    f, k_taps, self.cfg.rpn.bn_momentum,
                    self.cfg.rpn.bn_eps, dtype=self.dtype,
                    name=f"subm{i}_{j}")(x, nbr_g, vflat, train)

            stride, kernel = strides[i], kernels[i]
            pad = tuple((k - 1) // 2 for k in kernel)
            down = _map_samples(
                lambda kk, vv: sp.downsample_active_set(
                    kk, vv, dims, kernel, stride, pad, max_active)[:2],
                keys, valid)
            okeys, ovalid = down
            odims = tuple(sp.conv_out_dim(n, k, s, p) for n, k, s, p in
                          zip(dims, kernel, stride, pad))
            nbr = _map_samples(
                lambda kk, vv, ok, ov: sp.strided_rulebook(
                    kk, vv, ok, ov, dims, odims, kernel, stride, pad),
                keys, valid, okeys, ovalid)
            nbr_g = fold_rulebook(nbr, cap)
            out_f = filters[min(i + 1, len(filters) - 1)]
            x = _SparseConvLayer(
                out_f, int(np.prod(kernel)), self.cfg.rpn.bn_momentum,
                self.cfg.rpn.bn_eps, dtype=self.dtype,
                name=f"down{i}")(x, nbr_g, ovalid.reshape(-1), train)
            keys, valid, dims, cap = okeys, ovalid, odims, max_active

        # scatter the surviving active set DIRECTLY into the z-folded BEV
        # layout [B, ny', nx', nz'*C]: voxel (z, y, x) contributes its C
        # channels at column offset z*C of row y*nx+x (one-hot-z outer
        # product -> disjoint column blocks, so the adds never collide).
        # Scattering into the final layout skips the dense
        # [nz', ny', nx', C] -> [ny', nx', nz'*C] transpose, a pure-HBM
        # relayout of the whole canvas (180 MB at the shipped KITTI
        # topology) that measured as the single largest piece of the
        # composed stage cost (scripts/probe_sparse_mid3.py).
        onz, ony, onx = dims
        c_out = x.shape[-1]
        x = x.reshape(b, -1, c_out)

        def one(feats, kk, vv):
            z = kk // (ony * onx)          # sentinel rows -> z == onz
            yx = kk - z * (ony * onx)
            vals = (jax.nn.one_hot(z, onz, dtype=feats.dtype)[:, :, None]
                    * jnp.where(vv[:, None], feats, 0)[:, None, :]
                    ).reshape(-1, onz * c_out)
            canvas = jnp.zeros((ony * onx, onz * c_out), feats.dtype)
            return canvas.at[yx].add(vals, mode="drop")

        canvas = _map_samples(one, x, keys, valid)
        return canvas.reshape(b, ony, onx, onz * c_out)
