"""Sparse 3D conv ops (ops/sparse_conv.py) against brute-force oracles,
and the SECOND sparse middle extractor (models/sparse_middle.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pillars_tpu.ops import sparse_conv as sp


DIMS = (4, 6, 8)  # (nz, ny, nx)


def _random_active(rng, dims, n_active, cap):
    """Sorted-unique keys [cap] + valid mask, the voxelizer layout."""
    n_cells = dims[0] * dims[1] * dims[2]
    keys = rng.choice(n_cells, size=n_active, replace=False)
    keys.sort()
    full = np.full(cap, n_cells, np.int32)
    full[:n_active] = keys
    valid = np.zeros(cap, bool)
    valid[:n_active] = True
    return jnp.asarray(full), jnp.asarray(valid)


def _dense_from_sparse(keys, valid, feats, dims):
    n_cells = dims[0] * dims[1] * dims[2]
    dense = np.zeros((n_cells, feats.shape[-1]), np.float32)
    k = np.asarray(keys)[np.asarray(valid)]
    dense[k] = np.asarray(feats)[np.asarray(valid)]
    return dense.reshape(dims + (feats.shape[-1],))


def dense_conv_oracle(dense, taps, kernel, stride, padding):
    """Direct NumPy conv: out[o] = sum_t in[stride*o - pad + t] @ W[t]."""
    dims = dense.shape[:3]
    odims = tuple(sp.conv_out_dim(n, k, s, p)
                  for n, k, s, p in zip(dims, kernel, stride, padding))
    cout = taps.shape[-1]
    out = np.zeros(odims + (cout,), np.float32)
    offs = sp.kernel_offsets(kernel)
    for oz in range(odims[0]):
        for oy in range(odims[1]):
            for ox in range(odims[2]):
                acc = np.zeros(cout, np.float32)
                for t, (dz, dy, dx) in enumerate(offs):
                    z = oz * stride[0] - padding[0] + dz
                    y = oy * stride[1] - padding[1] + dy
                    x = ox * stride[2] - padding[2] + dx
                    if (0 <= z < dims[0] and 0 <= y < dims[1]
                            and 0 <= x < dims[2]):
                        acc += dense[z, y, x] @ taps[t]
                out[oz, oy, ox] = acc
    return out


class TestMatchSorted:
    def test_against_dict(self, rng):
        n_cells = 1000
        keys = np.sort(rng.choice(n_cells, 60, replace=False)).astype(np.int32)
        cap = 80
        full = np.full(cap, n_cells, np.int32)
        full[:60] = keys
        valid = np.arange(cap) < 60
        q = rng.randint(0, n_cells, size=200).astype(np.int32)
        qvalid = rng.rand(200) > 0.1
        got = np.asarray(sp.match_sorted(
            jnp.asarray(full), jnp.asarray(valid), jnp.asarray(q),
            jnp.asarray(qvalid), n_cells))
        lookup = {int(k): i for i, k in enumerate(keys)}
        for m in range(200):
            want = lookup.get(int(q[m]), cap) if qvalid[m] else cap
            assert got[m] == want, (m, q[m], got[m], want)

    def test_all_invalid(self):
        n_cells = 50
        keys = jnp.full((8,), n_cells, jnp.int32)
        valid = jnp.zeros((8,), bool)
        got = sp.match_sorted(keys, valid, jnp.arange(5, dtype=jnp.int32),
                              jnp.ones((5,), bool), n_cells)
        assert np.all(np.asarray(got) == 8)


class TestSubmConv:
    @pytest.mark.parametrize("n_active", [1, 17, 40])
    def test_vs_dense_oracle(self, rng, n_active):
        cap = 48
        cin, cout = 5, 7
        keys, valid = _random_active(rng, DIMS, n_active, cap)
        feats = jnp.asarray(
            rng.randn(cap, cin).astype(np.float32)
            * np.asarray(valid)[:, None])
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.2

        nbr = sp.neighbor_indices(keys, valid, DIMS, (3, 3, 3))
        out = np.asarray(sp.gather_conv(feats, nbr, jnp.asarray(w)))

        dense = _dense_from_sparse(keys, valid, feats, DIMS)
        ref = dense_conv_oracle(dense, w, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        kk = np.asarray(keys)
        vv = np.asarray(valid)
        for v in range(cap):
            if vv[v]:
                z, y, x = np.unravel_index(kk[v], DIMS)
                np.testing.assert_allclose(out[v], ref[z, y, x],
                                           rtol=1e-5, atol=1e-5)

    def test_neighbor_indices_oracle(self, rng):
        cap = 32
        keys, valid = _random_active(rng, DIMS, 20, cap)
        nbr = np.asarray(sp.neighbor_indices(keys, valid, DIMS, (3, 3, 3)))
        kk, vv = np.asarray(keys), np.asarray(valid)
        lookup = {int(k): i for i, k in enumerate(kk[vv])}
        offs = sp.kernel_offsets((3, 3, 3))
        for v in range(cap):
            if not vv[v]:
                assert np.all(nbr[v] == cap)
                continue
            z, y, x = np.unravel_index(kk[v], DIMS)
            for t, (dz, dy, dx) in enumerate(offs):
                p = (z + dz - 1, y + dy - 1, x + dx - 1)
                want = cap
                if all(0 <= p[i] < DIMS[i] for i in range(3)):
                    want = lookup.get(
                        int(np.ravel_multi_index(p, DIMS)), cap)
                assert nbr[v, t] == want
        # center tap is the voxel itself
        assert np.all(nbr[vv, 13] == np.arange(cap)[vv])

    def test_neighbor_indices_dense_runs_and_borders(self):
        """Stress the 3x3x3 fast path (neighbor_indices_33): full x-rows
        of consecutive keys, actives on x borders, and a leading query
        with no preceding source."""
        dims = (2, 3, 5)
        rows = [
            # full row at (z=0, y=0): keys 0..4
            [(0, 0, xx) for xx in range(5)],
            # sparse pattern with x borders at (z=1, y=2)
            [(1, 2, 0), (1, 2, 2), (1, 2, 4)],
            # singleton at (z=1, y=0)
            [(1, 0, 3)],
        ]
        pts = [p for row in rows for p in row]
        keys = np.sort([((z * 3 + y) * 5 + x) for z, y, x in pts])
        cap = 16
        n_cells = 2 * 3 * 5
        full = np.full(cap, n_cells, np.int32)
        full[:len(keys)] = keys
        valid = np.arange(cap) < len(keys)
        nbr = np.asarray(sp.neighbor_indices(
            jnp.asarray(full), jnp.asarray(valid), dims, (3, 3, 3)))
        lookup = {int(k): i for i, k in enumerate(keys)}
        offs = sp.kernel_offsets((3, 3, 3))
        for v in range(len(keys)):
            z, y, x = np.unravel_index(full[v], dims)
            for t, (dz, dy, dx) in enumerate(offs):
                p = (z + dz - 1, y + dy - 1, x + dx - 1)
                want = cap
                if all(0 <= p[i] < dims[i] for i in range(3)):
                    want = lookup.get(
                        int(np.ravel_multi_index(p, dims)), cap)
                assert nbr[v, t] == want, (v, t, (dz, dy, dx))


class TestStridedConv:
    @pytest.mark.parametrize("kernel,stride", [
        ((3, 3, 3), (2, 2, 2)),
        ((3, 1, 1), (2, 1, 1)),
        ((3, 3, 3), (1, 1, 1)),
    ])
    def test_vs_dense_oracle(self, rng, kernel, stride):
        cap = 48
        cin, cout = 4, 6
        pad = tuple((k - 1) // 2 for k in kernel)
        keys, valid = _random_active(rng, DIMS, 25, cap)
        feats = jnp.asarray(
            rng.randn(cap, cin).astype(np.float32)
            * np.asarray(valid)[:, None])
        K = int(np.prod(kernel))
        w = rng.randn(K, cin, cout).astype(np.float32) * 0.2

        # output cap sized above the worst-case dilation (stride-1 kernel-3
        # inflates the active set; capped truncation is exercised separately
        # in test_cap_overflow_keeps_lowest_keys)
        ocap = 512
        okeys, ovalid, odims = sp.downsample_active_set(
            keys, valid, DIMS, kernel, stride, pad, ocap)
        nbr = sp.strided_rulebook(keys, valid, okeys, ovalid, DIMS, odims,
                                  kernel, stride, pad)
        out = np.asarray(sp.gather_conv(feats, nbr, jnp.asarray(w)))

        dense = _dense_from_sparse(keys, valid, feats, DIMS)
        ref = dense_conv_oracle(dense, w, kernel, stride, pad)

        # oracle active set: output cells with >= 1 active input in window
        kk, vv = np.asarray(keys), np.asarray(valid)
        active_in = set(int(k) for k in kk[vv])
        offs = sp.kernel_offsets(kernel)
        want_active = set()
        for k in active_in:
            z, y, x = np.unravel_index(k, DIMS)
            for dz, dy, dx in offs:
                num = (z + pad[0] - dz, y + pad[1] - dy, x + pad[2] - dx)
                o = tuple(n // s for n, s in zip(num, stride))
                if (all(n == oo * s for n, oo, s in zip(num, o, stride))
                        and all(0 <= o[i] < odims[i] for i in range(3))):
                    want_active.add(int(np.ravel_multi_index(o, odims)))

        ok, ov = np.asarray(okeys), np.asarray(ovalid)
        got_active = set(int(k) for k in ok[ov])
        assert got_active == want_active
        assert np.all(np.sort(ok[ov]) == ok[ov])  # sorted-unique layout

        for v in range(ocap):
            if ov[v]:
                z, y, x = np.unravel_index(ok[v], odims)
                np.testing.assert_allclose(out[v], ref[z, y, x],
                                           rtol=1e-5, atol=1e-5)

    def test_cap_overflow_keeps_lowest_keys(self, rng):
        # stride 1, kernel 3: active set dilates; with a tight cap the
        # lowest output keys must survive
        keys, valid = _random_active(rng, DIMS, 20, 32)
        okeys, ovalid, odims = sp.downsample_active_set(
            keys, valid, DIMS, (3, 3, 3), (1, 1, 1), (1, 1, 1), 10)
        okeys_big, ovalid_big, _ = sp.downsample_active_set(
            keys, valid, DIMS, (3, 3, 3), (1, 1, 1), (1, 1, 1), 512)
        full = np.asarray(okeys_big)[np.asarray(ovalid_big)]
        got = np.asarray(okeys)[np.asarray(ovalid)]
        assert len(full) > 10
        np.testing.assert_array_equal(got, np.sort(full)[:10])


class TestSparseMiddleExtractor:
    def _cfg(self):
        from pillars_tpu.config import Config

        cfg = Config.default()
        cfg = cfg.override("model.voxel.voxel_size", [0.8, 0.64, 0.75])
        # grid (nx, ny, nz) = (8, 8, 8)
        cfg = cfg.override("model.voxel.max_voxels", 64)
        cfg = cfg.override("model.voxel.max_points", 256)
        cfg = cfg.override("model.middle.enabled", True)
        cfg = cfg.override("model.middle.sparse", True)
        cfg = cfg.override("model.middle.num_filters", [8, 16])
        cfg = cfg.override("model.middle.subm_per_stage", 1)
        cfg = cfg.override("model.middle.downsample_strides",
                           [[2, 2, 2], [2, 1, 1]])
        cfg = cfg.override("model.middle.downsample_kernels",
                           [[3, 3, 3], [3, 1, 1]])
        cfg = cfg.override("model.pfn.pointwise", False)
        cfg = cfg.override("model.pfn.dense_cell", False)
        return cfg

    def test_shapes_and_batch_fold(self, rng):
        from pillars_tpu.models.sparse_middle import SparseMiddleExtractor

        cfg = self._cfg()
        dims = (8, 8, 8)
        cap, cin, b = 64, 4, 2
        feats = np.zeros((b, cap, cin), np.float32)
        coords = np.zeros((b, cap, 3), np.int32)
        mask = np.zeros((b, cap), bool)
        for i in range(b):
            k, v = _random_active(np.random.RandomState(i), dims, 30, cap)
            kk = np.asarray(k)
            z, y, x = np.unravel_index(np.where(np.asarray(v), kk, 0),
                                       dims)
            coords[i] = np.stack([z, y, x], -1)
            mask[i] = np.asarray(v)
            feats[i] = (rng.randn(cap, cin).astype(np.float32)
                        * mask[i][:, None])

        mod = SparseMiddleExtractor(cfg.model)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                             jnp.asarray(coords), jnp.asarray(mask), False)
        out = mod.apply(variables, jnp.asarray(feats), jnp.asarray(coords),
                        jnp.asarray(mask), False)
        # grid 8x8x8 -> stage0 s(2,2,2): 4x4x4 -> stage1 s(2,1,1): 2x4x4;
        # fold z: channels = 2 * 16
        assert out.shape == (b, 4, 4, 32)
        assert np.all(np.isfinite(np.asarray(out)))

        # batch fold must equal per-sample runs (eval mode, shared params)
        for i in range(b):
            solo = mod.apply(variables, jnp.asarray(feats[i:i + 1]),
                             jnp.asarray(coords[i:i + 1]),
                             jnp.asarray(mask[i:i + 1]), False)
            np.testing.assert_allclose(np.asarray(out[i]),
                                       np.asarray(solo[0]),
                                       rtol=1e-5, atol=1e-5)

    def test_grads_flow_through_sparse_convs(self, rng):
        from pillars_tpu.models.detector import PillarsDetector

        cfg = self._cfg()
        det = PillarsDetector(cfg)
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)
        n = 120
        pts = np.zeros((1, cfg.model.voxel.max_points, 3), np.float32)
        pts[0, :n, 0] = rng.uniform(0, 6.4, n)
        pts[0, :n, 1] = rng.uniform(-2.5, 2.5, n)
        pts[0, :n, 2] = rng.uniform(-2.9, 2.9, n)
        vox = det.voxelize_batch(jnp.asarray(pts),
                                 jnp.asarray([n], jnp.int32))

        def loss_fn(params):
            preds, _ = det.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                vox, train=True, mutable=["batch_stats"])
            return jnp.sum(preds["box_preds"] ** 2)

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = {
            p: g for p, g in jax.tree_util.tree_leaves_with_path(grads)}
        touched = 0
        for path, g in leaves.items():
            assert np.all(np.isfinite(np.asarray(g))), path
            if "middle" in str(path) and np.any(np.asarray(g) != 0):
                touched += 1
        assert touched >= 4  # every sparse conv stage gets gradient

    def test_kitti_second_config(self):
        from pillars_tpu.config import Config

        cfg = Config.from_yaml("configs/kitti_second.yaml")
        assert cfg.model.middle.sparse
        assert cfg.model.voxel.grid_size == (1408, 1600, 40)
        # 1600x1408 -> /2 -> /2 -> y/x untouched by the z-squash stage
        assert cfg.model.feature_map_size == (1, 400, 352)
        assert cfg.model.pfn.simple_mean
        # packed (key, tag) sort must fit int32 at this grid size
        n_cells = 1408 * 1600 * 40
        assert 2 * (n_cells + 1) < 2**31

    def test_train_step_runs(self, rng):
        """Full fused train step (voxelize + targets + fwd/bwd + AdamW)
        through the sparse middle extractor on a tiny grid."""
        import jax.numpy as jnp
        from pillars_tpu.models.detector import PillarsDetector
        from pillars_tpu.train.loop import create_train_state, make_train_step

        cfg = self._cfg()
        det = PillarsDetector(cfg)
        B = 2
        state, tx = create_train_state(det, jax.random.PRNGKey(0), B)
        step = make_train_step(det, tx, donate=False)
        n = 150
        maxpts = cfg.model.voxel.max_points
        g = cfg.model.target.max_gt_boxes
        pts = np.zeros((B, maxpts, 3), np.float32)
        pts[:, :n, 0] = rng.uniform(0, 6.4, (B, n))
        pts[:, :n, 1] = rng.uniform(-2.5, 2.5, (B, n))
        pts[:, :n, 2] = rng.uniform(-2.9, 0.5, (B, n))
        gt = np.zeros((B, g, 7), np.float32)
        gt[..., 3:6] = 1.0
        gt[:, 0] = [3.0, 0.0, -1.5, 0.6, 0.8, 1.73, 0.3]
        batch = dict(
            points=jnp.asarray(pts),
            num_points=jnp.full((B,), n, jnp.int32),
            gt_boxes=jnp.asarray(gt),
            gt_classes=jnp.ones((B, g), jnp.int32),
            gt_valid=jnp.asarray(
                np.pad(np.ones((B, 1), bool), ((0, 0), (0, g - 1)))),
        )
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics.loss))
        assert int(state2.step) == 1

    @pytest.mark.parametrize("pointwise", [False, True])
    def test_detector_forward(self, rng, pointwise):
        from pillars_tpu.models.detector import PillarsDetector

        cfg = self._cfg()
        if pointwise:
            # the kitti_second path: point-major voxelizer + scan-wise
            # SimpleVoxel means (voxel_mean), no [P, N, D] tensor
            cfg = cfg.override("model.pfn.pointwise", True)
            cfg = cfg.override("model.pfn.simple_mean", True)
        det = PillarsDetector(cfg)
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)
        n = 100
        pts = np.zeros((1, cfg.model.voxel.max_points, 3), np.float32)
        pts[0, :n, 0] = rng.uniform(0, 6.4, n)
        pts[0, :n, 1] = rng.uniform(-2.5, 2.5, n)
        pts[0, :n, 2] = rng.uniform(-2.9, 2.9, n)
        vox = det.voxelize_batch(jnp.asarray(pts),
                                 jnp.asarray([n], jnp.int32))
        preds = det.apply(variables, vox, train=False)
        _, ny, nx = cfg.model.feature_map_size
        assert preds["cls_preds"].shape[1:3] == (ny, nx)
        assert np.all(np.isfinite(np.asarray(preds["box_preds"])))
