"""Model tests: shapes through the full network, loss semantics vs. direct
NumPy computation of the reference formulas, postprocess behavior on a
crafted scene where the correct answer is known."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.models import losses as L


def small_config():
    cfg = Config.default()
    cfg = cfg.override("model.voxel.max_voxels", 2048)
    cfg = cfg.override("model.voxel.max_points", 4096)
    return cfg


CFG = small_config()


def make_cloud(rng, n=1500):
    pts = np.zeros((CFG.model.voxel.max_points, 3), dtype=np.float32)
    pts[:n, 0] = rng.uniform(0.2, 6.2, n)
    pts[:n, 1] = rng.uniform(-2.4, 2.4, n)
    pts[:n, 2] = rng.uniform(-2.5, 0.5, n)
    return pts, n


@pytest.fixture(scope="module")
def det_and_vars():
    det = PillarsDetector(CFG)
    variables = det.init(jax.random.PRNGKey(0), batch_size=2)
    return det, variables


class TestForward:
    def test_shapes(self, det_and_vars, rng):
        det, variables = det_and_vars
        pts0, n0 = make_cloud(rng)
        pts1, n1 = make_cloud(rng, 900)
        points = jnp.array(np.stack([pts0, pts1]))
        nums = jnp.array([n0, n1], jnp.int32)
        vox = det.voxelize_batch(points, nums)
        preds = det.apply(variables, vox, train=False)
        ny, nx = det.ny, det.nx
        assert preds["box_preds"].shape == (2, ny, nx, 14)
        assert preds["cls_preds"].shape == (2, ny, nx, 2)
        assert preds["dir_cls_preds"].shape == (2, ny, nx, 4)
        assert np.all(np.isfinite(np.asarray(preds["box_preds"])))

    def test_split_heads_match_concat_heads(self, rng):
        """rpn.no_concat_heads (models/rpn.py::_SplitHead) is a pure
        formulation change: conv1x1(concat(ups), W) == sum of per-branch
        einsums with W split on input channels. Same params must give the
        same heads either way (the concat never materializes on the fast
        path — ~1 ms/cloud at KITTI scale, probe_rpn_tail_variants.py)."""
        import jax.tree_util as tu

        from pillars_tpu.config import Config
        from pillars_tpu.models.rpn import RPN

        cfg = Config.default()
        x = jnp.asarray(rng.randn(1, 64, 80,
                                  cfg.model.pfn.num_filters).astype(
                                      np.float32))
        split = RPN(cfg.model)
        v = split.init(jax.random.PRNGKey(0), x, False)
        cat = RPN(cfg.override("model.rpn.no_concat_heads", False).model)
        # identical param tree -> checkpoints interchange between paths
        assert (tu.tree_structure(v)
                == tu.tree_structure(cat.init(jax.random.PRNGKey(0), x,
                                              False)))
        a = split.apply(v, x, False)
        b = cat.apply(v, x, False)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-4, atol=1e-4, err_msg=k)

    def test_split_heads_mixed_branch_widths(self, rng):
        """Non-uniform num_upsample_filters must work on the split-head
        path (promote_dtype is given the branches as separate args — a
        list would be jnp.asarray-STACKED and crash on mixed widths)."""
        from pillars_tpu.config import Config
        from pillars_tpu.models.rpn import RPN

        cfg = Config.default().override("model.rpn.num_upsample_filters",
                                        (64, 128, 128))
        x = jnp.asarray(rng.randn(1, 64, 80,
                                  cfg.model.pfn.num_filters).astype(
                                      np.float32))
        net = RPN(cfg.model)
        v = net.init(jax.random.PRNGKey(0), x, False)
        out = net.apply(v, x, False)
        assert out["box_preds"].shape == (1, 64, 80,
                                          2 * cfg.model.box_code_size)
        cat = RPN(cfg.override("model.rpn.no_concat_heads", False).model)
        ref = cat.apply(v, x, False)
        for k in out:
            np.testing.assert_allclose(np.asarray(out[k]),
                                       np.asarray(ref[k]),
                                       rtol=1e-4, atol=1e-4, err_msg=k)

    def test_batch_stats_update_in_train(self, det_and_vars, rng):
        det, variables = det_and_vars
        pts, n = make_cloud(rng)
        points = jnp.array(np.stack([pts, pts]))
        nums = jnp.array([n, n], jnp.int32)
        vox = det.voxelize_batch(points, nums)
        preds, new_state = det.apply(variables, vox, train=True,
                                     mutable=["batch_stats"])
        old = variables["batch_stats"]["pfn"]["bn"]["mean"]
        new = new_state["batch_stats"]["pfn"]["bn"]["mean"]
        assert not np.allclose(np.asarray(old), np.asarray(new))

    def test_padding_invariance(self, det_and_vars, rng):
        """The same cloud with different amounts of padding must produce the
        same predictions (padding must be inert end to end)."""
        det, variables = det_and_vars
        pts, n = make_cloud(rng, 800)
        pts2 = pts.copy()
        pts2[n:] = 123.0  # garbage in the padding region
        points = jnp.array(np.stack([pts, pts2]))
        nums = jnp.array([n, n], jnp.int32)
        vox = det.voxelize_batch(points, nums)
        preds = det.apply(variables, vox, train=False)
        np.testing.assert_allclose(
            np.asarray(preds["box_preds"][0]), np.asarray(preds["box_preds"][1]),
            atol=1e-5)


class TestLossSemantics:
    def test_focal_loss_formula(self, rng):
        cfg = CFG.model.loss
        logits = rng.randn(2, 16, 1).astype(np.float32)
        targets = (rng.rand(2, 16, 1) > 0.7).astype(np.float32)
        weights = rng.rand(2, 16).astype(np.float32)
        got = np.asarray(L.sigmoid_focal_loss(
            cfg, jnp.array(logits), jnp.array(targets), jnp.array(weights)))
        # direct NumPy transcription of reference voxelnet.py:237-363
        ce = np.clip(logits, 0, 10000) - logits * targets + np.log1p(
            np.exp(-np.abs(logits)))
        probs = 1 / (1 + np.exp(-logits))
        p_t = targets * probs + (1 - targets) * (1 - probs)
        want = ((1 - p_t) ** 2.0 * (targets * 0.25 + (1 - targets) * 0.75)
                * ce * weights[..., None])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_smooth_l1_formula(self, rng):
        cfg = CFG.model.loss
        preds = rng.randn(2, 8, 7).astype(np.float32)
        targets = rng.randn(2, 8, 7).astype(np.float32)
        weights = rng.rand(2, 8).astype(np.float32)
        got = np.asarray(L.weighted_smooth_l1_loss(
            cfg, jnp.array(preds), jnp.array(targets), jnp.array(weights)))
        sigma = 3.0
        diff = preds - targets
        ad = np.abs(diff)
        lt = (ad <= 1 / sigma**2).astype(np.float32)
        want = (lt * 0.5 * (ad * sigma) ** 2 + (ad - 0.5 / sigma**2) * (1 - lt))
        want = want * weights[..., None]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_prepare_loss_weights(self):
        labels = jnp.array([[1, 0, -1, 1, 0, 0]])
        cls_w, reg_w, cared = L.prepare_loss_weights(labels, CFG.model.loss)
        # 2 positives -> normalizer 2
        np.testing.assert_allclose(np.asarray(reg_w),
                                   [[0.5, 0, 0, 0.5, 0, 0]])
        np.testing.assert_allclose(np.asarray(cls_w),
                                   [[0.5, 0.5, 0, 0.5, 0.5, 0.5]])
        np.testing.assert_array_equal(np.asarray(cared),
                                      [[True, True, False, True, True, True]])

    def test_direction_target(self):
        anchors = jnp.zeros((1, 4, 7)).at[..., 6].set(
            jnp.array([[0.0, 1.57, 0.0, 1.57]]))
        reg = jnp.zeros((1, 4, 7)).at[..., 6].set(
            jnp.array([[0.5, -2.0, -0.1, 0.2]]))
        tgt = np.asarray(L.get_direction_target(anchors, reg))
        # rot_gt = [0.5, -0.43, -0.1, 1.77] -> dir = [1, 0, 0, 1]
        np.testing.assert_allclose(tgt[0, :, 1], [1, 0, 0, 1])

    def test_detection_loss_matches_helper_formulation(self, rng):
        """The live lane-major detection_loss must equal the helper-based
        anchor-major formulation (the helpers ARE the formula oracles,
        each pinned against reference voxelnet.py above). Guards against
        drift in the fused inline rewrite (ADVICE r1)."""
        cfg = CFG.model.loss
        B, H, W, T, C = 2, 4, 6, 2, 1
        A = H * W * T
        box_preds = rng.randn(B, H, W, T * 7).astype(np.float32)
        cls_preds = rng.randn(B, H, W, T * C).astype(np.float32)
        dir_preds = rng.randn(B, H, W, T * 2).astype(np.float32)
        anchors = rng.randn(A, 7).astype(np.float32)
        labels = rng.randint(-1, 2, (B, A)).astype(np.int32)
        labels[:, :3] = 1  # ensure positives exist
        reg_targets = rng.randn(B, A, 7).astype(np.float32)

        got = L.detection_loss(
            cfg, C, jnp.array(box_preds), jnp.array(cls_preds),
            jnp.array(dir_preds), jnp.array(anchors), jnp.array(labels),
            jnp.array(reg_targets))

        # helper-based anchor-major twin. Head [B,H,W,T*f] -> [B,A,f]
        # with a = (h*W + w)*T + t, the same anchor order detection_loss
        # uses internally.
        bp = jnp.array(box_preds.reshape(B, A, 7))
        cp = jnp.array(cls_preds.reshape(B, A, C))
        dp = jnp.array(dir_preds.reshape(B, A, 2))
        rt = jnp.array(reg_targets)
        lab = jnp.array(labels)
        cls_w, reg_w, cared = L.prepare_loss_weights(lab, cfg)
        cls_t = lab * cared.astype(lab.dtype)
        one_hot = jax.nn.one_hot(cls_t, C + 1, dtype=jnp.float32)[..., 1:]
        # sin-difference encoding (reference voxelnet.py:63-69)
        rp, rtt = bp[..., 6:7], rt[..., 6:7]
        bp_sin = jnp.concatenate(
            [bp[..., :6], jnp.sin(rp) * jnp.cos(rtt)], axis=-1)
        rt_sin = jnp.concatenate(
            [rt[..., :6], jnp.cos(rp) * jnp.sin(rtt)], axis=-1)
        loc = L.weighted_smooth_l1_loss(cfg, bp_sin, rt_sin, reg_w)
        cls = L.sigmoid_focal_loss(cfg, cp, one_hot, cls_w)
        loc_red = jnp.sum(loc) / B * cfg.localization_weight
        cls_red = jnp.sum(cls) / B * cfg.classification_weight
        dir_t = L.get_direction_target(jnp.array(anchors)[None], rt)
        dw = (lab > 0).astype(jnp.float32)
        dw = dw / jnp.clip(jnp.sum(dw, -1, keepdims=True), 1.0, 9999999.0)
        dirl = L.softmax_direction_loss(dp, dir_t, dw)
        dir_red = jnp.sum(dirl) / B * cfg.direction_weight

        np.testing.assert_allclose(float(got.loc_loss_reduced),
                                   float(loc_red), rtol=1e-5)
        np.testing.assert_allclose(float(got.cls_loss_reduced),
                                   float(cls_red), rtol=1e-5)
        np.testing.assert_allclose(float(got.dir_loss_reduced),
                                   float(dir_red), rtol=1e-5)
        np.testing.assert_allclose(
            float(got.loss), float(loc_red + cls_red + dir_red), rtol=1e-5)

    def test_total_loss_finite_and_positive(self, det_and_vars, rng):
        det, variables = det_and_vars
        pts, n = make_cloud(rng)
        points = jnp.array(np.stack([pts, pts]))
        nums = jnp.array([n, n], jnp.int32)
        vox = det.voxelize_batch(points, nums)
        preds = det.apply(variables, vox, train=False)
        A = det.anchor_set.anchors.shape[0]
        labels = jnp.zeros((2, A), jnp.int32).at[:, :5].set(1)
        reg_targets = jnp.zeros((2, A, 7)).at[:, :5, :].set(0.3)
        out = det.loss(preds, labels, reg_targets)
        assert np.isfinite(float(out.loss)) and float(out.loss) > 0
        assert float(out.loc_loss_reduced) > 0
        assert float(out.cls_loss_reduced) > 0
        assert float(out.dir_loss_reduced) > 0


class TestPostprocess:
    def test_crafted_peak_detected(self, det_and_vars, rng):
        """Hand-build head outputs with one hot anchor; the postprocess must
        return exactly that box, decoded, with the direction flip applied."""
        det, _ = det_and_vars
        A = det.anchor_set.anchors.shape[0]
        ny, nx = det.ny, det.nx
        cls = np.full((1, ny, nx, 2), -10.0, np.float32)
        box = np.zeros((1, ny, nx, 14), np.float32)
        dirp = np.zeros((1, ny, nx, 4), np.float32)

        target_anchor = 5001  # odd -> rotation pi/2 anchor
        loc = target_anchor // 2
        yy, xx = loc // nx, loc % nx
        a_in_loc = target_anchor % 2
        cls[0, yy, xx, a_in_loc] = 4.0  # sigmoid ~ 0.982
        residual = np.array([0.1, -0.2, 0.05, 0.0, 0.1, 0.0, 0.2], np.float32)
        box[0, yy, xx, a_in_loc * 7:(a_in_loc + 1) * 7] = residual
        dirp[0, yy, xx, a_in_loc * 2:(a_in_loc + 1) * 2] = [5.0, -5.0]  # dir=0

        preds = {"box_preds": jnp.array(box), "cls_preds": jnp.array(cls),
                 "dir_cls_preds": jnp.array(dirp)}
        amask = jnp.ones((1, A), bool)
        eye = jnp.eye(4)[None]
        out = det.postprocess(preds, amask, eye, eye)

        valid = np.asarray(out.valid[0])
        assert valid.sum() >= 1
        scores = np.asarray(out.scores[0])
        assert scores[0] == pytest.approx(1 / (1 + np.exp(-4.0)), rel=1e-4)
        got = np.asarray(out.boxes_lidar[0, 0])
        from pillars_tpu.geometry import boxes as gb
        want = np.asarray(gb.second_box_decode(
            jnp.array(residual[None]),
            jnp.array(det.anchor_set.anchors[target_anchor][None])))[0].copy()
        # dir label 0, decoded rot = 0.2 + 1.57 > 0 -> opp -> +pi
        want[6] += np.pi
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_all_masked_returns_invalid(self, det_and_vars):
        det, _ = det_and_vars
        A = det.anchor_set.anchors.shape[0]
        ny, nx = det.ny, det.nx
        preds = {
            "box_preds": jnp.zeros((1, ny, nx, 14)),
            "cls_preds": jnp.zeros((1, ny, nx, 2)),
            "dir_cls_preds": jnp.zeros((1, ny, nx, 4)),
        }
        amask = jnp.zeros((1, A), bool)
        eye = jnp.eye(4)[None]
        out = det.postprocess(preds, amask, eye, eye)
        assert not np.asarray(out.valid).any()


class TestInferenceFn:
    def test_end_to_end_jit(self, det_and_vars, rng):
        det, variables = det_and_vars
        infer = det.make_inference_fn()
        pts, n = make_cloud(rng)
        eye = jnp.eye(4)[None]
        out = infer(variables, jnp.array(pts[None]), jnp.array([n], jnp.int32),
                    eye, eye)
        assert out.boxes_lidar.shape == (1, 50, 7)
        assert out.scores.shape == (1, 50)
        assert np.all(np.isfinite(np.asarray(out.boxes_lidar)))


class TestDepthwiseShiftAdd:
    """depthwise_shift_add must match the grouped-conv lowering exactly
    (same kernel), for every padding/stride case the RPN uses, in both
    values and gradients — it is an alternative LOWERING, not a new op."""

    CASES = [
        ("SAME", 1),              # block conv1..N
        (((1, 1), (1, 1)), 1),    # block1 conv0 (explicit pad, stride 1)
        (((1, 1), (1, 1)), 2),    # block2/3 conv0 (explicit pad, stride 2)
    ]

    def _grouped(self, x, kernel, stride, padding):
        import jax
        return jax.lax.conv_general_dilated(
            x, kernel, (stride, stride),
            padding if padding != "SAME" else "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
            precision=jax.lax.Precision.HIGHEST)

    @pytest.mark.parametrize("padding,stride", CASES)
    def test_values_and_grads_match_grouped_conv(self, padding, stride):
        import jax
        import jax.numpy as jnp

        from pillars_tpu.models.layers import depthwise_shift_add

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 12, 10, 8).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 1, 8).astype(np.float32))

        ref = self._grouped(x, k, stride, padding)
        got = depthwise_shift_add(x, k, stride, padding)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

        def loss_sa(x, k):
            return jnp.sum(jnp.sin(depthwise_shift_add(x, k, stride,
                                                       padding)))

        def loss_gc(x, k):
            return jnp.sum(jnp.sin(self._grouped(x, k, stride, padding)))

        gx_sa, gk_sa = jax.grad(loss_sa, argnums=(0, 1))(x, k)
        gx_gc, gk_gc = jax.grad(loss_gc, argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx_sa), np.asarray(gx_gc),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk_sa), np.asarray(gk_gc),
                                   rtol=1e-5, atol=1e-5)

    def test_separable_conv_param_tree_interchanges(self):
        """shift_add=True produces the identical param tree and the same
        outputs as the grouped-conv SeparableConv given the same params."""
        import jax
        import jax.numpy as jnp

        from pillars_tpu.models.layers import SeparableConv

        x = jnp.asarray(np.random.RandomState(1)
                        .randn(1, 8, 8, 4).astype(np.float32))
        m_gc = SeparableConv(6, 3, 1, padding="SAME")
        m_sa = SeparableConv(6, 3, 1, padding="SAME", shift_add=True)
        v = m_gc.init(jax.random.PRNGKey(0), x)
        v2 = m_sa.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v2))
        np.testing.assert_allclose(np.asarray(m_sa.apply(v, x)),
                                   np.asarray(m_gc.apply(v, x)),
                                   rtol=1e-5, atol=1e-5)
