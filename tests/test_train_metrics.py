"""Streaming train metrics (train/metrics.py) vs NumPy oracles, matching
the reference's libraries/metrics.py semantics (incl. its quirks)."""

import numpy as np
import jax
import jax.numpy as jnp

from pillars_tpu.train import metrics as M


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestScalar:
    def test_running_mean_skips_zeros(self):
        st = M.ScalarState.init()
        vals = [2.0, 0.0, 4.0, 0.0, 6.0]
        for v in vals:
            st = M.scalar_update(st, jnp.asarray(v))
        assert float(st.value) == 4.0  # mean of nonzeros only
        assert float(st.count) == 3.0


class TestAccuracy:
    def test_vs_oracle(self, rng):
        B, A, C = 2, 50, 3
        st = M.AccuracyState.init()
        total = count = 0.0
        for _ in range(3):
            labels = rng.randint(-1, C + 1, (B, A))
            preds = rng.randn(B, A, C).astype(np.float32)
            st = M.accuracy_update(st, jnp.asarray(labels),
                                   jnp.asarray(preds))
            scores = _sigmoid(preds)
            pred_lab = np.where(np.any(scores > 0.5, axis=-1),
                                np.argmax(preds, axis=-1) + 1, 0)
            w = (labels != -1).astype(np.float32)
            count += max(w.sum(), 1.0)
            total += float((pred_lab == labels).sum())  # unweighted quirk
        np.testing.assert_allclose(float(st.value), total / count,
                                   rtol=1e-6)


class TestPrecisionRecall:
    def test_vs_oracle(self, rng):
        B, A, C = 2, 80, 2
        st = M.PrecisionRecallState.init()
        nt = len(M.PR_THRESHOLDS)
        pt = np.zeros(nt)
        pc = np.zeros(nt)
        rt = np.zeros(nt)
        rc = np.zeros(nt)
        for _ in range(3):
            labels = rng.randint(-1, 2, (B, A))
            preds = rng.randn(B, A, C).astype(np.float32) * 2
            st = M.precision_recall_update(st, jnp.asarray(labels),
                                           jnp.asarray(preds))
            scores = _sigmoid(preds).max(-1)
            w = (labels != -1).astype(np.float32)
            trues = labels > 0
            for i, th in enumerate(M.PR_THRESHOLDS):
                p = scores > th
                tp = (w * (trues & p)).sum()
                fp = (w * (~trues & p)).sum()
                fn = (w * (trues & ~p)).sum()
                if tp + fn > 0:
                    rt[i] += tp
                    rc[i] += tp + fn
                if tp + fp > 0:
                    pt[i] += tp
                    pc[i] += tp + fp
        np.testing.assert_allclose(np.asarray(st.precision),
                                   pt / np.clip(pc, 1, 1e5), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st.recall),
                                   rt / np.clip(rc, 1, 1e5), rtol=1e-5)


class TestUpdateMetrics:
    def test_jit_and_keys(self, rng):
        B, A, C = 2, 40, 3
        st = M.TrainMetricsState.init()
        labels = jnp.asarray(rng.randint(-1, C + 1, (B, A)))
        preds = jnp.asarray(rng.randn(B, A, C).astype(np.float32))

        @jax.jit
        def step(st):
            return M.update_metrics(st, jnp.asarray(0.5), jnp.asarray(0.3),
                                    preds, labels, C)

        st2, ret = step(st)
        for key in ("cls_loss", "loc_loss", "rpn_acc", "prec@50", "rec@95"):
            assert key in ret
            assert np.isfinite(float(ret[key]))
        assert float(st2.rpn_cls_loss.count) == 1.0


class TestTrainStepWiring:
    def test_step_threads_metrics_state(self):
        """train.train_metrics=True: the fused train step must thread the
        streaming-metrics state and return finite running values with the
        PR-threshold keys (the reference's metrics.py was dead code,
        train.py:48 — here it is reachable product surface)."""
        import numpy as np
        from pillars_tpu.config import Config
        from pillars_tpu.models.detector import PillarsDetector
        from pillars_tpu.train.loop import create_train_state, make_train_step

        cfg = Config.default()
        cfg = cfg.override("model.voxel.max_voxels", 256)
        cfg = cfg.override("model.voxel.max_points", 1024)
        cfg = cfg.override("model.target.max_gt_boxes", 4)
        cfg = cfg.override("train.train_metrics", True)
        det = PillarsDetector(cfg)
        bs = 1
        state, tx = create_train_state(det, jax.random.PRNGKey(0), bs)
        # donate=True like the Trainer: a fresh TrainMetricsState's zero
        # leaves share one buffer, so donating it was a runtime error
        step = make_train_step(det, tx, donate=True, with_metrics=True)
        rng = np.random.RandomState(0)
        n = 200
        points = np.zeros((bs, 1024, 3), np.float32)
        points[:, :n, 0] = rng.uniform(0, 6.4, (bs, n))
        points[:, :n, 1] = rng.uniform(-2.5, 2.5, (bs, n))
        points[:, :n, 2] = rng.uniform(-2.9, 0.5, (bs, n))
        gt = np.zeros((bs, 4, 7), np.float32)
        gt[..., 3:6] = 1.0
        gt[:, 0] = [3.0, 0.0, -1.5, 0.6, 0.8, 1.73, 0.3]
        batch = dict(points=points,
                     num_points=np.full((bs,), n, np.int32),
                     gt_boxes=gt,
                     gt_classes=np.ones((bs, 4), np.int32),
                     gt_valid=np.pad(np.ones((bs, 1), bool),
                                     ((0, 0), (0, 3))))
        tm_state = M.TrainMetricsState.init()
        state2, tm2, metrics, values = step(state, tm_state, batch)
        state3, tm3, _, values3 = step(state2, tm2, batch)
        assert np.isfinite(float(metrics.loss))
        for key in ("rpn_acc", "cls_loss", "loc_loss", "prec@50", "rec@95"):
            assert key in values and np.isfinite(float(values3[key]))
        # the scalar streams actually accumulated across steps
        assert float(tm3.rpn_cls_loss.count) == 2.0
        assert float(tm3.rpn_acc.count) > float(tm2.rpn_acc.count)
