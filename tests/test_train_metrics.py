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
