"""Streaming train-time classification metrics.

reference libraries/metrics.py:33-198 (Accuracy / PrecisionRecall / Scalar
as Keras models with tf.Variable state — imported but unused in the live
path, "metrics is currently not used", reference train.py:48). Provided
here as plain accumulators so train-time precision/recall panels are
available without an eval pass.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


class Scalar:
    """Running mean (reference metrics.py Scalar)."""

    def __init__(self):
        self._total = 0.0
        self._count = 0

    def update(self, value: float) -> None:
        self._total += float(value)
        self._count += 1

    @property
    def value(self) -> float:
        return self._total / max(self._count, 1)

    def clear(self):
        self._total = 0.0
        self._count = 0


class Accuracy:
    """Thresholded binary accuracy over sigmoid scores, ignoring labels < 0
    (reference metrics.py Accuracy: encode_background_as_zeros path)."""

    def __init__(self, threshold: float = 0.5):
        self.threshold = threshold
        self._correct = 0
        self._total = 0

    def update(self, labels: np.ndarray, scores: np.ndarray) -> None:
        labels = np.asarray(labels).reshape(-1)
        scores = np.asarray(scores).reshape(labels.shape[0], -1)
        cared = labels >= 0
        pred = (scores[:, -1] > self.threshold).astype(np.int64)
        correct = (pred == (labels > 0)) & cared
        self._correct += int(correct.sum())
        self._total += int(cared.sum())

    @property
    def value(self) -> float:
        return self._correct / max(self._total, 1)

    def clear(self):
        self._correct = 0
        self._total = 0


class PrecisionRecall:
    """Streaming precision/recall at several score thresholds
    (reference metrics.py PrecisionRecall with thresholds
    {.1,.3,.5,.7,.8,.9,.95})."""

    DEFAULT_THRESHOLDS = (0.1, 0.3, 0.5, 0.7, 0.8, 0.9, 0.95)

    def __init__(self, thresholds: Sequence[float] = DEFAULT_THRESHOLDS):
        self.thresholds = tuple(thresholds)
        n = len(self.thresholds)
        self._tp = np.zeros(n, np.int64)
        self._fp = np.zeros(n, np.int64)
        self._fn = np.zeros(n, np.int64)

    def update(self, labels: np.ndarray, scores: np.ndarray) -> None:
        labels = np.asarray(labels).reshape(-1)
        scores = np.asarray(scores).reshape(labels.shape[0], -1)[:, -1]
        cared = labels >= 0
        pos = (labels > 0) & cared
        for i, t in enumerate(self.thresholds):
            pred = (scores > t) & cared
            self._tp[i] += int((pred & pos).sum())
            self._fp[i] += int((pred & ~pos & cared).sum())
            self._fn[i] += int((~pred & pos).sum())

    @property
    def value(self) -> Dict[str, np.ndarray]:
        prec = self._tp / np.maximum(self._tp + self._fp, 1)
        rec = self._tp / np.maximum(self._tp + self._fn, 1)
        return {"precision": prec, "recall": rec,
                "thresholds": np.array(self.thresholds)}

    def clear(self):
        self._tp[:] = 0
        self._fp[:] = 0
        self._fn[:] = 0
