"""Bucketed static-shape inference dispatch.

XLA compiles one graph per static shape, and the voxelizer's dominant
cost — the cell-id compaction sort (ops/voxelize.py) — scales with the
STATIC ``model.voxel.max_points``, not with the cloud's real point
count. Real sensors fill a fraction of the worst case (a range-filtered
KITTI sweep is typically 15-60k points against the 131k budget), so a
single worst-case graph pays the worst-case sort on every frame.

``BucketedInference`` compiles a small ladder of point-count buckets
once each and dispatches every cloud to the smallest bucket that fits.
The weights are shared — no model parameter depends on ``max_points`` —
so the ladder costs only compile time (amortized by the persistent
compilation cache) and device code space, not memory for duplicate
variables.

This is the TPU-native replacement for the reference's dynamic-shaped
numba voxelizer (reference second/core/point_cloud/point_cloud_ops.py:8-57
returns however many voxels the cloud produced): where CUDA kernels take
runtime sizes, XLA takes a static ladder plus host-side dispatch.

Semantics: a cloud with ``n <= bucket`` points voxelizes IDENTICALLY in
every bucket that holds it — padding rows carry an out-of-range sentinel
cell id and sort to the tail regardless of how many there are, and the
per-cell point caps / first-in-input-order rules see the same valid
points in the same order (tests/test_bucketed.py pins this equality).
Clouds larger than the top bucket are truncated to it, exactly like the
fixed single-graph path truncates to ``max_points``.
"""

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = ["BucketedInference", "default_bucket_ladder", "parse_bucket_arg"]


def parse_bucket_arg(arg, max_points: int) -> Optional[Tuple[int, ...]]:
    """CLI bucket spec: None/'' -> None, 'auto' -> the default halving
    ladder from ``max_points``, 'a,b,c' -> explicit rungs.

    Validates up front: a malformed spec exits with a usage message
    instead of an int() traceback, and rungs above ``max_points`` are
    clamped with a warning — a rung wider than the model's point budget
    would dispatch an unwarmed graph mid-eval (2-10 min compile on the
    remote TPU) for zero benefit (ADVICE r3)."""
    if not arg:
        return None
    if arg == "auto":
        return default_bucket_ladder(int(max_points))
    try:
        rungs = tuple(int(b) for b in str(arg).split(","))
    except ValueError:
        raise SystemExit(
            f"--buckets: expected 'auto' or comma-separated point counts "
            f"(e.g. '32768,65536,131072'), got {arg!r}")
    if not rungs or any(b <= 0 for b in rungs):
        raise SystemExit(
            f"--buckets: rungs must be positive integers, got {arg!r}")
    over = [b for b in rungs if b > int(max_points)]
    if over:
        import sys

        sys.stderr.write(
            f"[buckets] rung(s) {over} exceed model.voxel.max_points="
            f"{int(max_points)}; clamping (a wider bucket than the model's "
            f"point budget never helps)\n")
        rungs = tuple(min(b, int(max_points)) for b in rungs)
    return tuple(sorted(set(rungs)))


def default_bucket_ladder(max_points: int, levels: int = 3,
                          min_bucket: int = 8192) -> Tuple[int, ...]:
    """Halving ladder topping out at ``max_points``: e.g. 131072 ->
    (32768, 65536, 131072). Never descends below ``min_bucket`` (tiny
    buckets save nothing — the network + postprocess stages don't scale
    with the point budget)."""
    out = [int(max_points)]
    for _ in range(levels - 1):
        nxt = out[-1] // 2
        if nxt < min_bucket:
            break
        out.append(nxt)
    return tuple(sorted(out))


class BucketedInference:
    """Host-side bucket selection over precompiled jitted graphs.

    Usage::

        bi = BucketedInference(cfg)           # ladder from cfg, or pass buckets=
        bi.warmup(variables)                   # optional: compile all now
        preds = bi(variables, points, num_valid, rect, trv2c)

    ``points`` is a host array ``[B, N, D]`` padded at the tail (the
    pipeline contract everywhere in this package); ``num_valid [B]``
    gives the real counts. The batch dispatches to the smallest bucket
    that holds ``max(num_valid)`` — per-sample buckets inside one batch
    would defeat the single fused graph.
    """

    def __init__(self, config, buckets: Optional[Sequence[int]] = None,
                 anchor_area_threshold: Optional[float] = None):
        from pillars_tpu.models.detector import PillarsDetector

        base = int(config.model.voxel.max_points)
        if buckets is None:
            buckets = default_bucket_ladder(base)
        buckets = tuple(sorted({int(b) for b in buckets}))
        if not buckets:
            raise ValueError("buckets must be non-empty")
        if any(b <= 0 for b in buckets):
            raise ValueError(f"buckets must be positive, got {buckets}")
        self.buckets = buckets
        self._threshold = anchor_area_threshold
        self._config = config
        self._detector_cls = PillarsDetector
        self._fns: Dict[int, object] = {}
        # one detector per bucket: the voxelizer's static shapes live on it
        self._dets: Dict[int, object] = {}

    # ------------------------------------------------------------------
    def select_bucket(self, n: int) -> int:
        """Smallest bucket >= n; the largest bucket when none fits
        (the cloud is then truncated, matching the fixed-graph path)."""
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _fn(self, bucket: int):
        fn = self._fns.get(bucket)
        if fn is None:
            cfg = self._config.override("model.voxel.max_points", bucket)
            # a bucket of n points can fill at most n pillars; clamping the
            # static pillar budget keeps the voxelizer's shape invariant
            # (max_voxels <= max_points) and is numerically free
            if cfg.model.voxel.max_voxels > bucket:
                cfg = cfg.override("model.voxel.max_voxels", bucket)
            det = self._detector_cls(cfg)
            fn = det.make_inference_fn(self._threshold)
            self._dets[bucket] = det
            self._fns[bucket] = fn
        return fn

    # ------------------------------------------------------------------
    def warmup(self, variables, batch_size: int = 1,
               num_features: Optional[int] = None):
        """Compile every bucket's graph up front (streaming callers must
        not pay a multi-minute compile on the first large frame)."""
        import jax
        import jax.numpy as jnp

        d = (num_features if num_features is not None
             else self._config.model.num_point_features)
        eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (batch_size, 1, 1))
        num = jnp.zeros((batch_size,), jnp.int32)
        for b in self.buckets:
            pts = jnp.zeros((batch_size, b, d), jnp.float32)
            # device_get-forced: on relay-attached devices
            # block_until_ready returns before the device finishes, so a
            # compile could otherwise land inside a measurement window
            jax.device_get(self._fn(b)(variables, pts, num, eye, eye).scores)

    # ------------------------------------------------------------------
    def __call__(self, variables, points, num_valid, rect, trv2c):
        import jax.numpy as jnp

        pts = np.asarray(points)
        num = np.asarray(num_valid, np.int32)
        n = int(num.max()) if num.size else 0
        b = self.select_bucket(n)
        if pts.shape[1] >= b:
            pts = pts[:, :b]
        else:
            pad = np.zeros(
                (pts.shape[0], b - pts.shape[1], pts.shape[2]), pts.dtype)
            pts = np.concatenate([pts, pad], axis=1)
        num = np.minimum(num, b)
        return self._fn(b)(variables, jnp.asarray(pts),
                           jnp.asarray(num), rect, trv2c)
