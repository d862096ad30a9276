"""ONE home for box geometry (the reference duplicated these helpers 3-4x
across load_data.py, libraries/eval_helper_functions.py, second/core/*).

- ``boxes``      — jnp implementations, safe under jit (device compute path).
- ``np_boxes``   — vectorized NumPy twins for the host data pipeline + tests.
- ``rotated_iou``— exact rotated-box IoU (polygon clipping): jnp branchless
                   version for device, NumPy twin for the eval harness.
"""

from pillars_tpu.geometry import boxes, np_boxes, rotated_iou  # noqa: F401
