"""Model layer: PillarFeatureNet, SSD-style RPN (separable convs), losses,
and the end-to-end detector (the reference's VoxelNet, model/voxelnet.py:725),
re-built as pure flax modules over static shapes."""

from pillars_tpu.models.detector import PillarsDetector  # noqa: F401
