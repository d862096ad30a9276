"""Device ops: the TPU-native equivalents of the reference's numba/CUDA
kernels (SURVEY.md §2.1/§2.2) — all pure jitted JAX with static shapes.

- ``voxelize``  — pillar voxelizer (replaces _points_to_voxel_reverse_kernel)
- ``scatter``   — pillar->BEV-canvas scatter (replaces PointPillarsScatter)
- ``anchors``   — static anchor generation + summed-area-table anchors mask
- ``nms``       — greedy standup-box NMS (replaces nms_gpu bitmask kernel)
- ``targets``   — jittable target assigner (replaces create_target_np)
"""
