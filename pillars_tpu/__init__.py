"""pillars_tpu — a TPU-native (JAX/XLA/Pallas) 3D object-detection framework.

A from-scratch rebuild of the capabilities of
krullgit/3D-Object-Detection-for-autonomous-navigation (PointPillars pedestrian
detection on Intel RealSense d435i pointclouds), redesigned TPU-first:

- static-shape, fully jitted compute path (voxelize -> PFN -> scatter -> RPN
  -> decode -> NMS) that runs as ONE XLA graph per step,
- host-side code restricted to irregular data augmentation and IO,
- data parallelism via jax.sharding.Mesh / pjit over ICI,
- one geometry library (the reference duplicated its box ops 3-4x).

Reference entry points (train.py:936-937) map to ``pillars_tpu.cli``.
"""

__version__ = "0.1.0"
