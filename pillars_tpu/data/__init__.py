"""Data subsystem: offline prep (KITTI-format infos + GT database), host
augmentation pipeline, GT-database sampler, device-prefetching loader,
streaming source, and a synthetic dataset generator for tests/benchmarks."""
