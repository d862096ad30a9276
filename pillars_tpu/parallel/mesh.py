"""Mesh + sharding helpers.

Single-axis data-parallel mesh by default (batch axis sharded over ICI);
the helpers are axis-name-generic so larger meshes (e.g. ('dcn', 'data'))
compose without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D device mesh over the first ``num_devices`` devices (0 = all)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(data: int, spatial: int,
                 axis_names: Sequence[str] = ("data", "spatial"),
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D mesh composing batch data-parallelism with BEV-grid spatial
    model parallelism (parallel/spatial.py). Batch shards over axis 0,
    canvas/head tensors over axis 1."""
    devs = list(devices if devices is not None else jax.devices())
    assert len(devs) >= data * spatial, (
        f"need {data * spatial} devices, have {len(devs)}")
    return Mesh(np.array(devs[:data * spatial]).reshape(data, spatial),
                tuple(axis_names))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """device_put every leaf with its batch axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
