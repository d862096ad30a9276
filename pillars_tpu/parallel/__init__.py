"""Distributed execution over a jax.sharding.Mesh — a NEW capability the
reference lacks entirely (SURVEY.md §2.4: no NCCL/MPI/Gloo anywhere; single
process, single GPU).

Design: the global-batch train/eval step is ONE jitted function with batch
arguments sharded over the 'data' mesh axis; XLA partitions the graph and
inserts the gradient all-reduces over ICI automatically. Collectives stay
axis-name-generic so a DCN data axis composes later.
"""

from pillars_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_mesh_2d,
    replicated_sharding,
    shard_batch,
)
