"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the pattern the reference lacked —
SURVEY.md §4 'multi-node testing: N/A').

Note: this image registers a TPU PJRT plugin from sitecustomize.py at
interpreter startup, so JAX is already imported when pytest starts; we must
switch platforms via jax.config, not env vars."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated suite runs skip identical XLA compiles
# (shared helper — env var alone would be too late, sitecustomize already
# imported jax; warns instead of silently losing the cache)
import sys  # noqa: E402
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pillars_tpu.utils.compile_cache import set_compile_cache  # noqa: E402

set_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
