"""Stage timers with the reference's six stage names, plus jax.profiler
trace capture.

reference SURVEY §5.1: rolling last-10-sample windows for t_full_sample /
t_preprocess / t_network / t_predict / t_anno / t_rviz (train.py:629-861)
and the extended tier t_voxel_features / t_spatial_features / t_rpn /
t_nms_func (voxelnet.py:753-903). Names are preserved so numbers are
directly comparable to the reference logs.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque
from typing import Dict

import jax

STAGES = ("t_full_sample", "t_preprocess", "t_network", "t_predict",
          "t_anno", "t_rviz")


class StageTimer:
    """Rolling-window wall-clock stage timer (window=10 like the reference)."""

    def __init__(self, enabled: bool = True, window: int = 10,
                 sync: bool = False):
        self.enabled = enabled
        self.window = window
        self.sync = sync
        self._hist: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=window))

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        self._hist[name].append((time.perf_counter() - t0) * 1e3)

    def add(self, name: str, ms: float):
        if self.enabled:
            self._hist[name].append(ms)

    def averages(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self._hist.items() if v}

    def report(self) -> str:
        msg = ", ".join(f"{k}: {v:.2f}" for k, v in self.averages().items())
        print(msg)
        return msg


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time_ms(stage_fn, args, iters: int = 20) -> float:
    """Honest per-call device time (ms) for a jit-traceable ``stage_fn``.

    On relay-backed TPUs ``block_until_ready`` does NOT wait for device
    completion, so per-call wall clocks measure RPC dispatch. This runs the
    stage ``iters`` times inside ONE jitted fori_loop with an
    order-dependent scalar carry, forces execution with ``device_get``,
    and subtracts the measured sync round-trip baseline (the bench.py
    protocol, validated against v5e peak bf16 on a matmul chain)."""
    import time

    import jax.numpy as jnp

    def scalarize(out):
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype")
                  and jnp.issubdtype(jnp.asarray(l).dtype, jnp.number)]
        return sum((jnp.sum(l.astype(jnp.float32)) for l in leaves),
                   jnp.float32(0))

    @jax.jit
    def run(*a):
        def body(i, acc):
            # thread the carry into the stage INPUT: a loop-invariant body
            # gets hoisted by XLA's while-loop LICM and the clock would
            # report ~total/iters of one execution. Adding acc*0 to the
            # first float leaf makes each iteration data-depend on the
            # previous without changing the math.
            leaves, treedef = jax.tree_util.tree_flatten(a)
            for k, l in enumerate(leaves):
                if (hasattr(l, "dtype")
                        and jnp.issubdtype(l.dtype, jnp.number)):
                    leaves = (leaves[:k]
                              + [l + acc.astype(l.dtype) * 0]
                              + leaves[k + 1:])
                    break
            ap = jax.tree_util.tree_unflatten(treedef, leaves)
            return acc + scalarize(stage_fn(*ap))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    @jax.jit
    def sync(*a):
        return scalarize(jax.tree_util.tree_leaves(a)[0])

    args = jax.device_put(args)
    jax.device_get(run(*args))   # compile + warm
    jax.device_get(sync(*args))
    base = min(_timed(lambda: jax.device_get(sync(*args)))
               for _ in range(3))
    total = _timed(lambda: jax.device_get(run(*args)))
    return max(total - base, 0.0) * 1e3 / iters


def _timed(f) -> float:
    import time

    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0
