"""Fault-tolerance of the headline benchmark capture (VERDICT r3 #1).

BENCH_r03 was rc=1: a one-shot capture died on a transient relay
FAILED_PRECONDITION while an immediate rerun measured 819 clouds/s. These
tests pin the two defenses: (a) the retry harness itself
(pillars_tpu/utils/faults.py) — transient backend faults retry after a
client reset, programmer errors raise immediately; (b) bench._measure
survives an injected first-attempt FAILED_PRECONDITION and still returns
a finite measurement (the verdict's explicit done-bar)."""

import numpy as np
import pytest

import bench
from pillars_tpu.utils import faults


class FakeXlaRuntimeError(Exception):
    """Name-matched stand-in for jaxlib's XlaRuntimeError (faults.py
    classifies by type NAME so injected fakes behave like the real one)."""


FakeXlaRuntimeError.__name__ = "XlaRuntimeError"


# ---------------------------------------------------------------------------
# with_retries / is_transient units
# ---------------------------------------------------------------------------

def test_transient_fault_retries_then_succeeds():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise FakeXlaRuntimeError("FAILED_PRECONDITION: relay dropped")
        return 42

    assert faults.with_retries(flaky, attempts=3, sleep_s=0.0,
                               reset=False) == 42
    assert calls["n"] == 2


def test_transient_by_message_marker():
    # generic Exception type, but a status-code message -> still retried
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: socket closed")
        return "ok"

    assert faults.with_retries(flaky, attempts=3, sleep_s=0.0,
                               reset=False) == "ok"
    assert calls["n"] == 3


def test_non_transient_raises_immediately():
    calls = {"n": 0}

    def buggy():
        calls["n"] += 1
        raise TypeError("shapes do not broadcast")

    with pytest.raises(TypeError):
        faults.with_retries(buggy, attempts=3, sleep_s=0.0, reset=False)
    assert calls["n"] == 1  # a programmer error must not eat retries


def test_exhausted_attempts_raise_last_error():
    def always_down():
        raise FakeXlaRuntimeError("DEADLINE_EXCEEDED")

    with pytest.raises(FakeXlaRuntimeError):
        faults.with_retries(always_down, attempts=2, sleep_s=0.0,
                            reset=False)


def test_is_transient_classification():
    assert faults.is_transient(
        FakeXlaRuntimeError("anything at all"))  # by type name
    assert faults.is_transient(RuntimeError("FAILED_PRECONDITION: x"))
    assert faults.is_transient(ConnectionError("reset"))
    assert not faults.is_transient(ValueError("bad bucket spec"))
    assert not faults.is_transient(AssertionError("loss not finite"))


def test_reset_backend_session_survives():
    """reset_backend must leave a usable jax session behind: the virtual
    8-device CPU platform re-registers and fresh computations run."""
    import jax
    import jax.numpy as jnp

    faults.reset_backend()
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) >= 8
    assert float(jnp.sum(jnp.arange(4.0))) == 6.0


# ---------------------------------------------------------------------------
# bench integration: injected first-attempt fault still yields a number
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def small_setup():
    import jax

    from pillars_tpu.config import Config
    from pillars_tpu.models.detector import PillarsDetector

    cfg = Config.default()
    cfg = cfg.override("model.voxel.max_voxels", 1024)
    cfg = cfg.override("model.voxel.max_points", 4096)
    det = PillarsDetector(cfg)
    variables = jax.device_get(det.init(jax.random.PRNGKey(0),
                                        batch_size=1))
    return det, variables, cfg


def test_measure_survives_injected_failed_precondition(monkeypatch,
                                                       small_setup):
    """The verdict's done-bar: monkeypatch device_get to fail once with
    FAILED_PRECONDITION; the measurement must still complete (retry after
    backend reset, full timed section re-run) and return finite ms."""
    import jax

    det, variables, cfg = small_setup
    calls = {"n": 0}
    real_device_get = jax.device_get

    def flaky_device_get(x):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FakeXlaRuntimeError(
                "FAILED_PRECONDITION: relay stream aborted")
        return real_device_get(x)

    monkeypatch.setattr(jax, "device_get", flaky_device_get)
    monkeypatch.setattr(faults.time, "sleep", lambda s: None)
    ms = bench._measure(det, variables, cfg, batch=1, n_clouds=2, reps=1)
    assert np.isfinite(ms)
    assert calls["n"] > 1  # first attempt died, later ones ran


def test_measure_plain_path_returns_finite(small_setup):
    det, variables, cfg = small_setup
    ms = bench._measure(det, variables, cfg, batch=1, n_clouds=2, reps=1)
    assert np.isfinite(ms)


def test_bench_graph_has_no_device_closure_constants(small_setup):
    """The measurement graph must not close over DEVICE arrays: lowering
    such constants performs a trace-time D2H (_array_mlir_constant_handler
    — the exact r3 crash site). All device operands are explicit jit
    arguments; any constants remaining in the jaxpr (anchor tables) must
    be host NumPy, whose embedding needs no device round trip."""
    import jax

    det, variables, cfg = small_setup
    pts, num, eye = bench._build_bank(cfg, batch=1, n_clouds=2)
    run, _ = bench._make_run(det, cfg, batch=1)
    closed = jax.make_jaxpr(run)(variables, pts, num, eye, 1)
    device_consts = [c for c in closed.consts if isinstance(c, jax.Array)]
    assert not device_consts, (
        f"{len(device_consts)} device-array closure constants leaked into "
        f"the bench graph: shapes {[c.shape for c in device_consts]}")


def test_entry_example_args_are_host_arrays():
    """__graft_entry__.entry(): weights travel as example args (host
    pytree), never as closure constants — the driver's compile check must
    not depend on a trace-time D2H either."""
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    leaves = jax.tree_util.tree_leaves(args)
    assert leaves, "entry() returned no example args"
    for leaf in leaves:
        assert isinstance(leaf, np.ndarray), (
            f"example arg leaf is {type(leaf)}, expected host np.ndarray")
    # the full-scale compile itself is the driver's job (and
    # `python __graft_entry__.py`); here we pin the contract shape only
    assert callable(fn)
