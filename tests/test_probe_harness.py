"""Tests for the self-checking probe harness (utils/probe_harness.py;
VERDICT r4 #3 — automate the contention rejection that was previously a
prose rule in TODO.md)."""

import json

import pytest

from pillars_tpu.utils.probe_harness import (ProbeHarness, ProbeRejected,
                                             jax_sync_fn)


class FakeClock:
    """Deterministic perf_counter stand-in: pop scripted durations."""

    def __init__(self, monkeypatch, durations):
        self.t = 0.0
        self.durations = list(durations)
        import pillars_tpu.utils.probe_harness as ph

        monkeypatch.setattr(ph.time, "perf_counter", self.now)

    def now(self):
        return self.t

    def advance(self, dt):
        self.t += dt


def _scripted_harness(monkeypatch, sync_ms_sequence, **kw):
    """Harness whose sync() consumes scripted per-call durations (ms)."""
    clock = FakeClock(monkeypatch, [])
    seq = [s / 1e3 for s in sync_ms_sequence]

    def sync():
        clock.advance(seq.pop(0))

    return ProbeHarness(sync, baseline_reps=1, **kw), clock


class TestProbeHarness:
    def test_clean_session_passes(self, monkeypatch, capsys):
        # pre-baseline 25ms, run 125ms (=> 100ms/10 iters), post 26ms
        h, clock = _scripted_harness(monkeypatch, [25.0, 26.0])
        ms = h.measure("e2e", lambda: clock.advance(0.125), n_iter=10)
        assert abs(ms - 10.0) < 1e-9
        report = h.verdict()
        assert report["verdict"] == "PASS"
        line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert line["probe_verdict"] == "PASS"

    def test_injected_polluted_baseline_rejects(self, monkeypatch, capsys):
        """The round-3/4 failure mode: a contending job lands mid-run and
        the sync baseline drifts 25 -> 75 ms. Must REJECT with evidence."""
        h, clock = _scripted_harness(monkeypatch, [25.0, 75.0])
        h.measure("e2e", lambda: clock.advance(0.125), n_iter=10)
        report = h.verdict()
        assert report["verdict"] == "REJECT"
        assert report["polluted_measurements"] == ["e2e"]
        line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert line["probe_verdict"] == "REJECT"
        assert line["evidence"][0]["drift_ms"] == 50.0

    def test_small_drift_within_tolerance(self, monkeypatch):
        # 25 -> 30 ms is within max(3, 0.35*25)=8.75 ms tolerance
        h, clock = _scripted_harness(monkeypatch, [25.0, 30.0])
        h.measure("x", lambda: clock.advance(0.1), n_iter=1)
        assert h.verdict()["verdict"] == "PASS"

    def test_impossible_ordering_rejects(self, monkeypatch):
        """fwd_only is a DCE subset of e2e; fwd_only slower => REJECT
        (the exact symptom of the two discarded round-4 lever runs)."""
        h, clock = _scripted_harness(monkeypatch, [25.0, 25.0, 25.0, 25.0])
        h.measure("e2e", lambda: clock.advance(0.125), n_iter=10)   # 10 ms
        h.measure("fwd_only", lambda: clock.advance(0.185), n_iter=10)  # 16
        h.expect_subset("fwd_only", "e2e")
        report = h.verdict()
        assert report["verdict"] == "REJECT"
        v = report["ordering_violations"][0]
        assert v["faster"] == "fwd_only" and v["slower"] == "e2e"

    def test_ordering_slack_tolerates_noise(self, monkeypatch):
        # subset 2% slower than superset: inside the 5% slack, PASS
        h, clock = _scripted_harness(monkeypatch, [25.0] * 4)
        h.measure("e2e", lambda: clock.advance(0.125), n_iter=10)
        h.measure("fwd_only", lambda: clock.advance(0.127), n_iter=10)
        h.expect_subset("fwd_only", "e2e")
        assert h.verdict()["verdict"] == "PASS"

    def test_strict_mode_raises(self, monkeypatch):
        h, clock = _scripted_harness(monkeypatch, [25.0, 200.0])
        h.measure("x", lambda: clock.advance(0.1), n_iter=1)
        with pytest.raises(ProbeRejected):
            h.verdict(strict=True)

    def test_pre_baseline_subtracted(self, monkeypatch):
        # total 50ms wall includes the 25ms sync tax exactly once
        h, clock = _scripted_harness(monkeypatch, [25.0, 25.0])
        ms = h.measure("x", lambda: clock.advance(0.050), n_iter=5)
        assert abs(ms - 5.0) < 1e-9

    def test_jax_sync_fn_runs_on_cpu(self):
        sync = jax_sync_fn()
        sync()  # must not raise; one device round-trip

    def test_live_measure_smoke(self):
        """End-to-end on the CPU backend with a real jitted workload."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        x = jax.device_put(np.ones((128, 128), np.float32))

        @jax.jit
        def work(x, iters):
            def body(i, acc):
                return acc + jnp.sum(jnp.tanh(x + acc * 0) @ x)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        jax.device_get(work(x, 1))  # warm
        h = ProbeHarness(jax_sync_fn(x))
        ms = h.measure("work", lambda: jax.device_get(work(x, 50)), 50)
        assert ms >= 0.0
        assert h.verdict()["verdict"] in ("PASS", "REJECT")  # no crash
