"""Self-checking honest-clock measurement harness (VERDICT r4 #3).

Three probe/bench sessions across rounds 3-4 were silently polluted by
chip/host contention and only caught by operator inspection (fwd-only
reading slower than its e2e superset; sync baseline drifting 2-3x during
the run).  Both failure modes are mechanically detectable, so this
harness builds the checks into the measurement protocol itself:

1. **Baseline drift gate** — the relay sync round-trip (the quantity the
   honest clock subtracts, bench.py methodology) is re-measured AFTER
   every timed section; if it moved beyond a threshold the measurement
   is marked polluted.  A drifting baseline means the subtraction is
   wrong and the whole session suspect.
2. **Ordering gate** — callers declare structural partial orders
   ("fwd_only is a DCE subset of e2e, so it cannot be slower"); any
   violated ordering rejects the session.
3. **Verdict** — ``verdict()`` prints one ``PASS``/``REJECT`` JSON line
   with the evidence (per-measurement baselines, drifts, violated
   orderings) so a rejected probe run can never be mistaken for data.

This replaces the reference's eyeball-tier timing review
(/root/reference/configs/train.yaml:14-15 ``measure_time`` print rows
pasted into config comments) with a machine-enforced protocol.

Usage:
    h = ProbeHarness(sync_fn)          # sync_fn: one device round-trip
    ms = h.measure("e2e", run_fn, n_iter)   # run_fn: full forced run
    h.expect_subset("fwd_only", "e2e")      # fwd_only ⊆ e2e graph
    report = h.verdict()                    # prints PASS/REJECT line
"""

from __future__ import annotations

import json
import time
from typing import Callable, Dict, List, Optional


class ProbeRejected(RuntimeError):
    """Raised by verdict(strict=True) when a session fails its gates."""


class ProbeHarness:
    def __init__(self, sync: Callable[[], None],
                 drift_frac: float = 0.35, drift_abs_ms: float = 3.0,
                 order_slack_frac: float = 0.05,
                 order_slack_abs_ms: float = 0.05,
                 baseline_reps: int = 3):
        """``sync``: one full host->device->host round-trip returning
        nothing of interest (e.g. ``jax.device_get`` of a trivial jitted
        reduce over a resident operand).  Its wall time is the relay sync
        baseline the honest clock subtracts.

        Drift tolerance is max(``drift_abs_ms``, ``drift_frac`` * pre);
        the defaults fit the observed quiet-session jitter of the ~25-30
        ms relay baseline (bench.py docstring) while catching the 2-3x
        swings that burned rounds 3-4."""
        self.sync = sync
        self.drift_frac = drift_frac
        self.drift_abs_ms = drift_abs_ms
        self.order_slack_frac = order_slack_frac
        self.order_slack_abs_ms = order_slack_abs_ms
        self.baseline_reps = baseline_reps
        self.results: Dict[str, float] = {}
        self.records: List[Dict] = []
        self._orderings: List[Dict] = []

    # ------------------------------------------------------------------
    def _baseline_ms(self) -> float:
        best = float("inf")
        for _ in range(self.baseline_reps):
            t0 = time.perf_counter()
            self.sync()
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    # ------------------------------------------------------------------
    def measure(self, name: str, run: Callable[[], None],
                n_iter: int) -> float:
        """Time ``run`` (which must force device completion itself, e.g.
        by ``device_get`` of an order-dependent scalar), subtract the
        pre-baseline, divide by ``n_iter``.  The post-baseline re-measure
        is the contention gate.  Returns per-iteration ms."""
        pre = self._baseline_ms()
        t0 = time.perf_counter()
        run()
        total = (time.perf_counter() - t0) * 1e3
        post = self._baseline_ms()
        ms = max(total - pre, 0.0) / n_iter
        drift = abs(post - pre)
        tol = max(self.drift_abs_ms, self.drift_frac * pre)
        rec = {"name": name, "ms_per_iter": round(ms, 4),
               "pre_base_ms": round(pre, 3), "post_base_ms": round(post, 3),
               "drift_ms": round(drift, 3), "drift_tol_ms": round(tol, 3),
               "polluted": drift > tol}
        self.records.append(rec)
        self.results[name] = ms
        return ms

    # ------------------------------------------------------------------
    def expect_subset(self, subset: str, superset: str) -> None:
        """Declare that graph ``subset`` is a DCE-subset of ``superset``
        and therefore cannot be slower (within slack).  Checked at
        verdict time against the recorded results."""
        self._orderings.append({"faster": subset, "slower": superset,
                                "kind": "subset"})

    def expect_faster(self, faster: str, slower: str) -> None:
        """Generic ordering expectation (same check, caller-asserted)."""
        self._orderings.append({"faster": faster, "slower": slower,
                                "kind": "asserted"})

    # ------------------------------------------------------------------
    def verdict(self, strict: bool = False,
                label: Optional[str] = None) -> Dict:
        """Evaluate gates, print one PASS/REJECT JSON line, return the
        full report.  ``strict=True`` raises ProbeRejected on REJECT so
        a polluted probe cannot accidentally publish numbers."""
        polluted = [r["name"] for r in self.records if r["polluted"]]
        violations = []
        for o in self._orderings:
            a, b = o["faster"], o["slower"]
            if a not in self.results or b not in self.results:
                continue
            slack = max(self.order_slack_abs_ms,
                        self.order_slack_frac * self.results[b])
            if self.results[a] > self.results[b] + slack:
                violations.append(
                    {**o, "faster_ms": round(self.results[a], 4),
                     "slower_ms": round(self.results[b], 4),
                     "slack_ms": round(slack, 4)})
        ok = not polluted and not violations
        report = {
            "verdict": "PASS" if ok else "REJECT",
            "polluted_measurements": polluted,
            "ordering_violations": violations,
            "measurements": self.records,
        }
        if label:
            report["label"] = label
        line = {"probe_verdict": report["verdict"]}
        if label:
            line["label"] = label
        if polluted:
            line["polluted"] = polluted
            line["evidence"] = [
                {k: r[k] for k in ("name", "pre_base_ms", "post_base_ms",
                                   "drift_ms", "drift_tol_ms")}
                for r in self.records if r["polluted"]]
        if violations:
            line["ordering_violations"] = violations
        print(json.dumps(line))
        if strict and not ok:
            raise ProbeRejected(json.dumps(line))
        return report


def jax_sync_fn(operand=None):
    """Standard sync callable for ProbeHarness on the live backend: one
    ``device_get`` of a trivial jitted reduce over a device-resident
    operand (the bench.py sync-baseline op)."""
    import jax
    import jax.numpy as jnp

    if operand is None:
        operand = jnp.zeros((8,), jnp.float32)
    operand = jax.device_put(operand)

    @jax.jit
    def reduce(x):
        return jnp.sum(jax.tree_util.tree_leaves(x)[0]
                       .astype(jnp.float32).ravel()[:8])

    jax.device_get(reduce(operand))  # compile outside the timed path

    def sync():
        jax.device_get(reduce(operand))

    return sync
