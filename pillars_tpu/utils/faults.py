"""Retry harness for transient TPU-backend faults.

The TPU on this rig is reached through a relay that occasionally surfaces
one-off RPC-layer faults (``FAILED_PRECONDITION``, ``UNAVAILABLE``, ...)
on an otherwise healthy program: the round-3 benchmark capture died in
trace-time constant lowering on exactly such a fault while an immediate
rerun of the same code measured 819 clouds/s (VERDICT r3). Headline
artifacts (bench.py, __graft_entry__.py) must not depend on relay luck,
so they route their device work through :func:`with_retries`.

Policy: only *backend-shaped* failures retry (XLA runtime / RPC errors,
classified by :func:`is_transient`); Python-level bugs (TypeError, bad
shapes, assertion failures) raise immediately — retrying those would only
hide them. Between attempts the jit caches and (where the API allows) the
PJRT clients are dropped so the next attempt reconnects fresh; with
``JAX_COMPILATION_CACHE_DIR`` set the re-compile after a reset is a
persistent-cache hit, not a multi-minute rebuild.

No reference counterpart (the reference's CUDA stack is local; this is
rig-specific hardening demanded by the r3 verdict, item #1).
"""

from __future__ import annotations

import sys
import time
from typing import Callable, TypeVar

T = TypeVar("T")

# gRPC/absl status names that mark a backend-transport fault, plus the
# socket-level strings the relay surfaces when the tunnel drops.
_TRANSIENT_MARKERS = (
    "FAILED_PRECONDITION",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "CANCELLED",
    "INTERNAL",
    "UNKNOWN:",
    "socket closed",
    "connection reset",
    "broken pipe",
    "transport",
)

# exception type names that are backend failures by construction (we match
# by name, not import, so this works across jaxlib layouts and fake
# exceptions injected by tests).
_TRANSIENT_TYPES = ("XlaRuntimeError", "RpcError", "ConnectionError",
                    "BrokenPipeError", "OSError", "TimeoutError")


def is_transient(exc: BaseException) -> bool:
    """True iff ``exc`` looks like a backend/transport fault worth a retry."""
    names = {t.__name__ for t in type(exc).__mro__}
    if names & set(_TRANSIENT_TYPES):
        return True
    msg = str(exc)
    return any(m.lower() in msg.lower() for m in _TRANSIENT_MARKERS)


def reset_backend() -> None:
    """Drop jit caches and live PJRT clients so the next dispatch
    reconnects fresh. Best-effort: every step is individually guarded —
    a reset that itself faults must not mask the original error."""
    try:
        import jax

        jax.clear_caches()
    except Exception:  # pragma: no cover - guard only
        pass
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:  # pragma: no cover - older/newer jaxlib layouts
        pass


def with_retries(fn: Callable[[], T], attempts: int = 3, desc: str = "",
                 sleep_s: float = 2.0, reset: bool = True) -> T:
    """Run ``fn()``; on a *transient* backend fault, reset and retry.

    Non-transient exceptions propagate immediately with a one-line
    classification on stderr. The last attempt's failure always
    propagates. Backoff is linear (``sleep_s * attempt``).
    """
    name = desc or getattr(fn, "__name__", "fn")
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - classified below
            transient = is_transient(e)
            kind = "transient-backend" if transient else "non-transient"
            sys.stderr.write(
                f"[faults] {name}: attempt {i + 1}/{attempts} failed "
                f"({kind} {type(e).__name__}): {str(e)[:300]}\n")
            if not transient or i == attempts - 1:
                raise
            if reset:
                reset_backend()
            time.sleep(sleep_s * (i + 1))
    raise AssertionError("unreachable")  # pragma: no cover
