"""Multi-stream serving measured ON THE DEVICE path (VERDICT r3 #3).

Measures `stream.run_multi_stream` (N sensors -> N drop-oldest mailboxes
-> ONE batched jitted graph -> windowed overlapped readback) with
PRE-GENERATED frame banks, so the single-core host's scene synthesis
doesn't masquerade as the serving ceiling: live `make_scene` costs more
CPU per frame than the whole dispatch loop, and an 8x120 Hz live-source
run measures the generator (the first r4 attempt read 19.9 Hz aggregate
with 6.9k drops for exactly that reason — frames were never produced on
time, and the warmup's block_until_ready let the compile land inside the
window besides).

Interpretation on this rig: per-dispatch latency is dominated by the
~25-30 ms relay RTT on the readback, hidden by the in-flight window;
aggregate throughput is the honest capacity metric (docs/PERFORMANCE.md
d435i streaming notes). The single-stream row uses the same bank source
for apples-to-apples.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_multi_stream.py [--duration 20] [--hz 120]
"""

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--hz", type=float, default=120.0)
    ap.add_argument("--streams", default="1,2,4,8")
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--bank", type=int, default=16,
                    help="pre-generated frames per stream")
    args = ap.parse_args()

    from pillars_tpu.config import Config
    from pillars_tpu.data.stream import (bank_source, run_multi_stream,
                                         run_stream)
    from pillars_tpu.data.synthetic import make_scene
    from pillars_tpu.models.detector import PillarsDetector
    from pillars_tpu.utils.compile_cache import set_compile_cache

    set_compile_cache()
    import jax

    cfg = Config.default()
    det = PillarsDetector(cfg)

    print(f"device: {jax.devices()[0].device_kind}")
    # Relay RTT context row (VERDICT r4 #7): the sync baseline the honest
    # clock subtracts drifts across sessions (102.3 vs 54.2 Hz same-protocol
    # single-stream readings, PERFORMANCE.md) — recording it alongside the
    # stream rows makes the table interpretable when the relay moves.
    import time as _time

    from pillars_tpu.utils.probe_harness import jax_sync_fn

    _sync = jax_sync_fn()
    rtts = []
    for _ in range(5):
        t0 = _time.perf_counter()
        _sync()
        rtts.append((_time.perf_counter() - t0) * 1e3)
    print(json.dumps({"relay_rtt_ms_min": round(min(rtts), 2),
                      "relay_rtt_ms_med": round(sorted(rtts)[2], 2)}))
    rng = np.random.RandomState(0)
    banks = {}
    for s in range(max(int(x) for x in args.streams.split(","))):
        banks[s] = [make_scene(rng)[0] for _ in range(args.bank)]

    for ns in (int(x) for x in args.streams.split(",")):
        variables = det.init(jax.random.PRNGKey(0), batch_size=ns)
        if ns == 1:
            # single-stream path (run_stream) with a bank source injected
            # via the mailbox the same way the multi-stream rows do
            from pillars_tpu.data import stream as sm

            orig = sm.synthetic_source
            sm.synthetic_source = (
                lambda mb, hz, dur, seed=0, n_points=0:
                bank_source(mb, hz, dur, banks[0]))
            try:
                stats = run_stream(cfg, det, variables, hz=args.hz,
                                   duration_s=args.duration,
                                   source="synthetic", window=args.window)
            finally:
                sm.synthetic_source = orig
            stats["num_streams"] = 1
            stats["aggregate_hz"] = stats.pop("throughput_hz")
            stats["per_stream_hz"] = stats["aggregate_hz"]
        else:
            stats = run_multi_stream(
                cfg, det, variables, num_streams=ns, hz=args.hz,
                duration_s=args.duration, window=args.window,
                source_fn=lambda mb, i: bank_source(
                    mb, args.hz, args.duration, banks[i]))
        print(json.dumps(stats))


if __name__ == "__main__":
    main()
