"""XLA-flag sweep for the KITTI fused train step (the open conv-backward
thread: bwd ~9x fwd at these shapes, TODO.md).

OUTCOME on this image (2026-08-18): UNMEASURABLE — the TPU compiler runs
on the far side of the relay; ``--xla_tpu_*`` flags in XLA_FLAGS are
parsed by the LOCAL client XLA (parse_flags_from_env.cc), which aborts on
unknown TPU flags, and there is no channel to pass compiler flags to the
remote libtpu. Keep this script for real (locally attached) TPU hosts,
where the sweep runs as designed; pair it with the runtime.xla_flags
config knob (config.py) to ship a winning combo.

Custom Pallas conv schedules are the expensive lever; this probe first
checks whether XLA's own scheduling/fusion knobs move the number. Each
flag set needs a fresh process (XLA_FLAGS is read at backend init), so
this wrapper re-runs scripts/probe_kitti_train.py in subprocesses and
parses the ms/step line. Different flags change the compile-cache key, so
every combo pays its own KITTI-scale compile (~minutes on this relay) —
run inside the probe batch, not interactively.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_train_flags.py [--iters 4] [--bf16]
"""

import argparse
import os
import re
import subprocess
import sys

COMBOS = [
    ("baseline", ""),
    ("latency-hiding-sched",
     "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("scoped-vmem-96M", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("sched+vmem",
     "--xla_tpu_enable_latency_hiding_scheduler=true "
     "--xla_tpu_scoped_vmem_limit_kib=98304"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    results = []
    for name, flags in COMBOS:
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = flags
        else:
            env.pop("XLA_FLAGS", None)
        cmd = [sys.executable, "scripts/probe_kitti_train.py",
               "--iters", str(args.iters), "--batch", str(args.batch)]
        if args.bf16:
            cmd.append("--bf16")
        print(f"=== {name}: XLA_FLAGS='{flags}'", flush=True)
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                              timeout=2400)
        out = proc.stdout + proc.stderr
        m = re.search(r"train step B=\d+: ([0-9.]+) ms/step", out)
        if proc.returncode != 0 or not m:
            print(f"  FAILED rc={proc.returncode}; tail:", flush=True)
            print("\n".join(out.splitlines()[-6:]), flush=True)
            results.append((name, None))
            continue
        ms = float(m.group(1))
        print(f"  {ms:.2f} ms/step", flush=True)
        results.append((name, ms))

    print("\n=== summary (KITTI train step, "
          f"B={args.batch}{' bf16' if args.bf16 else ' f32'}) ===")
    for name, ms in results:
        print(f"  {name:24s} {'FAILED' if ms is None else f'{ms:8.2f} ms'}")


if __name__ == "__main__":
    main()
