#!/usr/bin/env python
"""Fire the round's benchmark battery in a quiet-host window.

Polls the shared host's effective parallelism; when it crosses
THRESHOLD (or the deadline passes — an honest under-load artifact
beats no artifact), runs:

1. the local headline bench at the session default CPUs
   -> /tmp/bench_r4_window.json
2. the paired N->4N scaling bench over a 2M-page corpus (analytics
   compute-dominant, per the round-3 verdict's multiplier advice)
   -> /tmp/scaling_r4_window.json

Usage: python scripts/window_runner.py [max_wait_minutes] [threshold]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import effective_cores  # noqa: E402

MAX_MIN = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
THRESHOLD = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
POLL_S = 180.0

BENCH = os.path.join(REPO, "bench.py")


def run(out_path: str, env_extra: dict, args: list) -> None:
    env = dict(os.environ, **env_extra)
    res = subprocess.run(
        [sys.executable, BENCH, *args], env=env, capture_output=True, text=True
    )
    line = res.stdout.strip().splitlines()[-1] if res.stdout.strip() else "{}"
    with open(out_path, "w") as fh:
        fh.write(line)
    print(f"{out_path}: rc={res.returncode}", flush=True)


deadline = time.time() + MAX_MIN * 60
while True:
    cal = effective_cores()
    print(json.dumps({"t": round(time.time()), "effective_cores": cal}), flush=True)
    if cal >= THRESHOLD or time.time() >= deadline:
        if cal < THRESHOLD:
            print("DEADLINE: firing under load", flush=True)
        run("/tmp/bench_r4_window.json", {}, [])
        run(
            "/tmp/scaling_r4_window.json",
            {"LPR_BENCH_PAGES": "2000000", "LPR_SCALING_PAIRS": "2"},
            ["--scaling"],
        )
        print("DONE", flush=True)
        sys.exit(0)
    time.sleep(POLL_S)
