#!/usr/bin/env python
"""Wait for a window when the shared host provides enough effective
cores for a meaningful N->4N tier, then run one paired scaling bench.

The sandbox's host steal varies by the hour; a 4x-parallelism
comparison is only meaningful when the high tier fits inside the
host's effective capacity (bench.py --scaling calibrates the tier at
start time).  This watcher polls cheaply and fires at most once, when
capacity crosses the threshold.

Usage: python scripts/scaling_watcher.py OUT.json [max_wait_minutes] [threshold]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import effective_cores  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_hi_tier.json"
MAX_MIN = float(sys.argv[2]) if len(sys.argv) > 2 else 180.0
THRESHOLD = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
POLL_S = 240.0

deadline = time.time() + MAX_MIN * 60
while time.time() < deadline:
    cal = effective_cores()
    print(json.dumps({"t": round(time.time()), "effective_cores": cal}), flush=True)
    if cal >= THRESHOLD:
        # no LO/HI override: bench re-calibrates at fire time and
        # picks the largest tier the capacity supports
        env = dict(os.environ, LPR_SCALING_PAIRS="2")
        res = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench.py"), "--scaling"],
            env=env, capture_output=True, text=True,
        )
        with open(OUT, "w") as fh:
            fh.write(res.stdout.strip().splitlines()[-1] if res.stdout.strip() else "{}")
        print("DONE", res.returncode, flush=True)
        sys.exit(0)
    time.sleep(POLL_S)
print("TIMEOUT: no window observed above threshold", flush=True)
sys.exit(2)
