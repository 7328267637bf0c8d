#!/usr/bin/env python3
"""Pre-fault guest RAM after a hypervisor snapshot resume.

BASELINE.md §3 / SURVEY §10.4: after this VM is snapshot-resumed, every
first-touch page fault is served from the host's snapshot store at
~400us (~11 MB/s single-threaded, ~75 MB/s with 32 parallel touchers),
silently inflating any fresh-allocating Spark/numpy workload.  Re-touch
of already-faulted pages runs at RAM speed and FREED guest pages stay
host-resident, so touching the RAM once repairs the whole session.

Run BEFORE any wall-clock measurement when the first reading of
``session.first_touch_canary_s()`` in a fresh process exceeds ~1s:

    python tools/prefault.py [total_gb=48] [procs=32]

~10 min on a fully cold host; near-instant on a warm one.
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def _touch(mb: int) -> int:
    import numpy as np

    a = np.empty(mb << 20, dtype=np.uint8)
    a[::4096] = 1  # one write per 4 KiB page
    return mb


def main() -> None:
    total_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 48.0
    procs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    per_mb = int(total_gb * 1024 / procs)
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_touch, [per_mb] * procs)
    print(
        f"pre-faulted {total_gb:.0f} GB via {procs} procs "
        f"in {time.time() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
