#!/usr/bin/env python
"""Memory-bandwidth window probe for the scaling protocol (~3 s of
measurement per worker, all workers concurrent, so a run is ~4 s
wall).

Round-4 finding (BENCH/BASELINE.md): the 2->8 scaling reading on this
shared box is set almost entirely by how hard the hypervisor neighbors
are hitting the shared memory subsystem DURING the 8-thread leg — CPU
core-seconds for identical work ranged 1634-3046 across windows while
the 2-leg stayed flat (1220-1396).  Idle loadavg does NOT predict this
(the 523s/3046-core-s leg started at loadavg 0.11), and a 200k-entity
probe under-stresses bandwidth enough to read clean in a window where
the 800k leg then inflates 2.2x.

This probe measures the thing that actually varies: aggregate streaming
memory bandwidth under 8-way spread-pinned concurrency, in ~10s.  Run
it immediately before an 8-leg; only launch the leg when the reading is
near the best observed for the box (calibration table below, appended
per session).

Usage: python scripts/probe_bandwidth.py [nprocs]   (default 8)
Prints one JSON line: {"nprocs": 8, "agg_gb_s": ..., "per_proc": [...]}

Calibration (round-4 session, BENCH/BASELINE.md "probe-calibrated"
section — probe immediately before a spread-pinned 8-leg on the 800k-
entity protocol input):

| probe agg GB/s | per-proc min | 8-leg wall s | cpu core-s |
|---|---|---|---|
| 92.0  | 9.6 (2 stragglers) | 477.2 | 2365 |
| 106.9 | 13.1 (uniform)     | 335.5 | 2004 |
| 131.4 | 15.9 (uniform)     | 358.7 | 2027 |

Read: per-proc min < ~12 GB/s or spread > ~25% -> do NOT launch a leg
(acute neighbor pressure).  Above ~13 GB/s/proc the probe saturates as
a discriminator — this boot's ~2000 core-s floor persists regardless,
vs ~1300 on the round-3 passing boots, so flat-counter windows are a
BOOT property the guest-side probe cannot detect.  Gate #2 therefore:
run one short 8-leg and only spend the 2-leg if its core-seconds land
within ~1.15x of the best recorded 2-leg (~1220 core-s).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

BUF_MB = 256
SECONDS = 3.0


def _worker(idx: int, cpu: int, q) -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np
    src = np.ones(BUF_MB * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    # warm
    np.copyto(dst, src)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < SECONDS:
        np.copyto(dst, src)
        n += 1
    dt = time.perf_counter() - t0
    # each copy reads BUF and writes BUF -> 2x traffic
    q.put((idx, 2 * n * BUF_MB / 1024 / dt))


def main() -> None:
    nprocs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ncpu = os.cpu_count() or 32
    stride = max(1, ncpu // nprocs)
    cpus = [i * stride for i in range(nprocs)]
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, c, q))
             for i, c in enumerate(cpus)]
    for p in procs:
        p.start()
    rates = [q.get()[1] for _ in procs]
    for p in procs:
        p.join()
    print(json.dumps({"nprocs": nprocs,
                      "agg_gb_s": round(sum(rates), 1),
                      "per_proc": [round(r, 1) for r in sorted(rates)]}))


if __name__ == "__main__":
    main()
