#!/usr/bin/env python
"""Config-experiment matrix for the pinned 2-vs-8-core scaling protocol.

Round-3 goal: close the measured 2->8 efficiency gap (0.61 at 1.8M pages)
with REAL config wins — the round-2 counter analysis attributed the gap to
contention-billed CPU (GC, shuffle (de)compression, memory stalls) that
grows with thread count.  Each variant runs the identical pipeline leg
(BENCH_MODE=pipeline, input generation excluded from the timed total) at
taskset-pinned 2 and 8 hardware threads; efficiency = (thr8 / thr2) / 4.

Usage: python scripts/exp_scaling.py [variant ...]   (default: all)
Writes one JSON line per variant to stdout and BENCH/exp_scaling.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS: dict[str, dict] = {
    "base": {},
    "parallelgc": {
        "spark.driver.extraJavaOptions":
            "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC",
    },
    "noshufflecomp": {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
    "cachenocomp": {
        "spark.sql.inMemoryColumnarStorage.compressed": "false",
    },
    "lz4big": {
        "spark.io.compression.lz4.blockSize": "512k",
    },
    # /tmp sits on the shared-hypervisor virtio disk; a real N-node cluster
    # brings N sets of local NVMe whose aggregate bandwidth scales with the
    # cluster, so RAM-backed shuffle dirs are the faithful single-box proxy
    # (and the protocol's memory budget already scales with cores)
    "shmdir": {
        "spark.local.dir": "/dev/shm/spark-local",
    },
    "shm_parallelgc": {
        "spark.local.dir": "/dev/shm/spark-local",
        "spark.driver.extraJavaOptions":
            "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC",
    },
    "shm_nocomp": {
        "spark.local.dir": "/dev/shm/spark-local",
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
}


def _wait_quiet(max_wait: int = 60) -> None:
    for _ in range(max_wait):
        if subprocess.run(["pgrep", "-c", "java"], capture_output=True,
                          text=True).stdout.strip() in ("", "0"):
            break
        time.sleep(1)
    time.sleep(5)


def run_leg(cpus: int, conf: dict, entities: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               BENCH_MODE="pipeline",
               SPARK_GRAFT_DRIVER_MEM=f"{min(64, 4 * cpus)}g",
               BENCH_ENTITIES=entities,
               SPARK_GRAFT_EXTRA_CONF=json.dumps(conf))
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "bench.py"]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         check=True, cwd=ROOT)
    return json.loads(out.stdout.strip().splitlines()[-1])["pipeline"]


def main() -> None:
    names = sys.argv[1:] or list(VARIANTS)
    entities = os.environ.get("BENCH_ENTITIES", "200000")
    levels = tuple(int(x) for x in
                   os.environ.get("EXP_LEVELS", "2,8").split(","))
    out_path = os.path.join(ROOT, "BENCH", "exp_scaling.jsonl")
    for name in names:
        conf = VARIANTS[name]
        legs = {}
        for c in levels:
            _wait_quiet()
            legs[c] = run_leg(c, conf, entities)
        lo, hi = levels[0], levels[-1]
        thr = {c: legs[c]["candidate_pairs"] / legs[c]["total_sec"]
               for c in levels}
        rec = {
            "variant": name, "entities": entities, "conf": conf,
            "eff": round((thr[hi] / thr[lo]) / (hi / lo), 3),
            "walls": {str(c): legs[c]["total_sec"] for c in levels},
            "blocks": {str(c): legs[c]["block_sec"] for c in levels},
            "scores": {str(c): legs[c]["score_sec"] for c in levels},
            "clusters": {str(c): legs[c]["cluster_sec"] for c in levels},
            "f1": legs[levels[-1]]["f1"],
        }
        line = json.dumps(rec)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
