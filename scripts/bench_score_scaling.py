#!/usr/bin/env python
"""Compute-bound scaling microbench: the vectorized OSA scoring stage alone
(fixed on-disk pair set → pandas-UDF score → count) at local[2/8/32].

The end-to-end pipeline mixes compute with single-box-shared resources
(shuffle bandwidth, page cache); this isolates the stage where cores are
the only resource, i.e. the stage whose scaling transfers directly to a
real cluster.  Results are appended to BENCH/BASELINE.md by bench_scaling
or printed standalone.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

LEVELS = (2, 8, 32)

def _wait_quiet(max_wait: int = 60) -> None:
    """Wait for prior JVMs to fully exit — overlapping shutdown skews the
    next leg's measurement badly on this box."""
    import subprocess as sp
    import time as _t
    for _ in range(max_wait):
        if sp.run(["pgrep", "-c", "java"], capture_output=True,
                  text=True).stdout.strip() in ("", "0"):
            break
        _t.sleep(1)
    _t.sleep(10)

N_PAIRS = 16_000_000
PAIRS_PATH = "/tmp/spark_graft_score_pairs.parquet"


def make_pairs() -> None:
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    letters = np.array(list("abcdefghijklmnop"))
    words = ["".join(rng.choice(letters, rng.randint(6, 18)))
             for _ in range(400_000)]
    idx = rng.randint(0, len(words), N_PAIRS)
    a = [words[i] for i in idx]
    b = []
    for i, w in enumerate(a):
        r = idx[i] % 3
        if r == 0:
            b.append(w[:2] + w[3:])          # near-dup (1 delete)
        elif r == 1:
            b.append(words[(idx[i] * 31 + 7) % len(words)])  # random
        else:
            b.append(w[1:] + "q")            # 2 edits
    pd.DataFrame({"term_a": a, "term_b": b}).to_parquet(PAIRS_PATH)


def run_level(cpus: int) -> float:
    code = f"""
import time, sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from spellchecker_wasm_spark.session import get_spark
from spellchecker_wasm_spark.operators.scoring import score_pairs
spark = get_spark(app_name="score-scaling", cpus={cpus},
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
spark.sparkContext.setLogLevel("ERROR")
# parquet-direct feed — the checkpointed-stage shape the real pipeline
# uses; cache+repartition feeds measurably serialize the Arrow exchange
pairs = spark.read.parquet({PAIRS_PATH!r})
# warm the Python workers so cold-start is outside the timed region
score_pairs(pairs.limit(2000), max_distance=2).count()
t0 = time.time()
n = score_pairs(pairs, max_distance=2).count()
print(time.time() - t0)
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if not os.path.exists(PAIRS_PATH):
        make_pairs()
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    results = {}
    for c in LEVELS:
        best = float("inf")
        for _ in range(repeats):
            _wait_quiet()
            best = min(best, run_level(c))
        # best-of-N: interference on this shared box only ever slows a
        # leg, so the minimum is the least-contaminated observation
        results[c] = {"wall_sec": round(best, 2),
                      "pairs_per_sec": round(N_PAIRS / best, 1)}
    lo_hi = list(zip(LEVELS[:-1], LEVELS[1:]))
    eff = {f"{lo}->{hi}": round(
        (results[hi]["pairs_per_sec"] / results[lo]["pairs_per_sec"])
        / (hi / lo), 4) for lo, hi in lo_hi}
    print(json.dumps({"n_pairs": N_PAIRS, "levels": results,
                      "efficiency": eff}))


if __name__ == "__main__":
    main()
