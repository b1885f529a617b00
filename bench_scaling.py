#!/usr/bin/env python
"""Two-parallelism-level scaling protocol (BASELINE.md): run the identical
linkage pipeline on the identical input at local[8] and local[32] (the
sandbox substitute for N→4N executors), report throughput at both plus
scaling efficiency = (throughput_32 / throughput_8) / 4, and write the
results table to BENCH/BASELINE.md.

Each level runs in a fresh subprocess so the JVM/session is fully isolated
(the same isolation spark-submit would give per cluster size).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LEVELS = (8, 32)


def run_level(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir, BENCH_MODE="pipeline",
               BENCH_ENTITIES=os.environ.get("BENCH_ENTITIES", "100000"))
    out = subprocess.run([sys.executable, "bench.py"], env=env,
                         capture_output=True, text=True, check=True,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results = {c: run_level(c, sf_dir) for c in LEVELS}
    lo, hi = LEVELS
    thr = {c: results[c]["pipeline"]["candidate_pairs"]
           / results[c]["pipeline"]["total_sec"] for c in LEVELS}
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    score_thr = {c: results[c]["pipeline"]["pairs_scored_per_sec"]
                 for c in LEVELS}
    score_eff = (score_thr[hi] / score_thr[lo]) / (hi / lo)

    os.makedirs("BENCH", exist_ok=True)
    rows = []
    for c in LEVELS:
        p = results[c]["pipeline"]
        rows.append(
            f"| local[{c}] | {p['pages']} | {p['candidate_pairs']} | "
            f"{p['total_sec']} | {thr[c]:,.0f} | "
            f"{p['score_sec']} | {score_thr[c]:,.0f} |")
    table = "\n".join(rows)
    md = f"""# BENCH/BASELINE — two-parallelism-level scaling run

Protocol (BASELINE.md): identical job, identical input (synthesized pages,
seed 42, {results[lo]['pipeline']['entities']} entities), two local
parallelism levels standing in for N→4N executors.  Pipeline = block →
score → cluster (input generation excluded).  F1 at both levels:
{results[lo]['pipeline']['f1']} / {results[hi]['pipeline']['f1']}.

| parallelism | input rows | candidate pairs | pipeline wall s | pairs/sec (end-to-end) | score wall s | pairs/sec (scoring stage) |
|---|---|---|---|---|---|---|
{table}

**End-to-end scaling efficiency (8→32 cores): {eff:.3f}**
**Scoring-stage scaling efficiency (8→32 cores): {score_eff:.3f}**
Target (BASELINE.json): ≥ 0.8.

Caveats: single-JVM local mode shares one driver and one OS page cache, so
fixed per-job costs (session start, Python worker spin-up, small-stage
scheduling) depress measured efficiency versus a real multi-executor
cluster where N→4N adds independent machines; treat these numbers as a
lower bound on cluster-scaling behavior.
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps({"efficiency": round(eff, 4),
                      "scoring_efficiency": round(score_eff, 4),
                      "throughput": {str(c): round(thr[c], 1) for c in LEVELS},
                      "scoring_throughput": score_thr}))


if __name__ == "__main__":
    main()
