#!/usr/bin/env python
"""Capture .explain("formatted") output for catalog queries into
plans/<round>/<query>_<tag>.txt (round-6 deliverable: before/after plan
evidence for every query touched this round).

Usage:
  python scripts/capture_plans.py <tag> q1,q2,...   # tag = before|after
  SPARK_GRAFT_SF_DIR overrides the data dir (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spellchecker_wasm_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("PLANS_ROUND", "r06")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from spellchecker_wasm_spark.queries import CATALOG
    for name in names:
        fn, _ = CATALOG[name]
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
