"""Pins the physical-plan property sink_bucketed_join exists to prove:
a join of two tables bucketed on the join key runs with NO Exchange on
either side — the co-located-join contract the 100-TB design leans on
(write once, join shuffle-free forever after)."""

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_bucketed_join_has_no_exchange(spark):
    from spellchecker_wasm_spark.queries import CATALOG

    # At fixture scale Catalyst rightly broadcasts the small side (also
    # shuffle-free, but that's the small-dim path, not the property
    # under test).  Disable broadcast to get the plan the two fact
    # tables would get at 10^12 events, where neither side fits.
    conf = spark.conf
    old = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = CATALOG["sink_bucketed_join"][0](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # The final agg may stage work ABOVE the join; the bucketed
        # guarantee is about the join inputs, so isolate the subtree
        # at and below the join node.
        join_at = max(plan.find("SortMergeJoin"),
                      plan.find("ShuffledHashJoin"))
        assert join_at >= 0, plan
        below = plan[join_at:]
        assert "Exchange" not in below, below
        assert "Bucketed: true" in below, below
        assert df.count() > 0
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_unbucketed(spark):
    from spellchecker_wasm_spark.queries import CATALOG, load

    got = {r.user_id: r.n_attr
           for r in CATALOG["sink_bucketed_join"][0](spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"))
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"))
    want = {r.user_id: r.n_attr
            for r in c.join(p, "user_id").where(F.col("cts") <= F.col("pts"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_attr"))
            .collect()}
    assert got == want
