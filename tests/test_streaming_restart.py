"""Exactly-once recovery: a streaming aggregation stopped and
RESTARTED from its checkpointLocation must (a) restore its state store
— the final result equals the batch computation over ALL files even
though the restarted run only reads the new one — and (b) not re-read
files the first run already committed (pinned via numInputRows)."""

import datetime as dt

from pyspark.sql import Row, functions as F


def test_restart_recovers_state_and_skips_committed_files(spark, tmp_path):
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [Row(doc_id=i, text=f"body {i % 20}",
                ts=t0 + dt.timedelta(seconds=i)) for i in range(40)]
    df = spark.createDataFrame(rows)
    src = tmp_path / "restart_in"
    src.mkdir()
    ck = str(tmp_path / "ck_restart")
    df.where("doc_id < 20").coalesce(1).write.parquet(str(src / "b1"))

    def start(name):
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src / "*")))
        agg = (stream.groupBy(F.md5("text").alias("k"))
               .agg(F.min("doc_id").alias("keep_id"),
                    F.count(F.lit(1)).alias("n")))
        return (agg.writeStream.format("memory").queryName(name)
                .outputMode("complete").trigger(availableNow=True)
                .option("checkpointLocation", ck).start())

    q1 = start("restart_run1")
    q1.awaitTermination(120)
    got1 = {r.k: (r.keep_id, r.n) for r in spark.table("restart_run1").collect()}
    assert len(got1) == 20 and all(n == 1 for _, n in got1.values())

    # new file arrives while the pipeline is DOWN
    df.where("doc_id >= 20").coalesce(1).write.parquet(str(src / "b2"))

    q2 = start("restart_run2")
    q2.awaitTermination(120)
    got2 = {r.k: (r.keep_id, r.n) for r in spark.table("restart_run2").collect()}

    # state recovered: counts reflect BOTH files, keep_id is the global min
    want = {r.k: (r.keep_id, r.n) for r in
            (df.groupBy(F.md5("text").alias("k"))
             .agg(F.min("doc_id").alias("keep_id"),
                  F.count(F.lit(1)).alias("n"))).collect()}
    assert got2 == want
    assert all(n == 2 for _, n in got2.values())

    # no reprocessing: the restarted run ingested ONLY the 20 new rows
    new_rows = sum(p["numInputRows"] for p in q2.recentProgress)
    assert new_rows == 20, [p["numInputRows"] for p in q2.recentProgress]
