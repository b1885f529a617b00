"""Edge semantics of the backward as-of join: at-or-before ties, no
prior match, payload columns, and multiple matches choosing the latest."""

import datetime as dt

from pyspark.sql import Row

from spellchecker_wasm_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame([
        Row(k=1, ts=_ts(10), tag="a"),   # matches r at 10 (at-or-before)
        Row(k=1, ts=_ts(25), tag="b"),   # matches latest prior r at 20
        Row(k=1, ts=_ts(1), tag="c"),    # no prior right row
        Row(k=2, ts=_ts(30), tag="d"),   # other key: only k=2 rights
    ])
    right = spark.createDataFrame([
        Row(k=1, ts=_ts(5), v=50),
        Row(k=1, ts=_ts(10), v=100),
        Row(k=1, ts=_ts(20), v=200),
        Row(k=2, ts=_ts(29), v=290),
        Row(k=2, ts=_ts(31), v=310),     # after left: ignored
    ])
    out = {r["tag"]: r for r in
           asof_join(left, right, on=["k"], ts_alias="m_ts").collect()}
    assert out["a"]["m_ts"] == _ts(10) and out["a"]["v"] == 100
    assert out["b"]["m_ts"] == _ts(20) and out["b"]["v"] == 200
    assert out["c"]["m_ts"] is None and out["c"]["v"] is None
    assert out["d"]["m_ts"] == _ts(29) and out["d"]["v"] == 290
    # left columns survive untouched
    assert set(out["a"].asDict()) == {"k", "ts", "tag", "m_ts", "v"}
