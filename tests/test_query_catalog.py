"""Local replica of the driver's correctness gate: run every CATALOG query
on Spark and its oracle SQL on DuckDB over the same parquet, compare row
multisets exactly (floats included — outputs are designed deterministic)."""

import math
import os

import duckdb
import pytest

from spellchecker_wasm_spark.queries import CATALOG, TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        # exact float identity expected; normalize -0.0 and integral floats
        if math.isnan(v):
            return "nan"
        return v
    return v


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, ddb, name):
    fn, sql = CATALOG[name]
    if callable(sql):  # per-SF generated oracle (e.g. compound_correct)
        sql = sql(SF_DIR)
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if sql is None:
        # rows-only contract entry (non-SQL-expressible op): must run and
        # produce rows with a stable schema
        assert len(srows) > 0 and len(scols) > 0
        return
    ores = ddb.sql(sql)
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    got, want = _rows(scols, srows), _rows(ocols, orows)
    assert len(got) == len(want), (name, len(got), len(want))
    assert got == want, (name, got[:5], want[:5])


def test_catalog_queries_nonempty(spark, ddb):
    """Guard against vacuous green: every oracle-checked query must return
    rows at this SF (a correctness gate over empty sets proves nothing)."""
    empty = [name for name, (_, sql) in CATALOG.items()
             if sql is not None
             and not ddb.sql(
                 f"SELECT 1 FROM ({sql(SF_DIR) if callable(sql) else sql}) "
                 "LIMIT 1").fetchall()]
    assert not empty, f"queries with empty results: {empty}"
