"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship record-linkage slice on sf0.001:
SymSpell delete-key blocking over document tokens → candidate pairs →
vectorized banded Damerau-OSA scoring → large-star/small-star connected
components → (term, cluster_id).

``queries()``/``oracle_sql()`` expose the full operator catalog
(spellchecker_wasm_spark/queries.py) — every entry is oracle-checked
against DuckDB on the same parquet (verified locally in
tests/test_query_catalog.py at sf0.001 and sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spellchecker_wasm_spark.queries import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = CATALOG["term_clusters"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same column
    names/types; value-deterministic floats)."""
    return {name: sql for name, (_, sql) in CATALOG.items() if sql is not None}
