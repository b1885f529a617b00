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

import os
import sys
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
# executors import the package too; PYTHONPATH covers sessions created
# after this import, addPyFile (below) covers pre-existing ones
os.environ["PYTHONPATH"] = (_REPO_ROOT + os.pathsep
                            + os.environ.get("PYTHONPATH", ""))

from spellchecker_wasm_spark.queries import CATALOG  # noqa: E402

_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make spellchecker_wasm_spark importable on the executors of an
    externally-created SparkSession (driver cwd independent)."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg = os.path.join(_REPO_ROOT, "spellchecker_wasm_spark")
    sources = sorted(
        os.path.join(root, f)
        for root, _, files in os.walk(pkg) for f in files if f.endswith(".py"))
    zip_path = os.path.join("/tmp", "spellchecker_wasm_spark_pkg.zip")
    # rebuild whenever any source is newer than the zip — a reused stale
    # zip would silently ship outdated code to executors across sessions
    newest_src = max(os.path.getmtime(p) for p in sources)
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) <= newest_src:
        with zipfile.ZipFile(zip_path, "w") as zf:
            for full in sources:
                zf.write(full, os.path.relpath(full, _REPO_ROOT))
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(app_id)


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)
    run.__name__ = getattr(fn, "__name__", "query")
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = CATALOG["term_clusters"]
    return _wrap(fn)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, (fn, _) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same column
    names/types; value-deterministic floats).  Callable oracle entries
    generate their SQL for the driver's comparison scale factor
    (sf0.01 per the driver contract; SPARK_GRAFT_ORACLE_SF_DIR
    overrides for local runs at other SFs)."""
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                            "/root/testdata/sf0.01")
    return {name: (sql(sf_dir) if callable(sql) else sql)
            for name, (_, sql) in CATALOG.items() if sql is not None}
