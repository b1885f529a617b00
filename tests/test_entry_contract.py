"""The driver contract must work from a foreign cwd with an
externally-created SparkSession (the grading driver's exact shape)."""

import os
import subprocess
import sys

SCRIPT = """
import importlib.util, sys
assert "/root/repo" not in sys.path
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]").appName("contract")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
e = importlib.util.module_from_spec(spec)
spec.loader.exec_module(e)
rows = e.entry(spark).collect()
assert len(rows) > 0
qs, osql = e.queries(), e.oracle_sql()
assert set(osql) <= set(qs) and len(qs) >= 20
# a UDF-bearing query must run on the foreign session (executor imports)
assert qs["scored_pairs_osa"](spark, "/root/testdata/sf0.001").count() >= 0
spark.stop()
print("CONTRACT_OK")
"""


def test_contract_from_foreign_cwd(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run([sys.executable, "-c", SCRIPT], cwd=str(tmp_path),
                         env=env, capture_output=True, text=True, timeout=300)
    assert "CONTRACT_OK" in out.stdout, out.stderr[-2000:]
