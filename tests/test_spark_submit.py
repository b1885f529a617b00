"""The north rule's launch mode, literally: `spark-submit --py-files
<pkg.zip> scripts/linkage_job.py` in a subprocess — the package must be
importable on executors FROM THE ZIP alone (cwd-independent), stages must
checkpoint, and F1 must hold."""

import json
import os
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_py_files_end_to_end(tmp_path):
    pkg_zip = tmp_path / "spellchecker_wasm_spark.zip"
    pkg = os.path.join(REPO, "spellchecker_wasm_spark")
    with zipfile.ZipFile(pkg_zip, "w") as zf:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    out_dir = tmp_path / "clusters"
    ck_dir = tmp_path / "stages"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(pkg_zip),
         os.path.join(REPO, "scripts", "linkage_job.py"),
         "--entities", "150", "--checkpoint", str(ck_dir),
         "--output", str(out_dir)],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    metrics = json.loads(res.stdout.strip().splitlines()[-1])
    assert metrics["pages"] > 150
    assert metrics["f1"] >= 0.99
    assert os.path.isdir(out_dir)
    # stage checkpoints written (blocks / scored_pairs / clusters)
    names = {p for p in os.listdir(ck_dir / "run1")}
    assert {"blocks", "scored_pairs", "clusters"} <= names
