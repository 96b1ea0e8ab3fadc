"""Deployment-shape test: package beats_spark into a zip and run the
checkpointed flagship job via real `spark-submit --py-files` in a
subprocess — proves the package needs nothing outside the zip
(north_star: runs via spark-submit --py-files on multi-executor
clusters)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w") as z:
        pkg = os.path.join(REPO, "beats_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


@pytest.mark.slow
def test_spark_submit_pyfiles(spark, tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    # stage input with the session we already have
    from beats_spark.datagen import load_token_events

    input_dir = str(tmp_path / "in")
    load_token_events(spark, "/root/testdata/sf0.001").coalesce(2).write.parquet(
        input_dir
    )
    zip_path = str(tmp_path / "beats_spark.zip")
    _make_zip(zip_path)
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_job.py"),
            input_dir, out_dir, "2",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert sorted(result["chunks_committed"]) == [0, 1]
    assert result["rows_total"] > 0
    # readers resolve data through the manifest pointer, never by
    # listing the data dir (uncommitted attempts must stay invisible)
    from beats_spark.checkpoint import CheckpointedRunner

    written = CheckpointedRunner(spark, out_dir, n_chunks=2).result()
    assert written.count() == result["rows_total"]
