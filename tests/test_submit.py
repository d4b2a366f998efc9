"""spark-submit --py-files deployment contract (north rule: the job
runs via spark-submit on a cluster manager, with the package shipped as
a zip): a REAL spark-submit child process, cwd outside the repo, no
repo path on sys.path — the driver and executors import tenzir_spark
only from the --py-files artifact — applying a deterministic change log
and asserting final-state equality against the reference replay."""

import json
import os
import shutil
import subprocess

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not present")
def test_spark_submit_pyfiles_cdc_job(tmp_path):
    from tenzir_spark.session import package_pyfiles

    zip_path = package_pyfiles(str(tmp_path))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "cdc_submit_job.py"),
         "60000", str(tmp_path / "lake")],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    report = json.loads(line)
    assert report["state_equal_to_replay"] is True
    assert report["events"] == 60000
    assert report["lineage_rows"] >= 4  # per-(epoch, bucket) rows exist
    assert report["events_per_sec"] > 0
