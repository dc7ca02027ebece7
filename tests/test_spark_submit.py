"""The north rule's shipping clause: the job must run via
``spark-submit --py-files howard_spark.zip`` with imports resolving
from the shipped archive (a fresh JVM + fresh Python, no repo on the
worker path beyond the zip)."""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_submit_with_py_files_zip(tmp_path):
    zip_base = str(tmp_path / "howard_spark_pkg")
    shutil.make_archive(zip_base, "zip", root_dir=REPO,
                        base_dir="howard_spark")
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", zip_base + ".zip",
         os.path.join(REPO, "scripts", "submit_job.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=240,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload == {"rows": 500, "sha_mismatches": 0}
