"""The literal deployment contract (north rule: "ships via
spark-submit --py-files"): build the zip, run the demo crawl through a
REAL `spark-submit` subprocess with ONLY the zip on the python path,
and assert the crawl completes with the expected counters. The module
path in the subprocess resolves from an empty temp cwd, so any import
that silently leaned on the repo checkout (instead of the shipped zip)
fails here."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_crawl(tmp_path):
    from silkworm_spark.package import build_zip

    zip_path = os.path.abspath(build_zip("dist"))
    # entry script COPIED out of the repo: the subprocess must resolve
    # every silkworm_spark import from the zip alone
    entry = tmp_path / "entry_main.py"
    shutil.copyfile(
        os.path.join(REPO, "silkworm_spark", "__main__.py"), entry
    )
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_MASTER"] = "local[4]"
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", zip_path,
            str(entry),
            "--pages", "300", "--hosts", "8", "--seeds", "20",
            "--rounds", "3", "--budget", "100",
            "--checkpoint", str(ckpt),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("rounds=")]
    assert line, proc.stdout[-2000:]
    fields = dict(kv.split("=") for kv in line[0].split())
    assert fields["rounds"] == "3"
    # 3 rounds x budget 100, minus politeness holdbacks: >0 and <=300
    assert 0 < int(fields["requests"]) <= 300
    assert int(fields["items"]) > 0
