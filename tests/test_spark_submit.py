"""Packaging smoke test: the engine must launch via spark-submit --py-files
(north rule) with the package imported ONLY from the shipped zip.

Runs in a scratch cwd so the repo checkout is not importable — a missing
module in the zip fails the test rather than being masked by sys.path.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("spark-submit not found")


def test_spark_submit_pyfiles_fixture(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import build_pyfiles

    zpath = build_pyfiles.build(str(tmp_path / "dist"))
    out_root = str(tmp_path / "tables")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    proc = subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zpath,
            os.path.join(REPO, "tools", "submit_job.py"),
            "--fixture",
            "--output",
            out_root,
            "--buckets",
            "4",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # repo not importable from here
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    # fixture golden counts: 25 attribute triples, 16 synapses
    assert report["attribute_triples"]["rows_written"] == 25
    assert report["synapse_triples"]["rows_written"] == 16
    assert os.path.isdir(os.path.join(out_root, "nodes", "_manifest"))
