"""Real ``spark-submit --py-files`` deployment smoke (north rule's
literal submission form): packages gwv_spark into a zip and runs the
validation job through the actual spark-submit binary via
tools/submit.sh — a separate JVM, the packaged code only.

Opt-in (GWV_SUBMIT_E2E=1), same convention as the extended fuzz sweep:
it spawns a full Spark driver JVM (~30-60 s) and the in-process CLI
tests already cover the job logic every run; this one exists to catch
packaging/entrypoint regressions (a module missing from the zip, a
job.py top-level import that only works from the repo checkout)."""

from __future__ import annotations

import os
import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(
    os.environ.get("GWV_SUBMIT_E2E") != "1",
    reason="opt-in: set GWV_SUBMIT_E2E=1 (spawns a spark-submit JVM)",
)
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    from gwv_spark.corpus import ensure_corpus

    corpus = tmp_path / "corpus"
    ensure_corpus(str(corpus), 300)
    out = tmp_path / "out"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [
            "bash", str(REPO / "tools" / "submit.sh"),
            str(corpus / "documents.parquet"), str(out),
            "--rules", "numexp", "delquote", "--n-buckets", "16",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    v = spark.read.parquet(str(out / "violations"))
    assert v.count() > 0
    assert {r["rule_id"] for r in v.select("rule_id").distinct().collect()} == {
        "numexp", "delquote"
    }
    assert spark.read.parquet(str(out / "verdicts")).count() > 0
    # the submitted run committed a snapshot manifest for its input
    from gwv_spark import catalog

    assert catalog.snapshots(str(corpus / "documents.parquet"))
