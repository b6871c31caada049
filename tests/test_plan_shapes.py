"""Physical-plan shape guards — the properties the 100 TB design rests
on, asserted so a regression shows up as a test failure, not as a
10^12-row incident.

These build plans (driver-side analysis only, no job execution).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs_df(spark):
    from gwv_spark.corpus import spark_generate

    return spark_generate(spark, 2000, partitions=4).select("doc_id", "spans")


def test_ks_no_global_single_partition_sort(spark):
    """Two-level KS: the per-value running CDF must be partitioned by
    bucket; the only SinglePartition exchanges allowed are the bounded
    bucket SUMMARY window and the single-row final aggregate."""
    from gwv_spark import stats

    df = spark.range(0, 10000).select(
        (F.col("id") % 997).cast("double").alias("v"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
    )
    ks = stats.ks_statistic(df, F.col("v"), F.col("g"), "a", "b")
    plan = _physical(ks)
    assert "hashpartitioning(bucket" in plan, "per-value window not bucket-partitioned"
    assert plan.count("Exchange SinglePartition") <= 2


def test_simhash_is_python_free(spark):
    """SimHash must stay JVM-side (round 1 ran a per-row Python loop)."""
    from gwv_spark import textops

    df = spark.createDataFrame([("d1", "hello world")], "doc_id STRING, text STRING")
    plan = _physical(textops.simhash64(df))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_no_cartesian_product_anywhere(spark):
    """No registered query may compile to a CartesianProduct: every
    cross join must be a broadcast (probe sets, 1-row totals).  Builds
    every driver-contract plan at sf0.001 — analysis only."""
    import os
    from pathlib import Path

    from gwv_spark import queries as Q

    sf_dir = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")
    if not Path(sf_dir).exists():
        pytest.skip(f"fixture dir {sf_dir} not available")
    bad = {}
    for name, spec in Q.REGISTRY.items():
        if name.startswith("gwv_"):
            continue  # rule-suite plans share _rule_ctx; covered below
        plan = _physical(spec.spark_fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            bad[name] = True
    assert not bad, f"cartesian products in: {sorted(bad)}"


def test_rule_suite_no_cartesian(spark, docs_df):
    from gwv_spark import engine

    ctx = engine.make_context(spark, docs_df)
    plan = _physical(engine.run_rules(ctx))
    assert "CartesianProduct" not in plan


def test_illegal_reads_stored_parse(spark, docs_df):
    """illegal's whole-record pass must fold over the stored per-span
    parse (docs.spans_d, derive.prepare) — at 10^12 spans, re-running
    the ~10-column kageInt parse per rule execution instead of reading
    the ingest-time column is pure waste.  Source-level: the rule module
    must not reach for parse.int_data; plan-level: the rule's plan
    references spans_d."""
    import inspect

    from gwv_spark import engine
    from gwv_spark.rules import illegal as illegal_mod

    src = inspect.getsource(illegal_mod)
    assert "int_data(" not in src, "illegal re-parses spans at rule time"

    ctx = engine.make_context(spark, docs_df)
    from gwv_spark.rules import RULES, load_all_rules

    load_all_rules()
    plan = ctx.plan("illegal")._jdf.queryExecution().analyzed().toString()
    assert "spans_d" in plan


def test_exploded_spans_zips_stored_parse(spark, docs_df):
    """exploded_spans' per-span d column must come from the stored
    spans_d array (arrays_zip), not a fresh int_data over text."""
    from gwv_spark import derive

    prepared = derive.prepare(docs_df)
    assert "spans_d" in prepared.columns
    spans = derive.exploded_spans(prepared)
    plan = spans._jdf.queryExecution().analyzed().toString()
    assert "spans_d" in plan
