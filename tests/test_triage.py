"""Triage sampler: deterministic two-level top-K per (rule_id, errcode).

Correctness model: an independent driver-side full-sort over the SAME
priority column must produce the identical sample — the distributed
two-level selection may not lose or reorder a single winner.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gwv_spark import engine, triage
from gwv_spark.corpus import spark_generate


@pytest.fixture(scope="module")
def violations(spark):
    docs = spark_generate(spark, 800, partitions=4).select("doc_id", "spans")
    ctx = engine.make_context(spark, docs)
    v = engine.run_rules(ctx).persist()
    assert v.count() > 50, "corpus too clean for a sampling test"
    yield v
    v.unpersist()


def _reference_sample(violations_df, k: int) -> pd.DataFrame:
    """Driver-side full sort over the same Spark-computed priority."""
    pdf = triage._with_priority(violations_df).toPandas()
    pdf["detail"] = pdf["detail"].map(tuple)
    pdf = pdf.sort_values(["priority", "doc_id", "sortkey"], kind="mergesort")
    pdf["sample_rank"] = pdf.groupby(["rule_id", "errcode"]).cumcount() + 1
    pdf["n_total"] = pdf.groupby(["rule_id", "errcode"])["doc_id"].transform("size")
    out = pdf[pdf["sample_rank"] <= k]
    cols = ["rule_id", "errcode", "n_total", "sample_rank", "doc_id", "detail", "sortkey"]
    return out[cols].sort_values(cols[:4]).reset_index(drop=True)


def _collect(df) -> pd.DataFrame:
    pdf = df.toPandas()
    pdf["detail"] = pdf["detail"].map(tuple)
    # Spark's row_number is int32; the pandas reference's cumcount is
    # int64 — same values, normalize for the frame compare
    pdf["sample_rank"] = pdf["sample_rank"].astype("int64")
    cols = ["rule_id", "errcode", "n_total", "sample_rank", "doc_id", "detail", "sortkey"]
    return pdf[cols].sort_values(cols[:4]).reset_index(drop=True)


def test_matches_full_sort_reference(spark, violations):
    got = _collect(triage.sample_violations(violations, k=5))
    want = _reference_sample(violations, k=5)
    pd.testing.assert_frame_equal(got, want)


def test_deterministic_across_partitionings(spark, violations):
    a = _collect(triage.sample_violations(violations.repartition(1), k=3))
    b = _collect(triage.sample_violations(violations.repartition(17), k=3))
    pd.testing.assert_frame_equal(a, b)


def test_k_exceeds_group_size_returns_all(spark, violations):
    n = violations.count()
    got = triage.sample_violations(violations, k=n + 1)
    assert got.count() == n
    # every group fully ranked 1..n_group
    chk = got.groupBy("rule_id", "errcode").agg(
        F.max("sample_rank").alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.first("n_total").alias("t"),
    )
    bad = chk.where((F.col("mx") != F.col("n")) | (F.col("n") != F.col("t")))
    assert bad.count() == 0


def test_counts_are_exact(spark, violations):
    got = (
        triage.sample_violations(violations, k=1)
        .select("rule_id", "errcode", "n_total")
        .toPandas()
        .sort_values(["rule_id", "errcode"])
        .reset_index(drop=True)
    )
    want = (
        violations.groupBy("rule_id", "errcode")
        .agg(F.count(F.lit(1)).alias("n_total"))
        .toPandas()
        .sort_values(["rule_id", "errcode"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_stage1_is_shuffle_free(spark, violations):
    """The scan-side selection must not shuffle the violations table:
    no Exchange may appear BELOW the stage-1 MapInPandas in the plan
    tree (the only shuffles are the bounded survivor window and the
    tiny counts aggregate)."""
    plan = (
        triage.sample_violations(violations, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    map_nodes = [ln for ln in plan.splitlines() if "MapInPandas" in ln]
    assert map_nodes, "stage-1 MapInPandas missing from plan"
    # everything below the deepest MapInPandas (greater indent) must be
    # exchange-free; in Spark's tree print, children are indented further
    lines = plan.splitlines()
    idx = max(i for i, ln in enumerate(lines) if "MapInPandas" in ln)
    depth = len(lines[idx]) - len(lines[idx].lstrip(" +-:"))
    below = []
    for ln in lines[idx + 1 :]:
        d = len(ln) - len(ln.lstrip(" +-:"))
        if d <= depth:
            break
        below.append(ln)
    assert not any("Exchange" in ln for ln in below), "\n".join(below)


def test_summary_shape(spark, violations):
    s = triage.triage_summary(violations, k=3).toPandas()
    assert set(s.columns) == {"rule_id", "errcode", "n_total", "example_doc_ids"}
    assert (s["example_doc_ids"].map(len) <= 3).all()
    assert (s["example_doc_ids"].map(len) >= 1).all()
    # one row per (rule, errcode), totals match the violations table
    v = violations.groupBy("rule_id", "errcode").count().toPandas()
    assert len(s) == len(v)


# ---------------------------------------------------- generic sampler


def test_sample_per_key_deterministic_and_bounded(spark):
    """The generic corpus sampler: partitioning-invariant content,
    exactly min(k, group size) rows per key, counts exact."""
    from gwv_spark import triage

    df = spark.range(5000).select(
        (F.col("id") % 7).cast("string").alias("lang"),
        F.concat(F.lit("doc"), F.col("id").cast("string")).alias("doc_id"),
    )
    a = sorted(
        (r["lang"], r["sample_rank"], r["doc_id"], r["n_total"])
        for r in triage.sample_per_key(df.repartition(1), ["lang"], k=5).collect()
    )
    b = sorted(
        (r["lang"], r["sample_rank"], r["doc_id"], r["n_total"])
        for r in triage.sample_per_key(df.repartition(23), ["lang"], k=5).collect()
    )
    assert a == b
    per_key = {}
    for lang, rank, _, n_total in a:
        per_key.setdefault(lang, []).append(rank)
        assert n_total in (714, 715)
    assert set(per_key) == {str(i) for i in range(7)}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_key.values())

    # a key smaller than k degrades to "all of it, fully ranked"
    small = spark.createDataFrame(
        [("x", "a"), ("x", "b"), ("y", "c")], "g string, v string"
    )
    got = sorted(
        (r["g"], r["sample_rank"])
        for r in triage.sample_per_key(small, ["g"], k=10).collect()
    )
    assert got == [("x", 1), ("x", 2), ("y", 1)]


def test_sample_per_key_no_exchange_below_stage1(spark):
    from gwv_spark import triage

    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    plan = (
        triage.sample_per_key(df, ["g"], k=3, with_counts=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    pos = plan.rfind("MapInPandas")
    assert pos != -1
    assert "Exchange" not in plan[pos:], plan


def test_sample_per_key_null_keys_and_null_cells(spark):
    """Review regressions: (a) a NULL key is a real group and must be
    sampled + counted, not dropped by pandas groupby / an equi-join;
    (b) NULL cells must not make distinct rows hash-tie (xxhash64 skips
    raw NULLs), which would make the winner partition-dependent."""
    from gwv_spark import triage

    df = spark.createDataFrame(
        [("en", "a", None), ("en", None, "b"), (None, "c", "x"),
         (None, "d", None), (None, None, "e")],
        "lang string, u string, v string",
    )
    def rows_of(parts):
        return sorted(
            (
                (r["lang"] or "", r["sample_rank"], r["u"] or "", r["v"] or "",
                 r["n_total"], r["lang"] is None)
            )
            for r in triage.sample_per_key(
                df.repartition(parts), ["lang"], k=10
            ).collect()
        )

    a = rows_of(1)
    b = rows_of(5)
    assert a == b
    null_rows = [r for r in a if r[5]]
    assert len(null_rows) == 3 and all(r[4] == 3 for r in null_rows)
    en_rows = [r for r in a if r[0] == "en"]
    assert len(en_rows) == 2 and all(r[4] == 2 for r in en_rows)


def test_sample_violations_null_errcode_sampled_and_counted(spark):
    """Review regression: a NULL errcode group was counted by stage-2
    but dropped by stage-1's pandas groupby — counted yet unsampled."""
    from gwv_spark import triage

    vio = spark.createDataFrame(
        [("r1", None, "d1", ["x"], "s1"), ("r1", None, "d2", ["y"], "s2"),
         ("r1", "0", "d3", ["z"], "s3")],
        "rule_id string, errcode string, doc_id string, detail array<string>, sortkey string",
    )
    rows = triage.sample_violations(vio, k=5).collect()
    null_rows = [r for r in rows if r["errcode"] is None]
    assert len(null_rows) == 2
    assert all(r["n_total"] == 2 for r in null_rows)
