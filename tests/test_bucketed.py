"""Bucketed co-partitioned layout (gwv_spark/bucketed.py): same
violation sets as the shuffled RI rules, with the shuffle moved to
ingest time — the executed plans must show ZERO Exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ctx(spark):
    from gwv_spark import engine
    from gwv_spark.corpus import spark_generate

    docs = spark_generate(spark, 2500, partitions=4)
    return engine.make_context(spark, docs, cache=True)


@pytest.fixture(scope="module")
def tables(spark, ctx, tmp_path_factory):
    from gwv_spark import bucketed

    path = str(tmp_path_factory.mktemp("bucketed"))
    tables = bucketed.materialize(ctx, path, n_buckets=4, prefix="t_gwv_b")
    yield tables
    bucketed.drop(spark, tables)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _executed(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_delquote_bucketed_matches_shuffled(spark, ctx, tables):
    from gwv_spark import bucketed
    from gwv_spark.rules.delquote import missing_quotes

    assert _rows(bucketed.delquote_missing(spark, tables)) == _rows(
        missing_quotes(ctx)
    )


def test_delvar_bucketed_matches_shuffled(spark, ctx, tables):
    from gwv_spark import bucketed
    from gwv_spark.rules.delvar import missing_bases

    assert _rows(bucketed.delvar_missing(spark, tables)) == _rows(
        missing_bases(ctx)
    )


def test_uniqueness_bucketed_matches_shuffled(spark, ctx, tables):
    """Parity with the shuffled stats-tier uniqueness check.  The 2500-doc
    generator slice happens to contain a real doc_id collision, so this
    exercises the non-empty path."""
    from gwv_spark import bucketed

    shuffled = (
        ctx.docs.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
    got = _rows(bucketed.uniqueness(spark, tables))
    assert got == _rows(shuffled)
    assert len(got) >= 1  # the collision is present, the check sees it


def test_ri_anti_join_plans_have_zero_exchange(spark, tables):
    """The 100-TB property this layout exists for: both RI anti joins
    execute as SortMergeJoin LeftAnti with NO Exchange and NO Sort on
    either side (the bucketed+sorted files satisfy the join's
    distribution and ordering requirements).  AQE broadcast conversion
    is disabled for the assertion — at 10^12 keys neither side
    broadcasts, SMJ is the real shape."""
    from gwv_spark import bucketed

    prev = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        for df in (
            bucketed.delquote_missing(spark, tables),
            bucketed.delvar_missing(spark, tables),
        ):
            plan = _executed(df)
            assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan
            assert "Exchange" not in plan, plan
            assert "Sort " not in plan.replace("SortMergeJoin", ""), plan
    finally:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)


def test_uniqueness_plan_has_zero_exchange(spark, tables):
    from gwv_spark import bucketed

    plan = _executed(bucketed.uniqueness(spark, tables))
    assert "Exchange" not in plan, plan


def test_shuffled_baseline_does_exchange(spark, ctx):
    """Sanity check on the assertion itself: the NON-bucketed rule plan
    over the same corpus does contain an Exchange — so the zero-Exchange
    assertions above are measuring the layout, not a vacuous string."""
    from gwv_spark.rules.delquote import missing_quotes

    plan = _executed(missing_quotes(ctx))
    assert "Exchange" in plan, plan


def test_bucketed_scan_prunes_columns(spark, tables):
    """Column pruning reaches the bucketed files: a key-only projection
    reads only the key column."""
    df = spark.table(tables["quotes"]).select("key")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "part_full" not in plan.split("ReadSchema")[-1], plan


def test_installed_plans_match_rules(spark, ctx, tables):
    """install() substitutes the bucketed plans through the rules' own
    shape projections: the full violation rows (schema included) must
    equal the shuffled rules' rows."""
    from gwv_spark import bucketed, engine

    ctx2 = engine.make_context(spark, ctx.docs)
    bucketed.install(ctx2, tables)
    for rid in ("delquote", "delvar"):
        got = ctx2.plan(rid)
        want = ctx.plan(rid)
        assert got.columns == want.columns
        assert _rows(got) == _rows(want)


def test_attach_survives_catalog_loss(spark, ctx, tmp_path_factory):
    """A fresh Spark session has no saveAsTable registrations; attach()
    must rebuild them from the recorded DDL and keep the zero-Exchange
    property."""
    from gwv_spark import bucketed

    path = str(tmp_path_factory.mktemp("bucketed_attach"))
    tables = bucketed.materialize(
        ctx, path, n_buckets=4, prefix="t_gwv_att", snapshot="snapA"
    )
    before = _rows(bucketed.delquote_missing(spark, tables))
    # simulate the fresh session: drop every catalog entry (data stays)
    for t in tables.values():
        spark.sql(f"DROP TABLE {t}")
    meta = bucketed.read_meta(spark, path)
    assert meta["snapshot"] == "snapA" and int(meta["n_buckets"]) == 4
    reattached = bucketed.attach(spark, path, meta)
    assert reattached == tables
    df = bucketed.delquote_missing(spark, reattached)
    assert _rows(df) == before
    plan = _executed(df)
    assert "Exchange" not in plan, plan
    bucketed.drop(spark, tables)


def test_job_bucketed_lifecycle(spark, tmp_path):
    """job.py --bucketed end-to-end: violations identical to the
    shuffled run; the layout is REUSED while the snapshot matches and
    REBUILT when the corpus grows."""
    import pyarrow.parquet as pq

    from gwv_spark import bucketed, job
    from gwv_spark.corpus import ensure_corpus

    full = ensure_corpus(tmp_path / "gen_bkt", 460)
    table = pq.read_table(full / "documents.parquet")
    corpus = tmp_path / "corpus_bkt"
    corpus.mkdir()
    pq.write_table(table.slice(0, 400), corpus / "part-000.parquet")
    inp = str(corpus)
    rules = ["--rules", "delquote", "delvar", "numexp"]
    lay = str(tmp_path / "layout_bkt")

    job.main(["--input", inp, "--output", str(tmp_path / "out_plain"), *rules],
             spark=spark)
    job.main(["--input", inp, "--output", str(tmp_path / "out_bkt"),
              "--bucketed", lay, "--bucketed-buckets", "4", *rules],
             spark=spark)
    plain = spark.read.parquet(str(tmp_path / "out_plain" / "violations"))
    bkt = spark.read.parquet(str(tmp_path / "out_bkt" / "violations"))
    assert _rows(plain) == _rows(bkt)
    assert plain.where("rule_id = 'delquote'").count() > 0

    # second run against the same snapshot: the layout must be reused,
    # not rebuilt — pin via the meta file's modification time
    meta1 = bucketed.read_meta(spark, lay)
    job.main(["--input", inp, "--output", str(tmp_path / "out_bkt2"),
              "--bucketed", lay, "--bucketed-buckets", "4", *rules],
             spark=spark)
    meta2 = bucketed.read_meta(spark, lay)
    assert meta2 == meta1  # same snapshot, same spec — untouched

    # grow the corpus: a new snapshot must REBUILD the layout, and the
    # bucketed run must match the shuffled run over the grown corpus
    pq.write_table(table.slice(400, 60), corpus / "part-001.parquet")
    job.main(["--input", inp, "--output", str(tmp_path / "out_plain3"), *rules],
             spark=spark)
    job.main(["--input", inp, "--output", str(tmp_path / "out_bkt3"),
              "--bucketed", lay, "--bucketed-buckets", "4", *rules],
             spark=spark)
    meta3 = bucketed.read_meta(spark, lay)
    assert meta3["snapshot"] != meta1["snapshot"]
    assert _rows(spark.read.parquet(str(tmp_path / "out_plain3" / "violations"))) == \
        _rows(spark.read.parquet(str(tmp_path / "out_bkt3" / "violations")))


def test_append_then_compact_lifecycle(spark, tmp_path):
    """r5 lifecycle: materialize over a base corpus, APPEND a delta
    (insertInto through the bucket specs — no rebuild), then COMPACT
    back to one file per bucket.

    Asserted at each stage: (1) RI/uniqueness results equal a
    from-scratch materialization over the full corpus; (2) fragmented
    plans stay Exchange-free but the sort claim is off (Sorts
    reappear); (3) after compact_layout every bucket is a single file,
    the claim is back on, and the plans are Sort-free again."""
    import re

    from gwv_spark import bucketed, engine
    from gwv_spark.corpus import spark_generate

    full = spark_generate(spark, 2000, partitions=4)
    base = full.where(F.col("doc_id") < "u")  # deterministic split
    delta = full.where(~(F.col("doc_id") < "u"))
    assert base.count() > 0 and delta.count() > 0

    path = str(tmp_path / "layout")
    ctx_base = engine.make_context(spark, base, cache=False, resolve_entity=False)
    tables = bucketed.materialize(ctx_base, path, n_buckets=4, prefix="t_app_b")

    ctx_delta = engine.make_context(spark, delta, cache=False, resolve_entity=False)
    bucketed.append_to_layout(ctx_delta, path, snapshot="s2")
    meta = bucketed.read_meta(spark, path)
    assert meta["fragmented"] and meta["snapshot"] == "s2"
    assert (
        spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
        == "false"
    )

    # parity with a from-scratch layout over the full corpus
    ctx_full = engine.make_context(spark, full, cache=False, resolve_entity=False)
    ref_path = str(tmp_path / "ref_layout")
    ref_tables = bucketed.materialize(ctx_full, ref_path, n_buckets=4, prefix="t_ref_b")

    def _check_parity():
        assert _rows(bucketed.delquote_missing(spark, tables)) == _rows(
            bucketed.delquote_missing(spark, ref_tables)
        )
        assert _rows(bucketed.delvar_missing(spark, tables)) == _rows(
            bucketed.delvar_missing(spark, ref_tables)
        )
        assert _rows(bucketed.uniqueness(spark, tables)) == _rows(
            bucketed.uniqueness(spark, ref_tables)
        )

    _check_parity()

    # fragmented: >1 file in some bucket, plans Exchange-free but Sorted
    cat_dir = tmp_path / "layout" / tables["catalog"]
    per_bucket = {}
    for p in cat_dir.glob("*.parquet"):
        m = re.search(r"_(\d{5})\.c\d{3}", p.name)
        per_bucket[m.group(1)] = per_bucket.get(m.group(1), 0) + 1
    assert max(per_bucket.values()) > 1, per_bucket
    prev = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed(bucketed.delquote_missing(spark, tables))
        assert "Exchange" not in plan, plan
        assert "Sort " in plan.replace("SortMergeJoin", ""), plan

        res = bucketed.compact_layout(spark, str(tmp_path / "layout"))
        assert not bucketed.read_meta(spark, path)["fragmented"]
        per_bucket2 = {}
        for p in cat_dir.glob("*.parquet"):
            m = re.search(r"_(\d{5})\.c\d{3}", p.name)
            per_bucket2[m.group(1)] = per_bucket2.get(m.group(1), 0) + 1
        assert per_bucket2 and max(per_bucket2.values()) == 1, per_bucket2
        _check_parity()
        plan = _executed(bucketed.delquote_missing(spark, tables))
        assert "Exchange" not in plan, plan
        assert "Sort " not in plan.replace("SortMergeJoin", ""), plan
    finally:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
        bucketed.drop(spark, tables)
        bucketed.drop(spark, ref_tables)


def test_crashed_append_marker_forces_rebuild(spark, tmp_path):
    """A crash between the appending-marker commit and the inserts must
    leave the layout flagged: append_to_layout refuses, and ensure()
    rebuilds instead of attaching partial state."""
    from gwv_spark import bucketed, engine
    from gwv_spark.corpus import spark_generate

    docs = spark_generate(spark, 400, partitions=2)
    ctx = engine.make_context(spark, docs, cache=False, resolve_entity=False)
    path = str(tmp_path / "layout")
    tables = bucketed.materialize(ctx, path, n_buckets=4, prefix="t_crash_b")
    meta = bucketed.read_meta(spark, path)
    meta["appending"] = True
    bucketed._write_meta(spark, path, meta)

    with pytest.raises(ValueError, match="crashed append"):
        bucketed.append_to_layout(ctx, path, snapshot="s2")
    # ensure() with the SAME snapshot must rebuild (marker cleared)
    rebuilt = bucketed.ensure(ctx, path, snapshot=meta["snapshot"], n_buckets=4)
    assert not bucketed.read_meta(spark, path).get("appending")
    bucketed.drop(spark, rebuilt)
    bucketed.drop(spark, tables)
