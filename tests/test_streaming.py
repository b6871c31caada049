"""Streaming tier tests.

1. The DOC_LOCAL_RULES list is a PROVEN property: every listed rule must
   produce identical violations when the corpus is validated in two
   independent halves vs whole (split-invariance).  Corpus-scoped rules
   must demonstrably fail the property on this corpus, so a rule can't
   drift into the wrong tier silently.
2. validate_stream end-to-end: exactly-once per file (checkpoint), the
   streamed violations equal the batch engine's over the same docs, and
   appending a new file + re-draining processes ONLY the new docs.
3. The watermarked streaming hourly rollup equals the batch rollup.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df, drop=()):
    # sorted column names: a hive-partitioned read-back appends the
    # partition column last, so positional order is not comparable
    cols = sorted(c for c in df.columns if c not in drop)
    return {tuple(map(str, r)) for r in df.select(*cols).collect()}


@pytest.fixture(scope="module")
def corpus_df(spark):
    from gwv_spark.corpus import spark_generate

    df = spark_generate(spark, 3000, partitions=4).cache()
    df.count()
    return df


def test_doc_local_rules_are_split_invariant(spark, corpus_df):
    from gwv_spark import engine
    from gwv_spark.rules import RULES, load_all_rules
    from gwv_spark.streaming import CORPUS_SCOPED_RULES, DOC_LOCAL_RULES

    load_all_rules()
    assert sorted(DOC_LOCAL_RULES + CORPUS_SCOPED_RULES) == sorted(RULES)

    docs = corpus_df.select("doc_id", "spans")
    half_a = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    half_b = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)
    ctx_full = engine.make_context(spark, docs, cache=False)
    ctx_a = engine.make_context(spark, half_a, cache=False)
    ctx_b = engine.make_context(spark, half_b, cache=False)

    for rid in DOC_LOCAL_RULES:
        full = _rows(RULES[rid](ctx_full))
        split = _rows(RULES[rid](ctx_a)) | _rows(RULES[rid](ctx_b))
        assert full == split, f"{rid} declared doc-local but is split-variant"

    # the tier boundary is real: at least the referential/existence rules
    # must fail split-invariance on this corpus (if they didn't, the
    # corpus would be too weak for the positive assertion above to mean
    # anything)
    variant = []
    for rid in CORPUS_SCOPED_RULES:
        full = _rows(RULES[rid](ctx_full))
        split = _rows(RULES[rid](ctx_a)) | _rows(RULES[rid](ctx_b))
        if full != split:
            variant.append(rid)
    assert {"delquote", "delvar", "kosekitoki"} <= set(variant)


def test_validate_stream_exactly_once_and_incremental(spark, corpus_df, tmp_path):
    from gwv_spark import engine
    from gwv_spark.streaming import DOC_LOCAL_RULES, validate_stream_drain

    landing = tmp_path / "landing"
    out = tmp_path / "out"
    landing.mkdir()

    docs = corpus_df.select("doc_id", "related", F.col("ts"), "spans")
    part1 = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) < 2)
    part2 = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 2)
    part1.coalesce(1).write.mode("overwrite").parquet(str(landing / "drop1"))

    validate_stream_drain(spark, str(landing / "*"), str(out))

    streamed1 = spark.read.parquet(str(out / "violations"))
    ctx1 = engine.make_context(spark, part1.select("doc_id", "spans"), cache=False)
    batch1 = engine.run_rules(ctx1, DOC_LOCAL_RULES)
    assert _rows(streamed1, drop=("epoch_id",)) == _rows(batch1)

    # drain again with NO new files: nothing reprocessed
    validate_stream_drain(spark, str(landing / "*"), str(out))
    metrics = spark.read.parquet(str(out / "metrics"))
    n_docs_after_noop = metrics.agg(F.sum("n_docs")).collect()[0][0]
    assert n_docs_after_noop == part1.count()

    # append a second drop: only ITS docs are processed, and the union of
    # streamed violations equals the batch run over the full corpus
    part2.coalesce(1).write.mode("overwrite").parquet(str(landing / "drop2"))
    validate_stream_drain(spark, str(landing / "*"), str(out))
    metrics = spark.read.parquet(str(out / "metrics"))
    assert metrics.agg(F.sum("n_docs")).collect()[0][0] == docs.count()

    streamed_all = spark.read.parquet(str(out / "violations"))
    ctx_full = engine.make_context(
        spark, docs.select("doc_id", "spans"), cache=False
    )
    batch_full = engine.run_rules(ctx_full, DOC_LOCAL_RULES)
    assert _rows(streamed_all, drop=("epoch_id",)) == _rows(batch_full)

    # verdict lineage: every epoch wrote verdict rows tagged epoch=<n>
    verdicts = spark.read.parquet(str(out / "verdicts"))
    assert verdicts.where(~F.col("run_id").startswith("epoch=")).count() == 0
    assert verdicts.count() > 0


def test_epoch_retry_is_idempotent(spark, corpus_df, tmp_path):
    """Spark's foreachBatch delivery is at-least-once: an epoch that
    fails after a partial sink write is retried with the SAME batch and
    epoch_id.  The epoch-keyed dynamic-partition-overwrite sinks must
    make that retry a no-op (exactly-once end to end): re-invoking the
    batch processor with the same (batch, epoch_id) leaves every sink
    with exactly one epoch's worth of rows — and rows for OTHER epochs
    are untouched."""
    from gwv_spark.streaming import DOC_LOCAL_RULES, make_batch_processor

    out = tmp_path / "out"
    docs = corpus_df.select("doc_id", "related", "ts", "spans")
    part1 = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    part2 = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)

    process = make_batch_processor(
        spark, str(out), list(DOC_LOCAL_RULES), resolve_entity=False
    )
    process(part1, 0)
    process(part2, 1)
    before = {
        sink: _rows(spark.read.parquet(str(out / sink)), drop=("wall_s",))
        for sink in ("violations", "verdicts", "metrics")
    }
    assert before["violations"]  # non-trivial corpus

    # the retry: epoch 1 re-delivered verbatim
    process(part2, 1)
    for sink in ("violations", "verdicts", "metrics"):
        after = _rows(spark.read.parquet(str(out / sink)), drop=("wall_s",))
        assert after == before[sink], f"{sink} changed on epoch retry"


def test_doc_local_plans_shuffle_free_without_entity_resolution(spark, corpus_df):
    """With resolve_entity=False (the streaming microbatch context) every
    doc-local rule must compile to a narrow, shuffle-free plan — zero
    Exchange operators.  This is the property that makes the stream tier
    embarrassingly parallel at any batch size."""
    from gwv_spark import engine
    from gwv_spark.rules import RULES, load_all_rules
    from gwv_spark.streaming import DOC_LOCAL_RULES

    load_all_rules()
    ctx = engine.make_context(
        spark, corpus_df.select("doc_id", "spans"),
        cache=False, resolve_entity=False,
    )
    for rid in DOC_LOCAL_RULES:
        plan = RULES[rid](ctx)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{rid} plan shuffles:\n{plan[:2000]}"


def test_validate_stream_rejects_corpus_scoped_rules(spark, tmp_path):
    from gwv_spark.streaming import validate_stream

    with pytest.raises(ValueError, match="delquote"):
        validate_stream(
            spark, str(tmp_path / "in"), str(tmp_path / "out"),
            rule_ids=["corner", "delquote"],
        )


def test_stream_drift_monitor_matches_batch_psi(spark, corpus_df, tmp_path):
    """The stateful running-PSI stream must converge to exactly the
    batch snapshot_psi over the full corpus: state accumulates across
    microbatches (maxFilesPerTrigger=1 forces one epoch per file), and a
    second drain continues from checkpointed state."""
    from pyspark.sql.window import Window

    from gwv_spark import derive, stats
    from gwv_spark.streaming import stream_drift_monitor_drain

    landing = tmp_path / "landing"
    landing.mkdir()
    docs = corpus_df.select("doc_id", "related", "ts", "spans")
    part1 = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) < 2)
    part2 = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 2)

    prepared1 = derive.prepare(part1.select("doc_id", "spans"))
    snap1 = stats.corpus_snapshot(prepared1, derive.exploded_spans(prepared1))
    baseline = {
        (r["metric"], r["bucket"]): r["value"]
        for r in snap1.collect()
        if r["metric"] in ("span_len_hist", "kind_freq")
    }

    part1.coalesce(1).write.mode("overwrite").parquet(str(landing / "d1"))
    part2.coalesce(1).write.mode("overwrite").parquet(str(landing / "d2"))
    updates = stream_drift_monitor_drain(
        spark, str(landing / "*"), str(tmp_path / "drift"), baseline,
        max_files_per_trigger=1,
    )
    # one update row per metric per epoch, epochs advanced past 0
    assert updates.select("epoch_id").distinct().count() >= 2
    last = (
        updates.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("metric").orderBy(F.col("n_seen").desc())
            ),
        )
        .where(F.col("rn") == 1)
        .select("metric", "psi")
    )
    stream_psi = {r["metric"]: r["psi"] for r in last.collect()}

    prepared_full = derive.prepare(docs.select("doc_id", "spans"))
    snap_full = stats.corpus_snapshot(
        prepared_full, derive.exploded_spans(prepared_full)
    )
    batch_psi = {
        r["metric"]: r["psi"]
        for r in stats.snapshot_psi(snap_full, snap1).collect()
    }
    assert set(stream_psi) == {"span_len_hist", "kind_freq"}
    for m, v in batch_psi.items():
        assert abs(stream_psi[m] - v) < 1e-5, (m, stream_psi[m], v)


def test_stream_job_cli_drains_and_resumes(spark, corpus_df, tmp_path):
    """The spark-submit entrypoint: drain validates everything once;
    a second invocation with the same checkpoint is a no-op; an unknown
    or corpus-scoped rule fails fast."""
    from gwv_spark import stream_job

    landing = tmp_path / "landing"
    out = tmp_path / "out"
    landing.mkdir()
    docs = corpus_df.select("doc_id", "related", "ts", "spans").limit(500)
    docs.coalesce(1).write.mode("overwrite").parquet(str(landing / "d1"))

    argv = ["--input", str(landing / "*"), "--output", str(out),
            "--rules", "corner", "numexp"]
    stream_job.main(argv, spark=spark)
    v1 = spark.read.parquet(str(out / "violations"))
    assert set(r["rule_id"] for r in v1.select("rule_id").distinct().collect()) \
        <= {"corner", "numexp"}
    n1 = v1.count()

    stream_job.main(argv, spark=spark)  # no new files -> no new rows
    assert spark.read.parquet(str(out / "violations")).count() == n1

    with pytest.raises(ValueError, match="mustrenew"):
        stream_job.main(
            ["--input", str(landing / "*"), "--output", str(out),
             "--rules", "mustrenew"],
            spark=spark,
        )


def test_two_tier_stream_plus_batch_covers_full_suite(spark, corpus_df, tmp_path):
    """The deployment architecture end to end: the stream tier validates
    doc-local rules on arrival (two file drops, exactly-once), the batch
    job validates the corpus-scoped rules per snapshot — their union
    must equal the full 18-rule batch suite over the same corpus, with
    no rule lost between the tiers."""
    from gwv_spark import engine, job as jobmod
    from gwv_spark.rules import ALL_RULE_IDS
    from gwv_spark.streaming import (
        CORPUS_SCOPED_RULES,
        validate_stream_drain,
    )

    landing = tmp_path / "landing"
    sout = tmp_path / "stream_out"
    bout = tmp_path / "batch_out"
    landing.mkdir()
    docs = corpus_df.select("doc_id", "related", "ts", "spans")
    part1 = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    part2 = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)

    # stream tier: two drops, drained as they land
    part1.coalesce(1).write.mode("overwrite").parquet(str(landing / "d1"))
    validate_stream_drain(spark, str(landing / "*"), str(sout))
    part2.coalesce(1).write.mode("overwrite").parquet(str(landing / "d2"))
    validate_stream_drain(spark, str(landing / "*"), str(sout))
    stream_v = spark.read.parquet(str(sout / "violations"))

    # batch tier: the corpus-scoped rules over the full snapshot
    corpus_path = tmp_path / "corpus"
    docs.select("doc_id", "spans").write.mode("overwrite").parquet(
        str(corpus_path)
    )
    jobmod.main(
        ["--input", str(corpus_path), "--output", str(bout),
         "--rules", *CORPUS_SCOPED_RULES, "--n-buckets", "32"],
        spark=spark,
    )
    batch_v = spark.read.parquet(str(bout / "violations"))

    combined = _rows(stream_v, drop=("epoch_id",)) | _rows(batch_v)
    ctx = engine.make_context(spark, docs.select("doc_id", "spans"), cache=False)
    full = _rows(engine.run_rules(ctx, ALL_RULE_IDS))
    assert combined == full


def _write_gdata_drop(spark, path, rows):
    """rows: [(doc_id, gdata)] → one parquet file matching DOCS_SCHEMA."""
    from gwv_spark import parse

    df = spark.createDataFrame(rows, "doc_id STRING, gdata STRING").select(
        "doc_id",
        F.lit(None).cast("string").alias("related"),
        F.lit(0.0).alias("ts"),
        parse.gdata_to_spans(F.col("gdata")).alias("spans"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(path))
    return df


def _batch_ri_core(spark, docs):
    """Labeled union of the two batch RI cores over ``docs`` —
    the ground truth the incremental tier must reproduce."""
    from gwv_spark import engine
    from gwv_spark.rules.delquote import missing_quotes
    from gwv_spark.rules.delvar import missing_bases

    ctx = engine.make_context(spark, docs.select("doc_id", "spans"), cache=False)
    dq = missing_quotes(ctx).select(
        F.lit("delquote").alias("rule_id"),
        "doc_id",
        F.col("part_full").alias("detail"),
    )
    dv = missing_bases(ctx).select(
        F.lit("delvar").alias("rule_id"), "doc_id", F.col("base").alias("detail")
    )
    return dq.unionByName(dv)


def test_stream_ri_retraction_semantics(spark, tmp_path):
    """Deterministic add/retract lifecycle: a dangling quote and a
    dangling variant base become violations on arrival and are RETRACTED
    the moment the referenced document lands; references that are never
    satisfied stay outstanding.  After each drain the folded view equals
    the batch RI cores over the corpus-so-far."""
    from gwv_spark.streaming import ri_outstanding, stream_ri_drain

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "ri")

    # drop 1: u4e00 quotes u4e02@3 (lands in drop 2) and u9999 (never
    # lands); u4e01-var-001 derives base u4e01 (lands in drop 2)
    drop1 = [
        ("u4e00", "99:0:0:10:10:90:90:u4e02@3$99:0:0:10:10:90:90:u9999"),
        ("u4e01-var-001", "1:0:0:10:10:90:90"),
    ]
    d1 = _write_gdata_drop(spark, landing / "d1", drop1)
    updates = stream_ri_drain(spark, str(landing / "*"), out)
    # _rows sorts columns by name: (detail, doc_id, rule_id)
    expect1 = {
        ("u4e02@3", "u4e00", "delquote"),
        ("u9999", "u4e00", "delquote"),
        ("u4e01", "u4e01-var-001", "delvar"),
    }
    assert _rows(ri_outstanding(updates)) == expect1
    assert _rows(ri_outstanding(updates)) == _rows(_batch_ri_core(spark, d1))

    # drop 2: u4e02 and u4e01 land (two retractions); u4e03 adds a fresh
    # dangling quote of u9999
    drop2 = [
        ("u4e02", "1:0:0:10:10:90:90"),
        ("u4e01", "1:0:0:10:10:90:90"),
        ("u4e03", "99:0:0:10:10:90:90:u9999"),
    ]
    d2 = _write_gdata_drop(spark, landing / "d2", drop2)
    updates = stream_ri_drain(spark, str(landing / "*"), out)
    rets = {
        (r["rule_id"], r["doc_id"], r["detail"])
        for r in updates.where(F.col("op") == "retract").collect()
    }
    assert rets == {
        ("delquote", "u4e00", "u4e02@3"),
        ("delvar", "u4e01-var-001", "u4e01"),
    }
    expect2 = {
        ("u9999", "u4e00", "delquote"),
        ("u9999", "u4e03", "delquote"),
    }
    assert _rows(ri_outstanding(updates)) == expect2
    assert _rows(ri_outstanding(updates)) == _rows(
        _batch_ri_core(spark, d1.unionByName(d2))
    )


def test_stream_ri_matches_batch_per_drop_on_corpus(spark, corpus_df, tmp_path):
    """On the generated corpus, landed in three drops: after every drain
    the folded incremental view must equal the batch anti-join cores over
    the accumulated documents — the probe extractors cannot drift from
    the batch rules."""
    from gwv_spark.streaming import ri_outstanding, stream_ri_drain

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "ri")
    docs = corpus_df.select("doc_id", "related", "ts", "spans")
    drops = [
        docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i) for i in range(3)
    ]
    acc = None
    for i, drop in enumerate(drops):
        drop.coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"d{i}")
        )
        acc = drop if acc is None else acc.unionByName(drop)
        updates = stream_ri_drain(spark, str(landing / "*"), out)
        assert _rows(ri_outstanding(updates)) == _rows(
            _batch_ri_core(spark, acc)
        ), f"incremental RI diverged from batch after drop {i}"
    # the corpus actually exercises retraction (a quoted part landing
    # after its quoter) — otherwise the per-drop assertions above would
    # be vacuously add-only
    assert updates.where(F.col("op") == "retract").count() > 0

    # full violations-schema equivalence: the projected outstanding view
    # is row-identical to the batch rules, so the two tiers' sinks union
    from gwv_spark import engine
    from gwv_spark.rules import RULES, load_all_rules
    from gwv_spark.streaming import ri_outstanding_violations

    load_all_rules()
    ctx = engine.make_context(spark, docs.select("doc_id", "spans"), cache=False)
    batch_v = RULES["delquote"](ctx).unionByName(RULES["delvar"](ctx))
    assert _rows(ri_outstanding_violations(updates)) == _rows(batch_v)


def test_stream_ri_sharded_equals_unsharded(spark, tmp_path):
    """n_shards spreads a hot probe key over independent state
    partitions, and the RocksDB state-store provider is the setting for
    state beyond executor heaps; the emitted change stream must be
    identical under every configuration.  The hot key here: 60
    documents all quoting the same missing part, which then lands (60
    retractions through 4 shards)."""
    from gwv_spark.streaming import stream_ri_drain

    hot = [
        (f"u5{i:03x}", "99:0:0:10:10:90:90:u9998@1") for i in range(60)
    ]
    results = {}
    configs = [(1, False), (4, False), (1, True)]  # (n_shards, rocksdb)
    for shards, rocksdb in configs:
        tag = f"{shards}{int(rocksdb)}"
        landing = tmp_path / f"landing{tag}"
        landing.mkdir()
        out = str(tmp_path / f"ri{tag}")
        _write_gdata_drop(spark, landing / "d1", hot)
        stream_ri_drain(spark, str(landing / "*"), out, n_shards=shards,
                        rocksdb_state=rocksdb)
        _write_gdata_drop(
            spark, landing / "d2", [("u9998", "1:0:0:10:10:90:90")]
        )
        updates = stream_ri_drain(spark, str(landing / "*"), out,
                                  n_shards=shards, rocksdb_state=rocksdb)
        results[(shards, rocksdb)] = _rows(updates, drop=("epoch_id",))
        # the provider conf must not leak out of the drain
        assert spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        ) is None or "RocksDB" not in spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )
    assert results[(1, False)] == results[(4, False)] == results[(1, True)]
    n_rets = sum(1 for r in results[(4, False)] if "retract" in r)
    assert n_rets == 60


def test_stream_job_cli_ri_mode(spark, tmp_path):
    """The spark-submit entrypoint's --ri mode writes the add/retract
    change log; --rules is rejected alongside it (the RI pair is
    fixed)."""
    from gwv_spark import stream_job

    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "ri"
    _write_gdata_drop(
        spark, landing / "d1", [("u4e00", "99:0:0:10:10:90:90:u9999")]
    )
    stream_job.main(
        ["--input", str(landing / "*"), "--output", str(out), "--ri"],
        spark=spark,
    )
    updates = spark.read.parquet(str(out / "updates"))
    assert _rows(updates, drop=("epoch_id",)) == {
        ("u9999", "u4e00", "add", "u9999", "delquote"),
    }

    with pytest.raises(SystemExit):
        stream_job.main(
            ["--input", "x", "--output", "y", "--ri", "--rules", "corner"],
            spark=spark,
        )


def test_three_tier_deployment_covers_full_suite(spark, corpus_df, tmp_path):
    """The full deployment story with the incremental RI tier in play:
    doc-local rules validate on arrival (stream tier), delquote/delvar
    stay current through the incremental RI monitor (folded to
    violation rows), and only the REMAINING corpus-scoped rules wait
    for the batch snapshot job — the union of the three tiers must
    equal the full 18-rule batch suite, with no rule lost or double-
    counted between tiers."""
    from gwv_spark import engine, job as jobmod
    from gwv_spark.rules import ALL_RULE_IDS
    from gwv_spark.streaming import (
        CORPUS_SCOPED_RULES,
        INCREMENTAL_RI_RULES,
        ri_outstanding_violations,
        stream_ri_drain,
        validate_stream_drain,
    )

    landing = tmp_path / "landing"
    sout = tmp_path / "stream_out"
    riout = str(tmp_path / "ri_out")
    bout = tmp_path / "batch_out"
    landing.mkdir()
    docs = corpus_df.select("doc_id", "related", "ts", "spans")
    part1 = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    part2 = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)

    # tiers 1+2 drain after each drop, exactly as deployed
    part1.coalesce(1).write.mode("overwrite").parquet(str(landing / "d1"))
    validate_stream_drain(spark, str(landing / "*"), str(sout))
    stream_ri_drain(spark, str(landing / "*"), riout)
    part2.coalesce(1).write.mode("overwrite").parquet(str(landing / "d2"))
    validate_stream_drain(spark, str(landing / "*"), str(sout))
    ri_updates = stream_ri_drain(spark, str(landing / "*"), riout)

    stream_v = spark.read.parquet(str(sout / "violations"))
    ri_v = ri_outstanding_violations(ri_updates)

    # tier 3: only the rules neither streaming tier owns
    rest = [r for r in CORPUS_SCOPED_RULES if r not in INCREMENTAL_RI_RULES]
    corpus_path = tmp_path / "corpus"
    docs.select("doc_id", "spans").write.mode("overwrite").parquet(
        str(corpus_path)
    )
    jobmod.main(
        ["--input", str(corpus_path), "--output", str(bout),
         "--rules", *rest, "--n-buckets", "32"],
        spark=spark,
    )
    batch_v = spark.read.parquet(str(bout / "violations"))

    combined = (
        _rows(stream_v, drop=("epoch_id",)) | _rows(ri_v) | _rows(batch_v)
    )
    ctx = engine.make_context(spark, docs.select("doc_id", "spans"), cache=False)
    full = _rows(engine.run_rules(ctx, ALL_RULE_IDS))
    assert combined == full


def test_stream_simhash_near_dup_matches_batch(spark, tmp_path):
    """Incremental near-dup detection: (1) the per-row Python SimHash
    must equal the batch Catalyst expression bit-for-bit (they cannot
    drift silently); (2) after landing the corpus in two drops, the
    deduped pair log equals the batch simhash_near_pairs over the full
    table; (3) pairs whose members arrived in DIFFERENT drops are
    discovered at the second drain — the on-arrival property."""
    import os

    from gwv_spark import textops
    from gwv_spark.streaming import (
        _simhash64_batch,
        _simhash64_py,
        simhash_pairs_view,
        stream_simhash_drain,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not available")
    df = spark.read.parquet(path).select("doc_id", "text")

    cat = {r["doc_id"]: r["simhash"] for r in textops.simhash64(df).collect()}
    local = df.collect()
    for r in local:
        assert _simhash64_py(r["text"]) == cat[r["doc_id"]], r["doc_id"]
    # the vectorized streaming batch (r5: no per-element Python map)
    # must ALSO be bit-identical — including blank/empty/None edge rows
    import pandas as pd

    texts = pd.Series([r["text"] for r in local] + ["", None, "   "])
    vec = _simhash64_batch(texts)
    for j, r in enumerate(local):
        assert int(vec.iloc[j]) == cat[r["doc_id"]], r["doc_id"]
    assert list(vec.iloc[-3:]) == [0, 0, 0]
    # chunked token-axis path (r5 memory bound): force tiny chunks so
    # doc groups split mid-series — including a single doc longer than
    # the chunk — and assert bit-identity is unchanged
    from gwv_spark import streaming as _st

    saved = _st._SIMHASH_CHUNK_TOKENS
    try:
        _st._SIMHASH_CHUNK_TOKENS = 7
        long_doc = " ".join(f"tok{i}" for i in range(50))
        texts2 = pd.Series([r["text"] for r in local] + [long_doc])
        vec2 = _simhash64_batch(texts2)
        for j, r in enumerate(local):
            assert int(vec2.iloc[j]) == cat[r["doc_id"]], r["doc_id"]
        assert int(vec2.iloc[-1]) == _simhash64_py(long_doc)
    finally:
        _st._SIMHASH_CHUNK_TOKENS = saved

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "nd")
    even = df.where(F.col("doc_id") % 2 == 0)
    odd = df.where(F.col("doc_id") % 2 == 1)
    even.coalesce(1).write.parquet(str(landing / "d1"))
    stream_simhash_drain(spark, str(landing / "*"), out)
    odd.coalesce(1).write.parquet(str(landing / "d2"))
    log = stream_simhash_drain(spark, str(landing / "*"), out)

    batch = textops.simhash_near_pairs(df)
    assert _rows(simhash_pairs_view(log)) == _rows(batch)

    cross_late = log.where(
        (F.col("epoch_id") >= 1) & (F.col("doc_a") % 2 != F.col("doc_b") % 2)
    )
    assert cross_late.count() > 0, "no cross-drop pair discovered on arrival"


def test_stream_events_hourly_matches_batch(spark, tmp_path):
    import os

    from gwv_spark import queries as Q
    from gwv_spark.streaming import stream_events_hourly_drain

    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    events_path = f"{sf_dir}/events.parquet"
    if not os.path.exists(events_path):
        pytest.skip("testdata not available")

    # the file stream source requires a DIRECTORY of files
    landing = tmp_path / "events"
    landing.mkdir()
    os.symlink(events_path, landing / "events-000.parquet")
    streamed = stream_events_hourly_drain(
        spark, str(landing), str(tmp_path / "roll")
    )
    batch = Q.REGISTRY["events_hourly_rollup"].spark_fn(spark, sf_dir)
    assert _rows(streamed) == _rows(batch)


def test_stream_job_compact_after_drain(spark, corpus_df, tmp_path):
    """--compact-after: two drops produce per-epoch small files in every
    sink; the post-drain maintenance bin-packs them per partition leaf
    without changing any content, and a THIRD drop's epoch still commits
    normally afterwards (partition layout intact)."""
    from gwv_spark import stream_job

    landing = tmp_path / "landing"
    out = tmp_path / "out"
    landing.mkdir()
    docs = corpus_df.select("doc_id", "related", "ts", "spans").limit(400)
    half = 200
    d1 = docs.limit(half)
    d2 = docs.subtract(d1)
    d1.coalesce(1).write.parquet(str(landing / "d1"))
    argv = ["--input", str(landing / "*"), "--output", str(out),
            "--rules", "numexp", "order"]
    stream_job.main(argv, spark=spark)
    d2.coalesce(1).write.parquet(str(landing / "d2"))
    stream_job.main(argv, spark=spark)

    vio_dir = out / "violations"
    before = sorted(
        (r["rule_id"], r["errcode"], r["doc_id"])
        for r in spark.read.parquet(str(vio_dir)).collect()
    )
    n_files_before = len(list(vio_dir.rglob("*.parquet")))

    stream_job.main(argv + ["--compact-after", str(1 << 30)], spark=spark)
    after = sorted(
        (r["rule_id"], r["errcode"], r["doc_id"])
        for r in spark.read.parquet(str(vio_dir)).collect()
    )
    assert after == before
    assert len(list(vio_dir.rglob("*.parquet"))) <= n_files_before

    # continuous mode refuses the maintenance action
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        stream_job.main(
            argv + ["--compact-after", "1024", "--continuous", "1 second"],
            spark=spark,
        )
