"""Incremental batch validation over snapshot appends (``job.py
--incremental``).

At the north rule's 10^12-document design point a full validation pass
is hours of executor time, and the steady state of a monitoring
deployment is APPEND: each landing drop adds files to the corpus and
mints a new snapshot.  Recomputing the whole corpus per append — what
``--resume`` correctly does today, because a new snapshot starts a
fresh ledger — wastes ~90% of that work on documents whose verdicts
cannot have changed.  This module makes the append the unit of work:

- **Document-local rules** (streaming.DOC_LOCAL_RULES — violations
  provably depend only on the document's own columns, the
  split-invariance property tested in tests/test_streaming.py):
  validate ONLY the appended files (snapshot-manifest diff,
  catalog.commit_snapshot/snapshots) and keep prior epochs' violations
  in place.  Violations are hive-partitioned by
  ``rule_id=<r>/epoch=<snapshot>``: each epoch's partition holds the
  delta discovered at that snapshot, their union is the full set, and
  dynamic partition overwrite of the current epoch makes a retried
  append idempotent — the same exactly-once argument as the streaming
  sink (streaming.py epoch partitions).

- **Referential rules** (delquote/delvar — pure existence checks,
  reference delquote.py:22-30 / delvar.py:30-44): maintained by a
  RETRACTION FOLD over a persisted state table (the batch mirror of
  streaming.stream_ri_monitor).  ``ri_state`` holds the outstanding
  dangling-reference cores (rule_id, doc_id, key, part_full) — the
  violation row PLUS its join key, so no stored row ever needs
  re-parsing.  On append:

      kept     = state_prev  ANTI  broadcast(keys of appended docs)
      step1    = probes(appended docs)  ANTI  broadcast(appended keys)
      matched  = corpus_keys  SEMI  broadcast(step1 keys)
      fresh    = step1  ANTI  broadcast(matched)
      state    = kept ∪ fresh        (delquote deduped per probe contract)

  Append-only input means keys are never removed, so a kept row stays
  dangling without re-checking; the ONE corpus-scale scan (`matched`)
  is a column-pruned map-side pass over doc_id with a broadcast-tiny
  build side — no corpus shuffle anywhere in the fold, versus the full
  run's corpus-wide anti join.  The fold's violations replace the RI
  rules' whole partition set (their current epoch holds the COMPLETE
  set), and the shaped rows go through the rules' own
  ``shape_missing`` projections so the two paths cannot drift.

- **Remaining corpus-scoped rules** (alias dereference, corpus
  existence probes, global aggregations — j, ucsalias, mustrenew, …):
  recomputed over the full corpus, complete set under the current
  epoch.  Their verdicts genuinely depend on every document; they are
  also the cheap minority of the suite (the geometry-heavy rules are
  all document-local).

Row-identity with a from-scratch run is asserted both ways
(tests/test_incremental.py exceptAll) across multi-append chains that
include resolve-by-append and new-dangling-by-append cases.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RI_RULES = ["delquote", "delvar"]

RI_STATE_DDL = "rule_id STRING, doc_id STRING, key STRING, part_full STRING"


# ------------------------------------------------------------- RI cores


def ri_probes(ctx) -> DataFrame:
    """Doc-local RI probe rows WITH their join key: one row per
    outstanding-candidate reference in ``ctx``'s documents.

    Both probes read only the document's own columns (quote spans /
    the doc's own name), so evaluating them over a delta-only context
    yields exactly the delta's probe rows."""
    from gwv_spark.rules.delquote import quote_probe
    from gwv_spark.rules.delvar import variant_probe

    dq = quote_probe(ctx).select(
        F.lit("delquote").alias("rule_id"),
        "doc_id",
        F.col("part_base").alias("key"),
        "part_full",
    )
    dv = variant_probe(ctx).select(
        F.lit("delvar").alias("rule_id"),
        "doc_id",
        F.col("base").alias("key"),
        F.lit(None).cast("string").alias("part_full"),
    )
    return dq.unionByName(dv)


def ri_cores_full(ctx) -> DataFrame:
    """Initial state: every probe whose key is absent from the corpus —
    the same corpus-wide anti join the batch rules run (this is the
    ONE full-cost RI evaluation; every subsequent append folds)."""
    catalog = ctx.docs.select(F.col("doc_id").alias("key"))
    return ri_probes(ctx).join(catalog, "key", "left_anti")


def fold_ri_state(
    state_prev: DataFrame, ctx_delta, corpus_keys: DataFrame
) -> DataFrame:
    """One append step of the retraction fold (module docstring).

    ``corpus_keys`` is the FULL post-append key set (doc_id column of
    the current snapshot) — scanned once, map-side, against a
    broadcast of the delta's unresolved probe keys."""
    delta_keys = ctx_delta.docs.select(F.col("doc_id").alias("key")).distinct()
    # retraction: an appended doc resolves every outstanding reference
    # to its id
    kept = state_prev.join(F.broadcast(delta_keys), "key", "left_anti")
    probes = ri_probes(ctx_delta)
    step1 = probes.join(F.broadcast(delta_keys), "key", "left_anti")
    # the corpus-scale step: which of the (tiny) candidate keys exist?
    # semi join with the small side BROADCAST => one column-pruned
    # map-side scan of corpus_keys, zero shuffle of the big side
    cand_keys = step1.select("key").distinct()
    matched = corpus_keys.join(F.broadcast(cand_keys), "key", "left_semi").distinct()
    fresh = step1.join(F.broadcast(matched), "key", "left_anti")
    merged = kept.select(*state_prev.columns).unionByName(
        fresh.select(*state_prev.columns)
    )
    # quote_probe dedups (doc_id, part_full) corpus-wide; a doc row
    # duplicated across epochs must not double its quote violation.
    # delvar has no such dedup (one probe per doc ROW), matching the
    # full rule.
    dq = merged.where(F.col("rule_id") == "delquote").dropDuplicates(
        ["doc_id", "part_full"]
    )
    dv = merged.where(F.col("rule_id") == "delvar")
    return dq.unionByName(dv)


def shape_ri_state(state: DataFrame) -> DataFrame:
    """Project state rows onto the violations schema through the RI
    rules' OWN shape projections (delquote.shape_missing /
    delvar.shape_missing) — identical columns to the batch rules."""
    from gwv_spark.rules import delquote as dq_rule
    from gwv_spark.rules import delvar as dv_rule

    dq = dq_rule.shape_missing(
        state.where(F.col("rule_id") == "delquote").select("doc_id", "part_full")
    )
    dv = dv_rule.shape_missing(
        state.where(F.col("rule_id") == "delvar").select(
            "doc_id", F.col("key").alias("base")
        )
    )
    return dq.unionByName(dv)


# ------------------------------------------------------------- runs log


def record_run(spark: SparkSession, out: str, snapshot: str, rule_ids: list[str]) -> None:
    """Append one completed-run row.  The LAST row (by wall time) names
    the snapshot the next append diffs against and the rules whose
    prior epochs are trustworthy."""
    spark.createDataFrame(
        [(snapshot, float(time.time()), ",".join(sorted(rule_ids)))],
        "snapshot STRING, ts DOUBLE, rules STRING",
    ).coalesce(1).write.mode("append").parquet(f"{out}/runs")


def last_run(spark: SparkSession, out: str) -> dict | None:
    try:
        rows = spark.read.parquet(f"{out}/runs").orderBy(F.col("ts").desc()).limit(1).collect()
    except Exception:
        return None
    if not rows:
        return None
    r = rows[0]
    return {"snapshot": r["snapshot"], "rules": set(r["rules"].split(","))}


# ------------------------------------------------------------- fs helpers


def _fs(spark: SparkSession, base: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(base)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _clear_rule_dirs(spark: SparkSession, vio_dir: str, rule_ids: list[str]) -> None:
    """Delete every epoch of the given rules — used before writing a
    COMPLETE set (RI fold / corpus-scoped recompute) under the current
    epoch."""
    fs, jvm = _fs(spark, vio_dir)
    for rid in rule_ids:
        p = jvm.org.apache.hadoop.fs.Path(f"{vio_dir}/rule_id={rid}")
        if fs.exists(p):
            fs.delete(p, True)


def _epoch_value(snapshot: str) -> str:
    """Partition value for a snapshot epoch.  The 's' prefix keeps
    partition-column type inference on STRING: an all-digit hex
    snapshot id would otherwise infer LONG for that epoch and STRING
    for mixed ones — a schema-merge failure waiting for the unlucky
    fingerprint."""
    return f"s{snapshot}"


def _clear_epoch(spark: SparkSession, vio_dir: str, rule_ids: list[str], epoch: str) -> None:
    """Delete exactly the current epoch of the given rules — the
    truncate half of the delta write's truncate-and-load (a retried
    append whose recompute finds ZERO violations must not keep the
    stale partition, same argument as job._clear_partitions)."""
    fs, jvm = _fs(spark, vio_dir)
    for rid in rule_ids:
        p = jvm.org.apache.hadoop.fs.Path(
            f"{vio_dir}/rule_id={rid}/epoch={_epoch_value(epoch)}"
        )
        if fs.exists(p):
            fs.delete(p, True)


# ------------------------------------------------------------- lifecycle


def run(args, spark: SparkSession) -> None:
    """The --incremental lifecycle (dispatched from job.main).

    First run on an output dir = the full-cost baseline (every rule
    over the whole corpus, RI state initialized); every later run
    validates the manifest diff as described in the module docstring.
    Non-append changes (removed/rewritten files — e.g. a compaction)
    fail fast with instructions, never silently validate a diff that
    isn't one."""
    from gwv_spark import catalog, engine
    from gwv_spark.rules import ALL_RULE_IDS
    from gwv_spark.streaming import DOC_LOCAL_RULES

    if args.as_of:
        raise SystemExit("--incremental validates the CURRENT snapshot; drop --as-of")
    if args.bucket_groups and args.bucket_groups > 1:
        raise SystemExit("--incremental already commits per append; drop --bucket-groups")
    if args.exec_mode == "concurrent":
        raise SystemExit("--incremental uses fused per-category actions; drop --exec-mode")
    if args.bucketed:
        raise SystemExit(
            "--incremental maintains RI by state fold; --bucketed layouts "
            "are for the full-recompute path"
        )

    rule_ids = args.rules or ALL_RULE_IDS
    unknown = [r for r in rule_ids if r not in ALL_RULE_IDS]
    if unknown:
        raise SystemExit(f"unknown rule ids: {unknown} (known: {ALL_RULE_IDS})")

    if catalog.is_table_ref(args.input):
        # manifest diffs and the append-only fingerprint guard ride the
        # parquet-surrogate snapshot manifests; on real Iceberg the same
        # lifecycle reads the catalog's own snapshot log (incremental
        # reads = snapshot diff scans) — not available in this sandbox
        raise SystemExit(
            "--incremental requires a parquet path input (snapshot "
            "manifests); table refs need the Iceberg runtime"
        )

    out = args.output.rstrip("/")
    snapshot = catalog.commit_snapshot(spark, args.input)
    documents = catalog.load_snapshot(spark, args.input, snapshot)
    attrs = spark.read.parquet(args.attrs) if args.attrs else None

    # layout pin: an incremental dir must never be read/written by the
    # classic modes (different partition depth + union semantics)
    layout_dir = f"{out}/layout"
    fs, jvm = _fs(spark, layout_dir)
    if fs.exists(jvm.org.apache.hadoop.fs.Path(layout_dir)):
        rec = json.loads(
            spark.read.text(layout_dir).collect()[0]["value"]
        )
        if not rec.get("incremental"):
            raise SystemExit(
                f"output dir {out} was written by a non-incremental run; "
                "incremental and classic layouts cannot mix"
            )
    else:
        spark.createDataFrame(
            [(json.dumps({"bucket_groups": 1, "incremental": True}),)], "value STRING"
        ).coalesce(1).write.mode("overwrite").text(layout_dir)

    local = [r for r in rule_ids if r in DOC_LOCAL_RULES]
    ri = [r for r in rule_ids if r in RI_RULES]
    scoped = [r for r in rule_ids if r not in local and r not in ri]

    ledger = engine.Ledger(spark, f"{out}/ledger/snapshot={snapshot}")
    done = {r["rule_id"] for r in ledger.completed().collect()} if args.resume else set()

    prev = last_run(spark, out)
    vio_dir = f"{out}/violations"
    t_run = time.monotonic()
    timings: dict[str, float] = {}

    if prev is None:
        _initial_run(
            spark, args, out, snapshot, documents, attrs,
            local, ri, scoped, done, vio_dir, timings,
        )
        covered_now, need_record = set(rule_ids), True
        evaluated = set(rule_ids)
    elif prev["snapshot"] == snapshot:
        # nothing appended since the last run: idempotent no-op for
        # rules the prior chain computed.  A rule NEW to the chain was
        # never evaluated — silently marking it complete would
        # fabricate a clean verdict — so the new rules (and only they)
        # get a full evaluation at this snapshot, the same machinery as
        # an initial run restricted to them.
        unc = [r for r in rule_ids if r not in prev["rules"]]
        if unc:
            _initial_run(
                spark, args, out, snapshot, documents, attrs,
                [r for r in unc if r in local],
                [r for r in unc if r in ri],
                [r for r in unc if r in scoped],
                done, vio_dir, timings,
            )
        covered_now = prev["rules"] | set(rule_ids)
        need_record = bool(unc)
        evaluated = set(unc)
    else:
        _append_run(
            spark, args, out, snapshot, prev, documents, attrs,
            local, ri, scoped, done, vio_dir, timings,
        )
        # rules in the prior coverage NOT requested this run missed
        # this append — they drop out of coverage (their chain breaks),
        # and their on-disk epochs are now append-UNAWARE: presenting
        # them through the verdicts rollup as current state would be
        # WRONG (a resolved dangling ref still shown as a violation),
        # not merely old.  The surface contract is "the output dir
        # holds maintained results"; a dropped rule's results are
        # removed with its coverage — re-requesting the rule later
        # triggers the full re-evaluation path above.
        dropped = sorted(prev["rules"] - set(rule_ids))
        if dropped:
            _clear_rule_dirs(spark, vio_dir, dropped)
        covered_now, need_record = set(rule_ids), True
        evaluated = set(rule_ids)

    total_secs = round(time.monotonic() - t_run, 3)

    # ---- rollup (same surfaces as the classic job)
    try:
        violations = spark.read.parquet(vio_dir)
    except Exception:
        violations = engine.empty_violations(spark)
    real = violations.where(F.col("errcode") != "__error__")
    docs_prepared = documents.select("doc_id")
    verdicts = engine.partition_verdicts(
        docs_prepared, real, n_buckets=args.n_buckets, run_id=args.run_id or snapshot
    )
    verdicts.write.mode("overwrite").parquet(f"{out}/verdicts")
    if args.sample:
        from gwv_spark import triage

        triage.sample_violations(real, k=args.sample).write.mode("overwrite").parquet(
            f"{out}/violations_sample"
        )

    # metrics + ledger marks only for rules this run actually evaluated
    # (initial/append: all requested; same-snapshot: the new rules) — a
    # pure no-op rerun must not append duplicate metrics rows or
    # re-mark the ledger for work it did not do
    computed = [r for r in rule_ids if r not in done and r in evaluated]
    if computed:
        counts = {
            r["rule_id"]: r["n"]
            for r in real.where(F.col("rule_id").isin(computed))
            .groupBy("rule_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        run_id = args.run_id or snapshot
        spark.createDataFrame(
            [
                (
                    run_id, snapshot, rid, timings.get(rid), total_secs,
                    timings.get(rid) is not None, int(counts.get(rid, 0)),
                )
                for rid in computed
            ],
            "run_id STRING, snapshot STRING, rule_id STRING, "
            "wall_s DOUBLE, run_total_s DOUBLE, per_rule_timing BOOLEAN, "
            "n_violations BIGINT",
        ).write.mode("append").parquet(f"{out}/metrics")
        ledger.mark(
            spark.createDataFrame(
                [(rid, -1) for rid in computed], "rule_id STRING, partition_id INT"
            )
        )
    # component timings (r4 verdict #5's decomposition, incremental
    # form): rule/fold work separated from the per-run commit machinery
    # (snapshot fingerprint + manifest, layout, verdicts rollup,
    # metrics, ledger).  At test SF the machinery dominates an append's
    # wall time; at the design point it is the amortized constant and
    # the delta work is the bill — recording both per run keeps the
    # two from masquerading as each other.
    if timings:
        spark.createDataFrame(
            [(snapshot, k, v) for k, v in sorted(timings.items())],
            "snapshot STRING, component STRING, wall_s DOUBLE",
        ).coalesce(1).write.mode("append").parquet(f"{out}/component_timings")

    # the runs row is the LAST write: its presence certifies every
    # surface above committed for this snapshot, so a crash anywhere
    # earlier makes the next run redo this snapshot idempotently.
    # Coverage after an APPEND is exactly this run's rule set, never a
    # union with prior runs: a doc-local rule left out of one append
    # misses that append's delta forever after, so continuity only
    # holds for rules processed by EVERY run in the chain (a dropped
    # rule re-entering the chain is detected and fully re-evaluated).
    # On a SAME-SNAPSHOT run the prior rules stay current (no new
    # data), so coverage there is the union.
    if need_record:
        record_run(spark, out, snapshot, sorted(covered_now))


def _write_epoch(vio: DataFrame, vio_dir: str, epoch: str) -> None:
    """Dynamic-partition-overwrite the violations into
    rule_id=<r>/epoch=<sid> partitions (retry-idempotent)."""
    vio.withColumn("epoch", F.lit(_epoch_value(epoch))).write.mode(
        "overwrite"
    ).partitionBy("rule_id", "epoch").parquet(vio_dir)


def _initial_run(
    spark, args, out, snapshot, documents, attrs,
    local, ri, scoped, done, vio_dir, timings,
) -> None:
    """Full-corpus baseline: all rules, RI state initialized.  One
    fused action for local+scoped; the RI anti join runs ONCE (writing
    the state), and the rules' violations are shaped from the
    state read-back, never recomputed."""
    from gwv_spark import engine

    local = [r for r in local if r not in done]
    ri = [r for r in ri if r not in done]
    scoped = [r for r in scoped if r not in done]
    ctx = engine.make_context(
        spark, documents, attrs=attrs,
        cache=(not args.no_cache) and bool(scoped),
        ignore_error=args.ignore_error,
        resolve_entity=bool(scoped),
    )
    if ri:
        t0 = time.monotonic()
        ri_cores_full(ctx).write.mode("overwrite").parquet(
            f"{out}/ri_state/epoch={snapshot}"
        )
        state = spark.read.parquet(f"{out}/ri_state/epoch={snapshot}")
        shaped = shape_ri_state(state)
        for rid in ri:
            ctx.plan_cache[rid] = shaped.where(F.col("rule_id") == rid)
        timings["__ri_state__"] = round(time.monotonic() - t0, 3)
    todo = local + scoped + ri
    if todo:
        # ALL epochs cleared, not just the current one: this path also
        # serves a rule RE-ENTERING the chain (called from _append_run /
        # the same-snapshot branch), which may carry stale epochs from
        # before its chain broke — the full evaluation below is the
        # complete set
        _clear_rule_dirs(spark, vio_dir, todo)
        t0 = time.monotonic()
        _write_epoch(engine.run_rules(ctx, todo), vio_dir, snapshot)
        timings["__rules__"] = round(time.monotonic() - t0, 3)
    if not args.no_cache and bool(scoped):
        ctx.docs.unpersist()
        ctx.spans.unpersist()


def _append_run(
    spark, args, out, snapshot, prev, documents, attrs,
    local, ri, scoped, done, vio_dir, timings,
) -> None:
    from gwv_spark import catalog, engine

    # manifest diff — the unit of incremental work
    prev_files = None
    for rec in catalog.snapshots(args.input):
        if rec["snapshot_id"] == prev["snapshot"]:
            prev_files = set(rec["files"])
    if prev_files is None:
        raise SystemExit(
            f"prior run snapshot {prev['snapshot']} has no manifest under "
            f"{args.input}; run a fresh full validation (new output dir)"
        )
    new_files = set(documents.inputFiles())
    # inputFiles returns URIs (file:///...); manifests store plain paths
    norm = lambda f: f[7:] if f.startswith("file://") else f  # noqa: E731
    new_files = {norm(f) for f in new_files}
    prev_files = {norm(f) for f in prev_files}
    removed = prev_files - new_files
    if removed:
        raise SystemExit(
            f"{len(removed)} file(s) from the prior snapshot are gone "
            f"(e.g. {sorted(removed)[0]}) — not an append; incremental "
            "folds are only sound over append-only input.  Run a full "
            "validation (fresh output dir or classic job)."
        )
    # same names is not enough: an in-place rewrite (compaction, manual
    # fix-up) keeps the path but changes content.  Hash the prior
    # manifest's files AS THEY EXIST NOW — equality with the prior
    # snapshot id proves the pre-append corpus is untouched.
    if catalog.fingerprint_files(prev_files) != prev["snapshot"]:
        raise SystemExit(
            "prior snapshot's files were modified in place (fingerprint "
            "mismatch) — not an append; run a full validation"
        )
    delta_files = sorted(new_files - prev_files)

    # Chain continuity decides the cheap path per rule; a rule OUTSIDE
    # the chain gets a full re-evaluation instead of a refusal:
    # - doc-local: delta-union is only complete when every run in the
    #   chain processed the rule (prev["rules"] is exactly the last
    #   run's set) — a rule new to or re-entering the chain recomputes
    #   over the full corpus, complete set under the current epoch.
    # - RI: the state table always carries BOTH rules' cores (the fold
    #   evaluates both probes regardless of the requested subset), so
    #   currency is a property of the state itself: the fold is sound
    #   iff a state epoch exists for the PREVIOUS snapshot.  Absent
    #   (RI never run, or skipped across an append) -> initialize
    #   fresh from the full corpus.
    fresh_local = [r for r in local if r not in prev["rules"] and r not in done]
    local = [r for r in local if r in prev["rules"] and r not in done]
    ri = [r for r in ri if r not in done]
    state_fs, state_jvm = _fs(spark, out)
    state_current = state_fs.exists(
        state_jvm.org.apache.hadoop.fs.Path(
            f"{out}/ri_state/epoch={prev['snapshot']}"
        )
    )
    ri_fold, ri_init = (ri, []) if state_current else ([], ri)
    scoped = [r for r in scoped if r not in done]

    if fresh_local or ri_init:
        _initial_run(
            spark, args, out, snapshot, documents, attrs,
            fresh_local, ri_init, [], done, vio_dir, timings,
        )
    ri = ri_fold

    if delta_files and (local or ri):
        docs_delta = spark.read.schema(documents.schema).parquet(*delta_files)
        ctx_delta = engine.make_context(
            spark, docs_delta, attrs=attrs, cache=False,
            ignore_error=args.ignore_error, resolve_entity=False,
        )
        if local:
            t0 = time.monotonic()
            _clear_epoch(spark, vio_dir, local, snapshot)
            _write_epoch(engine.run_rules(ctx_delta, local), vio_dir, snapshot)
            timings["__local_delta__"] = round(time.monotonic() - t0, 3)
        if ri:
            t0 = time.monotonic()
            state_prev = spark.read.parquet(
                f"{out}/ri_state/epoch={prev['snapshot']}"
            )
            corpus_keys = documents.select(F.col("doc_id").alias("key"))
            fold_ri_state(state_prev, ctx_delta, corpus_keys).write.mode(
                "overwrite"
            ).parquet(f"{out}/ri_state/epoch={snapshot}")
            state = spark.read.parquet(f"{out}/ri_state/epoch={snapshot}")
            # the fold result is the COMPLETE set: it replaces every
            # prior epoch of the RI rules
            _clear_rule_dirs(spark, vio_dir, ri)
            _write_epoch(
                shape_ri_state(state).where(F.col("rule_id").isin(ri)),
                vio_dir,
                snapshot,
            )
            timings["__ri_fold__"] = round(time.monotonic() - t0, 3)
    # (delta_files is never empty here: the same-snapshot case is
    # handled by the caller, removals/rewrites fail fast above, so a
    # differing fingerprint implies new files)

    if scoped:
        # corpus-scoped non-RI rules: full recompute (their verdicts
        # read every document), complete set under the current epoch
        t0 = time.monotonic()
        ctx = engine.make_context(
            spark, documents, attrs=attrs, cache=not args.no_cache,
            ignore_error=args.ignore_error, resolve_entity=True,
        )
        _clear_rule_dirs(spark, vio_dir, scoped)
        _write_epoch(engine.run_rules(ctx, scoped), vio_dir, snapshot)
        timings["__scoped_full__"] = round(time.monotonic() - t0, 3)
        if not args.no_cache:
            ctx.docs.unpersist()
            ctx.spans.unpersist()
