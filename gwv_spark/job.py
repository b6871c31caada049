"""Cluster job entrypoint: ``spark-submit --py-files gwv_spark.zip
gwv_spark/job.py --input <docs> --output <dir> [...]``.

Batch lifecycle (north rule):
1. read the documents table (parquet path or Iceberg table name);
2. build the shared parsed context (cache unless --no-cache);
3. run the selected rules as ONE fused action (union of all rule
   plans), written hive-partitioned to
   ``<output>/violations/rule_id=<id>/``;
4. roll up per-partition pass/fail verdicts + metrics to
   ``<output>/verdicts/``;
5. mark completed (rule, bucket) pairs in the resume ledger at
   ``<output>/ledger/`` — a rerun with --resume skips buckets already
   marked complete (per-partition lineage; on Iceberg the ledger is
   keyed by snapshot id instead of the corpus fingerprint).

The driver never collects violation rows; everything is executor-side
writes.  Rule subset selection mirrors the reference CLI's ``-n``
(gwv.py:33, validator.py:32-37).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _clear_rule_partitions(spark, base: str, rule_ids) -> None:
    """Drop ``<base>/rule_id=<rid>`` for every rule about to be recomputed.

    Dynamic partition overwrite only replaces partitions that receive
    rows, so a rule whose recomputation yields ZERO violations (the goal
    state) would otherwise leave its stale partition from a previous run
    in place — and the read-back would report violations that no longer
    exist.  Explicitly deleting the recomputed rules' partitions up front
    makes the fused write's semantics per-rule truncate-and-load while
    resumed rules' partitions stay untouched.  Hadoop FS API, so it works
    on any storage backend spark can write to."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(base).getFileSystem(conf)
    for rid in rule_ids:
        p = path_cls(f"{base}/rule_id={rid}")
        if fs.exists(p):
            fs.delete(p, True)


def main(argv: list[str] | None = None, spark=None) -> None:
    from pyspark.sql import SparkSession

    from gwv_spark import engine
    from gwv_spark.rules import ALL_RULE_IDS

    p = argparse.ArgumentParser(description="gwv_spark validation job")
    p.add_argument("--input", required=True, help="documents parquet path or table")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--rules", nargs="*", default=None, help="rule subset (default all)")
    p.add_argument("--attrs", default=None, help="doc_attrs parquet path")
    p.add_argument("--n-buckets", type=int, default=256)
    p.add_argument("--run-id", default=None, help="default: the input snapshot id")
    p.add_argument(
        "--exec-mode",
        choices=["fused", "concurrent"],
        default="fused",
        help="fused: ONE action (18-rule union, dynamic partition "
        "overwrite; the single-submission cluster shape).  concurrent: "
        "one Spark job per rule, several in flight — overlaps driver-side "
        "planning with executor work (measured ~4x faster when the "
        "driver is the bottleneck); each rule overwrites its own "
        "rule_id=<id> directory unconditionally.",
    )
    p.add_argument("--resume", action="store_true", help="skip completed (rule,bucket)s")
    p.add_argument("--no-cache", action="store_true")
    p.add_argument(
        "--ignore-error",
        action="store_true",
        help="quarantine per-record UDF crashes as __error__ rows "
        "instead of failing the job (gwv.py:28-32)",
    )
    args = p.parse_args(argv)

    # On a cluster the session comes fully configured from spark-submit
    # --conf; only job-agnostic settings are set here.
    owns_session = spark is None
    if owns_session:
        spark = SparkSession.builder.appName("gwv_spark-validate").getOrCreate()
    # Resume correctness REQUIRES dynamic partition overwrite: with the
    # default 'static' mode, mode('overwrite').partitionBy('rule_id')
    # would delete the whole violations directory — including partitions
    # of rules skipped by --resume — while the ledger still marks them
    # complete.  Set it explicitly so an externally configured cluster
    # session can't silently lose resumed rules' violations.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    from gwv_spark import catalog

    documents = catalog.load(spark, args.input)
    attrs = spark.read.parquet(args.attrs) if args.attrs else None
    # the run is pinned to the input's snapshot: the resume ledger lives
    # under it, so state can never mix across corpus versions (Iceberg
    # snapshot id, or a content fingerprint on plain parquet)
    snapshot = catalog.snapshot_id(spark, args.input)

    ctx = engine.make_context(
        spark,
        documents,
        attrs=attrs,
        cache=not args.no_cache,
        ignore_error=args.ignore_error,
    )
    rule_ids = args.rules or ALL_RULE_IDS
    # fail fast on unknown rule ids: a typo'd --rules entry must not get
    # a fabricated metrics row and a rule-complete ledger mark
    unknown = [r for r in rule_ids if r not in ALL_RULE_IDS]
    if unknown:
        raise SystemExit(f"unknown rule ids: {unknown} (known: {ALL_RULE_IDS})")

    out = args.output.rstrip("/")
    ledger = engine.Ledger(spark, f"{out}/ledger/snapshot={snapshot}")

    if args.resume:
        # partition_id == -1 is the rule-complete sentinel; bucket-grain
        # rows (0..n_buckets-1) allow finer-grained skipping later
        done = {
            r["rule_id"]
            for r in ledger.completed().where("partition_id = -1").collect()
        }
        rule_ids = [r for r in rule_ids if r not in done]

    if rule_ids:
        # ONE action: the union of all rule plans, written hive-
        # partitioned by rule_id.  Single job submission; the DAG
        # scheduler overlaps the independent branch stages, and dynamic
        # partition overwrite means a resumed run only replaces the
        # rule_id partitions it actually recomputed.  Recomputed rules'
        # partitions are truncated first so a now-clean rule doesn't
        # resurrect stale violations (see _clear_rule_partitions).
        _clear_rule_partitions(spark, f"{out}/violations", rule_ids)
        import time as _time

        t_run = _time.monotonic()
        if args.exec_mode == "concurrent":
            rule_secs = engine.run_rules_concurrent(
                ctx, rule_ids, sink=engine.parquet_sink(f"{out}/violations")
            )
        else:
            engine.run_rules(ctx, rule_ids).write.mode("overwrite").partitionBy(
                "rule_id"
            ).parquet(f"{out}/violations")
            # one fused action: per-rule wall time is not separable
            rule_secs = {}
        total_secs = round(_time.monotonic() - t_run, 3)

    try:
        violations = spark.read.parquet(f"{out}/violations")
    except Exception:
        # a fully clean corpus writes no partition at all — schema
        # inference has nothing to read; the run is simply violation-free
        violations = engine.empty_violations(spark)
    # --ignore-error quarantine rows are audit data, not violations: the
    # reference's --ignore-error (validator.py:46-55) records nothing for
    # a crashed glyph, so counting them would flip bucket verdicts
    verdicts = engine.partition_verdicts(
        ctx.docs, violations.where(F.col("errcode") != "__error__"),
        n_buckets=args.n_buckets,
        run_id=args.run_id or snapshot,
    )
    verdicts.write.mode("overwrite").parquet(f"{out}/verdicts")
    if rule_ids:
        # run-metrics table (north rule: checkpoint + lineage + METRICS):
        # one row per recomputed rule — wall seconds (per-rule under
        # --exec-mode concurrent, total under fused) and the violation
        # count read back from the committed output.  Appended, keyed by
        # run_id + snapshot, so reruns/resumes accumulate an audit trail.
        counts = {
            r["rule_id"]: r["n"]
            for r in violations.where(F.col("rule_id").isin(rule_ids))
            .groupBy("rule_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        run_id = args.run_id or snapshot
        # wall_s is NULL under fused mode (per-rule time is not
        # separable from one action); the suite total goes in its own
        # column so summing wall_s across rows never overcounts
        metrics = spark.createDataFrame(
            [
                (
                    run_id,
                    snapshot,
                    rid,
                    rule_secs.get(rid),
                    total_secs,
                    rule_secs.get(rid) is not None,
                    int(counts.get(rid, 0)),
                )
                for rid in rule_ids
            ],
            "run_id STRING, snapshot STRING, rule_id STRING, "
            "wall_s DOUBLE, run_total_s DOUBLE, per_rule_timing BOOLEAN, "
            "n_violations BIGINT",
        )
        metrics.write.mode("append").parquet(f"{out}/metrics")
        marks = spark.createDataFrame(
            [(rid, -1) for rid in rule_ids], "rule_id STRING, partition_id INT"
        )
        ledger.mark(marks)
    ctx.docs.unpersist()
    ctx.spans.unpersist()
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
