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

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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
        # rule_id partitions it actually recomputed.
        engine.run_rules(ctx, rule_ids).write.mode("overwrite").partitionBy(
            "rule_id"
        ).parquet(f"{out}/violations")

    violations = spark.read.parquet(f"{out}/violations")
    verdicts = engine.partition_verdicts(
        ctx.docs, violations, n_buckets=args.n_buckets,
        run_id=args.run_id or snapshot,
    )
    verdicts.write.mode("overwrite").parquet(f"{out}/verdicts")
    if rule_ids:
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
