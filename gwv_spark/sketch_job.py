"""Sketch-store cluster entrypoint: ``spark-submit --py-files
gwv_spark.zip gwv_spark/sketch_job.py --input <table> --store <dir>``.

One invocation = one incremental update of the column-stats sketch
store (gwv_spark.sketchstore): diff the table's data files against the
store, sketch ONLY the new ones, fold the store into a fresh full-table
stats snapshot under ``<store>/_stats`` (overwritten each run — the
store itself is the durable, append-only state).  Re-running with no
new files refreshes the stats snapshot without scanning anything.

The cron catch-up shape, like stream_job's drain mode: schedule it
after every snapshot append and full-table column stats stay current
at the cost of the appended files' scan.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None, spark=None) -> None:
    from pyspark.sql import SparkSession

    from gwv_spark import sketchstore

    p = argparse.ArgumentParser(description="gwv_spark incremental column-stats sketch store")
    p.add_argument("--input", required=True, help="parquet table path")
    p.add_argument("--store", required=True, help="sketch store directory")
    p.add_argument("--columns", nargs="*", default=None,
                   help="columns to profile (default: all numeric + string)")
    p.add_argument("--hll-p", type=int, default=14,
                   help="HyperLogLog precision (registers = 2^p)")
    p.add_argument("--delta", type=float, default=500.0,
                   help="t-digest compression parameter")
    p.add_argument("--show", action="store_true",
                   help="print the folded stats to stdout")
    args = p.parse_args(argv)

    owns_session = spark is None
    if owns_session:
        spark = SparkSession.builder.appName("gwv_spark-sketch").getOrCreate()

    res = sketchstore.update_store(
        spark, args.input, args.store, args.columns,
        p=args.hll_p, delta=args.delta,
    )
    print(
        f"sketch_store: {res['n_new_files']} new file(s), "
        f"{res['n_known_files']} already sketched"
        + (f", batch {res['batch_id']}" if res["batch_id"] else "")
    )
    stats = sketchstore.stats_from_store(spark, args.store, delta=args.delta)
    stats.coalesce(1).write.mode("overwrite").parquet(f"{args.store}/_stats")
    if args.show:
        stats.orderBy("column").show(truncate=False)
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
