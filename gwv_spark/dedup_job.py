"""Corpus-dedup cluster entrypoint: ``spark-submit --py-files
gwv_spark.zip gwv_spark/dedup_job.py --input <docs> --output <dir>``.

One invocation = one full dedup pass over a text corpus:

  1. near-dup PAIRS — SimHash block-permutation candidates at
     ``--max-hamming`` (textops.simhash_near_pairs), optionally unioned
     with exact-hash duplicate pairs (``--exact`` adds md5-identical
     docs even when SimHash would miss nothing — belt and braces at a
     zero incremental scan: both passes share the one corpus read);
  2. duplicate GROUPS — transitive closure via the log-round star
     contraction (components.connected_components);
  3. keeper election — exactly one deterministic survivor per group
     (components.dedup_keep_list; ``--prefer COLUMN`` keeps the
     highest-scoring member instead of the lexicographic-min doc_id).

Outputs under --output:
  ``keep_list/``   (doc_id, component_id, keep) for every document;
  ``groups/``      one row per multi-doc group (component_id, n_docs,
                   canonical_doc, doc_ids);
  ``deduped/``     the surviving documents, all columns (written only
                   with ``--write-corpus`` — at 10^12 docs the
                   keep_list join is usually what downstream wants;
                   rewriting the corpus is a deliberate full-copy).

Scale shape: the corpus is scanned once for signatures; every later
stage moves pair/group rows (the duplicate population), never the
corpus.  The star contraction's shuffles are keyed on doc_ids —
uniform by construction of the id space; a pathological mega-component
signals a bad similarity threshold and is reported (--max-group-warn),
not silently absorbed.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None, spark=None) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from gwv_spark import components
    from gwv_spark.textops import simhash_near_pairs

    p = argparse.ArgumentParser(description="gwv_spark corpus dedup")
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--max-hamming", type=int, default=3,
                   help="SimHash Hamming radius for near-dup pairs")
    p.add_argument("--max-bucket", type=int, default=100_000,
                   help="drop signature-block buckets larger than this "
                        "(boilerplate safety valve; 0 disables)")
    p.add_argument("--exact", action="store_true",
                   help="also pair md5-identical documents")
    p.add_argument("--prefer", default=None,
                   help="numeric column; highest value survives its group")
    p.add_argument("--write-corpus", action="store_true",
                   help="write the surviving documents under deduped/")
    p.add_argument("--max-group-warn", type=int, default=1000,
                   help="report groups larger than this (threshold smell)")
    args = p.parse_args(argv)

    owns_session = spark is None
    if owns_session:
        spark = SparkSession.builder.appName("gwv_spark-dedup").getOrCreate()

    docs = spark.read.parquet(args.input)
    pairs = simhash_near_pairs(
        docs, max_hamming=args.max_hamming,
        text_col=args.text_col, id_col=args.id_col,
        max_bucket=args.max_bucket or None,
    ).select("doc_a", "doc_b")
    if args.exact:
        h = docs.select(
            F.col(args.id_col).alias("doc_id"),
            F.md5(F.col(args.text_col)).alias("text_hash"),
        )
        # star edges to the per-hash minimum: a million identical docs
        # become a million rows, never a million-element array
        mins = h.groupBy("text_hash").agg(F.min("doc_id").alias("doc_a"))
        exact_pairs = (
            h.join(mins, "text_hash")
            .where(F.col("doc_id") != F.col("doc_a"))
            .select("doc_a", F.col("doc_id").alias("doc_b"))
        )
        pairs = pairs.unionByName(exact_pairs)

    prefer = F.col(args.prefer) if args.prefer else None
    keep = components.dedup_keep_list(
        docs, pairs, id_col=args.id_col, prefer=prefer
    ).persist()
    keep.select(args.id_col, "component_id", "keep").write.mode(
        "overwrite"
    ).parquet(f"{args.output}/keep_list")

    groups = (
        keep.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(args.id_col).alias("canonical_doc"),
            # report column, capped (see components.near_dup_groups)
            F.slice(F.sort_array(F.collect_list(args.id_col)), 1, 1000).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )
    groups.write.mode("overwrite").parquet(f"{args.output}/groups")

    n_total = keep.count()
    n_kept = keep.where("keep").count()
    big = (
        spark.read.parquet(f"{args.output}/groups")
        .where(F.col("n_docs") > args.max_group_warn)
        .count()
    )
    print(
        f"dedup: kept {n_kept}/{n_total} documents "
        f"({n_total - n_kept} removed)"
        + (f"; WARNING {big} group(s) over {args.max_group_warn} members "
           f"- similarity threshold may be too loose" if big else "")
    )
    if args.write_corpus:
        keep.where("keep").drop("component_id", "keep").write.mode(
            "overwrite"
        ).parquet(f"{args.output}/deduped")
    keep.unpersist()
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
