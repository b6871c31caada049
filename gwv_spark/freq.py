"""Frequent-items (heavy hitters) sketch — mergeable Misra-Gries.

Completes the sketch tier next to hll.py (distinct counts) and
sketch.py (t-digest quantiles): "what are the dominant values of this
column, with guaranteed bounds" — the question a training-data pipeline
asks of source domains, languages, license tags, or token prefixes at
10^12 rows, where an exact groupBy over a hot column is a full shuffle
of the table and the answer is needed per append, not per full scan.

Algorithm: Misra & Gries (1982) summaries with the merge operation of
Agarwal, Cormode, Huang, Phillips, Wei & Yi, "Mergeable Summaries"
(PODS 2012): a summary is ≤ k weighted items; merging sums weights and
prunes back to k by subtracting the (k+1)-th largest weight.  The
classical guarantee survives arbitrary merge trees:

    true_count − (n − Σweights)/(k+1)  ≤  weight  ≤  true_count

so the summary's own mass deficit yields a per-run certified error
bound (`error_bound` column), and every item with true count above
that bound is guaranteed present.

Spark shape (the same two-level pattern as sketch.py's t-digest tree):

  stage 1  zero-shuffle ``mapInPandas`` over the scan — per task a
           bounded pandas Series of at most ``8k`` counters, folded
           batch-by-batch via vectorized ``value_counts`` adds and
           MG-pruned whenever it overflows; emits ≤ k item rows plus
           one total-count sentinel row per task;
  stage 2  one tiny agg over ≤ P·k surviving rows (sum weights per
           item, global n and mass from the sentinels) — the only
           shuffle moves KB-sized summaries, so a hot item costs the
           same as a cold one and the scan side never repartitions.

Weights depend on where prunes happened and are therefore not
partitioning-invariant; the BOUNDS are, and the bound columns are what
callers consume (tests/test_freq.py asserts the sandwich on every
reported item under multiple partitionings).
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

__all__ = ["partition_sketches", "merged_summary", "frequent_items", "mg_prune"]

SKETCH_SCHEMA = "item string, w long, n long"


def mg_prune(acc, keep: int):
    """Misra-Gries prune to ≤ keep counters: subtract the (keep+1)-th
    largest weight from everything, drop non-positive.  Vectorized.
    Shared with the sketch store's per-column heavy-hitter rows."""
    if len(acc) <= keep:
        return acc
    delta = acc.nlargest(keep + 1).iloc[-1]
    acc = acc - delta
    return acc[acc > 0]



def partition_sketches(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Stage 1: one MG summary per task over `col` (nulls excluded).
    Output rows: (item, w>0, n=0) for the ≤ k surviving counters plus a
    sentinel (item=NULL, w=0, n=task row count) carrying the exact
    non-null total the error bound needs."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    src = df.select(F.col(col).cast("string").alias("item")).where(F.col(col).isNotNull())
    work_cap = 8 * k

    def gen(batches: Iterable) -> Iterator:
        import pandas as pd

        acc = pd.Series(dtype="int64")
        n = 0
        for pdf in batches:
            vc = pdf["item"].value_counts()
            n += int(vc.sum())
            acc = acc.add(vc, fill_value=0).astype("int64")
            if len(acc) > work_cap:
                acc = mg_prune(acc, 4 * k)
        acc = mg_prune(acc, k)
        rows = [{"item": str(i), "w": int(w), "n": 0} for i, w in acc.items()]
        rows.append({"item": None, "w": 0, "n": n})
        yield pd.DataFrame(rows)

    return src.mapInPandas(gen, SKETCH_SCHEMA)


def merged_summary(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Stage 2: fold task summaries into one global summary.

    Every surviving item keeps its summed lower-bound weight `count_lo`;
    `count_hi = count_lo + error_bound` where
    `error_bound = (n_total − Σ all weights)/(k+1)` — the merged-summary
    mass deficit, valid for items NOT in the summary too (any absent
    item's true count is ≤ error_bound)."""
    sk = sketches.persist()
    try:
        tot = sk.agg(
            F.sum("n").alias("n_total"), F.sum("w").alias("mass")
        ).collect()[0]
        n_total = int(tot["n_total"] or 0)
        mass = int(tot["mass"] or 0)
        error_bound = (n_total - mass) / (k + 1)
        return (
            sk.where(F.col("item").isNotNull())
            .groupBy("item")
            .agg(F.sum("w").alias("count_lo"))
            .select(
                "item",
                "count_lo",
                (F.col("count_lo") + F.lit(error_bound)).alias("count_hi"),
                F.lit(n_total).alias("n_total"),
                F.lit(error_bound).alias("error_bound"),
            )
        )
    finally:
        sk.unpersist()


def frequent_items(df: DataFrame, col: str, k: int = 64, top: int | None = None) -> DataFrame:
    """Top heavy hitters of `col` with certified bounds:
    (item, count_lo, count_hi, n_total, error_bound), ordered by
    count_lo descending (item as the deterministic tiebreak), limited
    to `top` rows (default k).  count_lo ≤ true count ≤ count_hi for
    every reported item; any item whose true count exceeds error_bound
    is guaranteed present in the pre-limit `merged_summary` (use that
    directly when completeness above the bound matters more than a
    fixed-size report)."""
    summary = merged_summary(partition_sketches(df, col, k), k)
    return summary.orderBy(F.col("count_lo").desc(), "item").limit(top or k)
