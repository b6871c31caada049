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

__all__ = [
    "partition_sketches",
    "merged_summary",
    "frequent_items",
    "frequent_items_by_group",
    "mg_prune",
]

SKETCH_SCHEMA = "item string, w long, n long, k long"


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
    non-null total the error bound needs.  Every row also carries the
    prune parameter `k` so merged_summary can certify its bound: the
    (n−mass)/(k+1) guarantee is only valid when the merge-side k is
    ≤ every prune's k, and without the stamp a mismatch is silent."""
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
        rows = [{"item": str(i), "w": int(w), "n": 0, "k": k} for i, w in acc.items()]
        rows.append({"item": None, "w": 0, "n": n, "k": k})
        yield pd.DataFrame(rows)

    return src.mapInPandas(gen, SKETCH_SCHEMA)


def merged_summary(sketches: DataFrame, k: int | None = None) -> DataFrame:
    """Stage 2: fold task summaries into one global summary.

    `k` defaults to the prune parameter stamped on the stage-1 rows (the
    common case: same k both sides).  Passing it explicitly is validated
    against the stamp — a merge-side k larger than ANY prune's k would
    certify a bound the prunes never guaranteed, so that call raises
    instead of silently producing an invalid sandwich.

    Every surviving item keeps its summed lower-bound weight `count_lo`;
    `count_hi = count_lo + error_bound` where
    `error_bound = (n_total − Σ all weights)/(k+1)` — the merged-summary
    mass deficit, valid for items NOT in the summary too (any absent
    item's true count is ≤ error_bound).

    The stage-1 summaries are materialized ONCE via an eager
    localCheckpoint: the totals collect and the returned (lazy) groupBy
    both read the stored blocks, never the source table again — a
    persist() released inside this function would already be gone by
    the time the caller runs its action, silently re-running the full
    scan."""
    sk = sketches.localCheckpoint(eager=True)
    tot = sk.agg(
        F.sum("n").alias("n_total"),
        F.sum("w").alias("mass"),
        F.min("k").alias("k_min"),
    ).collect()[0]
    n_total = int(tot["n_total"] or 0)
    mass = int(tot["mass"] or 0)
    k_min = tot["k_min"]
    if k is None:
        if k_min is None:
            raise ValueError(
                "merged_summary: empty sketch input and no explicit k - "
                "nothing records the prune parameter the bound needs"
            )
        k = int(k_min)
    elif k_min is not None and k > int(k_min):
        raise ValueError(
            f"merged_summary: merge-side k={k} exceeds the smallest "
            f"stage-1 prune k={int(k_min)}; the (n-mass)/(k+1) bound "
            f"would be invalid - pass k <= {int(k_min)} or omit it"
        )
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


def frequent_items_by_group(
    df: DataFrame,
    key: str,
    col: str,
    k: int = 32,
    max_keys_in_memory: int = 10_000,
) -> DataFrame:
    """Per-group heavy hitters: (key, item, count_lo, count_hi, rank,
    n_group, error_bound) — the dominant values of `col` WITHIN each
    `key` (dominant sources per language, licenses per domain, ...).

    Same two-level shape as sketch.tdigest_quantiles_by_group: a naive
    ``groupBy(key).applyInPandas`` over raw rows materializes each whole
    group in one task — a scale-killer for a hot group.  Here stage 1
    keeps one bounded MG summary per key per task (flushed early past
    ``max_keys_in_memory`` distinct keys — extra partial rows, same
    bounds), and stage 2 merges ≤ P partial summaries per key, so a
    group's merge cost is per-partition summaries, never its row count.
    The per-group sandwich count_lo ≤ true ≤ count_lo + error_bound
    holds with error_bound = (n_group − mass)/(k+1)."""
    import pandas as pd

    src = df.select(
        F.col(key).cast("string").alias("k"),
        F.col(col).cast("string").alias("item"),
    ).where(F.col(col).isNotNull())
    work_cap = 8 * k
    partial_schema = "k string, items array<string>, ws array<long>, n long"

    def partials(batches: Iterable) -> Iterator:
        accs: dict[str, "pd.Series"] = {}
        ns: dict[str, int] = {}

        def drain():
            rows = []
            for gk, acc in accs.items():
                acc = mg_prune(acc, k)
                order = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
                rows.append(
                    {
                        "k": gk,
                        "items": [str(i) for i, _ in order],
                        "ws": [int(w) for _, w in order],
                        "n": ns[gk],
                    }
                )
            accs.clear()
            ns.clear()
            if rows:
                yield pd.DataFrame(rows)

        for pdf in batches:
            keys = pdf["k"].astype("string")
            # dropna=False: a NULL group key is a real population (the
            # "no language detected" bucket) and must be summarized,
            # not silently dropped
            for gk, idx in keys.groupby(keys, sort=False, dropna=False).indices.items():
                vc = pdf["item"].iloc[idx].value_counts()
                if not len(vc):
                    continue
                ns[gk] = ns.get(gk, 0) + int(vc.sum())
                acc = accs.get(gk)
                acc = vc if acc is None else acc.add(vc, fill_value=0).astype("int64")
                if len(acc) > work_cap:
                    acc = mg_prune(acc, 4 * k)
                accs[gk] = acc
            if len(accs) > max_keys_in_memory:
                yield from drain()
        yield from drain()

    parts = src.mapInPandas(partials, partial_schema)
    out_schema = (
        f"{key} string, item string, count_lo bigint, count_hi double, "
        "rank int, n_group bigint, error_bound double"
    )

    def merge_group(pdf) -> "pd.DataFrame":
        acc = pd.Series(dtype="int64")
        for items, ws in zip(pdf["items"], pdf["ws"]):
            if items is not None and len(items) > 0:
                s = pd.Series(list(map(int, ws)), index=list(items))
                acc = acc.add(s, fill_value=0).astype("int64")
        acc = mg_prune(acc, k)
        n_group = int(pdf["n"].sum())
        mass = int(acc.sum()) if len(acc) else 0
        eb = (n_group - mass) / (k + 1)
        order = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        rows = [
            {
                key: pdf["k"].iloc[0],
                "item": str(i),
                "count_lo": int(w),
                "count_hi": float(w) + eb,
                "rank": r + 1,
                "n_group": n_group,
                "error_bound": eb,
            }
            for r, (i, w) in enumerate(order)
        ]
        if not rows:
            # a summary can prune to EMPTY (near-uniform group: every
            # counter ties and the subtraction clears them all) — the
            # group still existed, and the caller needs its n_group and
            # bound ("no value exceeds error_bound") rather than a
            # silently missing key.  item=NULL, rank=0 marks the
            # no-dominant-value sentinel.
            rows = [
                {
                    key: pdf["k"].iloc[0],
                    "item": None,
                    "count_lo": 0,
                    "count_hi": eb,
                    "rank": 0,
                    "n_group": n_group,
                    "error_bound": eb,
                }
            ]
        return pd.DataFrame(rows)

    return parts.groupBy("k").applyInPandas(merge_group, out_schema)


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
