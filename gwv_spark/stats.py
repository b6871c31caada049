"""North-rule stats layer: column stats, uniqueness, referential
integrity, and distribution-drift checks as native DataFrame plans.

These are the four check families BASELINE.json.north_rule adds on top of
the gwv rule suite.  Everything here is Catalyst-native aggregation —
one shuffle per groupBy, map-side partial aggregation for free, and the
approximate variants (HLL distinct, approx quantiles) for the 10^12-row
path where exact distinct counts would be a full shuffle of the key set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------- column stats

def column_stats(df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = False) -> DataFrame:
    """One row per column: count, nulls, null_rate, distinct, min/max.

    ``exact_distinct=False`` uses approx_count_distinct (HLL++, constant
    memory per column — the only sane option at 10^12 rows); the exact
    variant exists for small-scale oracle comparison.
    """
    columns = columns or df.columns
    out = None
    for c in columns:
        col = F.col(c)
        distinct = (
            F.countDistinct(col) if exact_distinct else F.approx_count_distinct(col)
        )
        agg = df.agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias("n_null"),
            distinct.cast("bigint").alias("n_distinct"),
            F.min(col).cast("string").alias("min_value"),
            F.max(col).cast("string").alias("max_value"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def numeric_profile(df: DataFrame, columns: list[str], quantiles=(0.25, 0.5, 0.75)) -> DataFrame:
    """avg/stddev/approx-quantiles for numeric columns (t-digest-style
    sketch via percentile_approx — mergeable, scale-safe)."""
    out = None
    for c in columns:
        col = F.col(c).cast("double")
        agg = df.agg(
            F.lit(c).alias("column"),
            F.avg(col).alias("mean"),
            F.stddev_pop(col).alias("stddev"),
            *[
                F.percentile_approx(col, q, 10000).alias(f"p{int(q * 100)}")
                for q in quantiles
            ],
        )
        out = agg if out is None else out.unionByName(agg)
    return out


# ---------------------------------------------------------------- uniqueness

def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys that violate uniqueness, with multiplicity.  groupBy shuffles
    on the key; AQE splits skewed key partitions."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


def uniqueness_summary(df: DataFrame, key_cols: list[str]) -> DataFrame:
    dups = duplicate_keys(df, key_cols)
    return dups.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_duplicate_keys"),
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("bigint").alias("n_rows_in_duplicates"),
    )


# ---------------------------------------------------------------- referential

def ri_orphans(child: DataFrame, fk: str, parent: DataFrame, pk: str) -> DataFrame:
    """Child rows whose FK has no parent (LEFT ANTI join).  Broadcast vs
    sort-merge is cardinality-driven: Catalyst broadcasts the parent key
    set when it fits (autoBroadcastJoinThreshold / AQE runtime stats);
    otherwise SMJ with AQE skew splitting."""
    parent_keys = parent.select(F.col(pk).alias(fk)).dropDuplicates()
    return child.join(parent_keys, fk, "left_anti")


def ri_summary(child: DataFrame, fk: str, parent: DataFrame, pk: str) -> DataFrame:
    orphans = ri_orphans(child, fk, parent, pk)
    return orphans.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_orphan_rows"),
        F.coalesce(F.countDistinct(F.col(fk)), F.lit(0)).alias("n_orphan_keys"),
    )


# ---------------------------------------------------------------- drift

def histogram(df: DataFrame, value: Column, bucket_width: float, group: Column | None = None) -> DataFrame:
    """Fixed-width bucket histogram (deterministic bucketing — no
    quantile estimation, so baseline and current always share edges)."""
    bucket = F.floor(value / F.lit(bucket_width)).cast("long").alias("bucket")
    keys = [group.alias("grp"), bucket] if group is not None else [bucket]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def psi(current: DataFrame, baseline: DataFrame, eps: float = 1e-6) -> DataFrame:
    """Population Stability Index between two bucket histograms
    (columns: bucket, n).  PSI = Σ (p-q)·ln(p/q) with ε-smoothing."""
    c = current.select("bucket", F.col("n").alias("n_cur"))
    b = baseline.select("bucket", F.col("n").alias("n_base"))
    joined = c.join(b, "bucket", "full_outer").fillna(0, ["n_cur", "n_base"])
    tot = joined.agg(
        F.sum("n_cur").alias("tot_cur"), F.sum("n_base").alias("tot_base")
    )
    j = joined.crossJoin(F.broadcast(tot))
    p = F.col("n_cur") / F.col("tot_cur") + eps
    q = F.col("n_base") / F.col("tot_base") + eps
    return j.agg(F.sum((p - q) * F.log(p / q)).alias("psi"))


def psi_by_group(df: DataFrame, value: Column, group: Column, baseline_group: str, bucket_width: float, eps: float = 1e-4) -> DataFrame:
    """PSI of each group's value distribution vs a designated baseline
    group — the oracle-checkable drift query (deterministic buckets,
    ε-smoothed, natural log)."""
    hist = histogram(df, value, bucket_width, group)
    base = (
        hist.where(F.col("grp") == baseline_group)
        .select("bucket", F.col("n").alias("n_base"))
    )
    base_tot = base.agg(F.sum("n_base").alias("tot_base"))
    cur = hist.select("grp", "bucket", F.col("n").alias("n_cur"))
    cur_tot = cur.groupBy("grp").agg(F.sum("n_cur").alias("tot_cur"))
    # full outer per group over the union of buckets: left join both ways
    buckets = hist.select("bucket").dropDuplicates()
    grps = hist.select("grp").dropDuplicates()
    grid = grps.crossJoin(buckets)
    j = (
        grid.join(cur, ["grp", "bucket"], "left")
        .join(F.broadcast(base), "bucket", "left")
        .fillna(0, ["n_cur", "n_base"])
        .join(cur_tot, "grp", "left")
        .crossJoin(F.broadcast(base_tot))
    )
    p = F.col("n_cur") / F.col("tot_cur") + eps
    q = F.col("n_base") / F.col("tot_base") + eps
    return (
        j.groupBy("grp")
        .agg(F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"))
        .select(F.col("grp").alias("group_id"), "psi")
    )


def corpus_snapshot(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """The baseline_stats snapshot shape (FIXTURES.md §5): span-length
    histogram + span-kind frequencies + media_ref null rate as
    (metric, bucket, value) rows.  Written per Iceberg snapshot on a real
    deployment; drift checks compare the current corpus against it."""
    span_len = docs.groupBy(F.col("n_spans")).agg(F.count(F.lit(1)).alias("v")).select(
        F.lit("span_len_hist").alias("metric"),
        F.col("n_spans").cast("string").alias("bucket"),
        F.col("v").cast("double").alias("value"),
    )
    kind_freq = spans.groupBy("kind").agg(F.count(F.lit(1)).alias("v")).select(
        F.lit("kind_freq").alias("metric"),
        F.col("kind").alias("bucket"),
        F.col("v").cast("double").alias("value"),
    )
    null_rate = spans.agg(
        (
            F.sum(F.when(F.col("media_ref").isNull(), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("v")
    ).select(
        F.lit("media_ref_null_rate").alias("metric"),
        F.lit("all").alias("bucket"),
        F.round(F.col("v"), 6).alias("value"),
    )
    return span_len.unionByName(kind_freq).unionByName(null_rate)


def snapshot_psi(current: DataFrame, baseline: DataFrame, eps: float = 1e-4) -> DataFrame:
    """Per-metric PSI between two (metric, bucket, value) snapshots over
    the histogram metrics (rate metrics are compared directly as an
    absolute difference).  One shuffle on (metric, bucket); totals
    broadcast back."""
    hist_metrics = ["span_len_hist", "kind_freq"]
    c = current.where(F.col("metric").isin(hist_metrics)).select(
        "metric", "bucket", F.col("value").alias("n_cur")
    )
    b = baseline.where(F.col("metric").isin(hist_metrics)).select(
        "metric", "bucket", F.col("value").alias("n_base")
    )
    j = c.join(b, ["metric", "bucket"], "full_outer").fillna(0.0, ["n_cur", "n_base"])
    tot = j.groupBy("metric").agg(
        F.sum("n_cur").alias("tot_cur"), F.sum("n_base").alias("tot_base")
    )
    j = j.join(F.broadcast(tot), "metric")
    p = F.col("n_cur") / F.col("tot_cur") + eps
    q = F.col("n_base") / F.col("tot_base") + eps
    return (
        j.groupBy("metric")
        .agg(F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"))
        .select("metric", "psi")
    )


def ks_statistic(df: DataFrame, value: Column, group: Column, group_a: str, group_b: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between two groups'
    empirical CDFs, computed relationally: sort-merge the pooled sample,
    running counts via window, max |F_a - F_b|."""
    from pyspark.sql import Window

    sel = df.select(value.alias("v"), group.alias("g")).where(
        F.col("g").isin(group_a, group_b)
    )
    # aggregate per distinct value first so the running CDF is evaluated
    # only at step boundaries — deterministic under ties, unlike a
    # row-level cumulative sum
    per_v = sel.groupBy("v").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("da"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("db"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_v.withColumn("ca", F.sum("da").over(w)).withColumn(
        "cb", F.sum("db").over(w)
    )
    counts = sel.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    na = counts.where(F.col("g") == group_a).select(F.col("n").alias("na"))
    nb = counts.where(F.col("g") == group_b).select(F.col("n").alias("nb"))
    return (
        ranked.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .agg(
            F.round(
                F.max(F.abs(F.col("ca") / F.col("na") - F.col("cb") / F.col("nb"))), 6
            ).alias("ks")
        )
    )
