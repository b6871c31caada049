"""snapshot_ks: KS statistic between two snapshots' span-length
histograms, pinned to an independent numpy CDF computation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gwv_spark import derive, stats
from gwv_spark.corpus import spark_generate


@pytest.fixture(scope="module")
def snaps(spark):
    docs = derive.prepare(spark_generate(spark, 1200, partitions=4))
    spans = derive.exploded_spans(docs)
    half_a = docs.where(F.xxhash64("doc_id") % 2 == 0)
    half_b = docs.where(F.xxhash64("doc_id") % 2 == 1)

    def snap(d):
        s = derive.exploded_spans(d)
        return stats.corpus_snapshot(d, s).toPandas()

    full = stats.corpus_snapshot(docs, spans).toPandas()
    return full, snap(half_a), snap(half_b)


def _ks_reference(a, b) -> float:
    """Independent CDF-diff computation in numpy over the two
    span_len_hist frames."""
    ha = a[a["metric"] == "span_len_hist"].set_index("bucket")["value"]
    hb = b[b["metric"] == "span_len_hist"].set_index("bucket")["value"]
    buckets = sorted(set(ha.index) | set(hb.index), key=int)
    ca = np.cumsum([ha.get(k, 0.0) for k in buckets]) / ha.sum()
    cb = np.cumsum([hb.get(k, 0.0) for k in buckets]) / hb.sum()
    return float(np.max(np.abs(ca - cb)))


def test_identical_snapshots_ks_zero(spark, snaps):
    full, _, _ = snaps
    df = spark.createDataFrame(full)
    [row] = stats.snapshot_ks(df, df).collect()
    assert row["metric"] == "span_len_hist"
    assert row["ks"] == 0.0


def test_matches_numpy_reference(spark, snaps):
    _, a, b = snaps
    got = stats.snapshot_ks(
        spark.createDataFrame(a), spark.createDataFrame(b)
    ).collect()[0]["ks"]
    want = _ks_reference(a, b)
    assert got == pytest.approx(want, abs=1e-6)
    assert got > 0.0  # the halves differ — the statistic sees it


def test_disjoint_buckets_ks_one(spark, snaps):
    """Histograms with no overlapping support have KS = 1."""
    full, _, _ = snaps
    a = full.copy()
    b = full.copy()
    b.loc[b["metric"] == "span_len_hist", "bucket"] = (
        b.loc[b["metric"] == "span_len_hist", "bucket"].astype(int) + 1000
    ).astype(str)
    got = stats.snapshot_ks(
        spark.createDataFrame(a), spark.createDataFrame(b)
    ).collect()[0]["ks"]
    assert got == 1.0
