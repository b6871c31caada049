"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k against a small probe set — the probe
side is broadcast, the scan side stays partitioned, scoring is a native
``aggregate``/``zip_with`` fold in double precision (no Python).
Scale path: sign-LSH bucketing (random-hyperplane sketch) restricts the
search to matching buckets; hyperplanes are derived from md5 so the
result is deterministic and oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact top-k by cosine for each probe vector.

    probes is small (broadcast); ranking uses a window per probe with a
    deterministic (score desc, vec_id) tie-break.  At cluster scale the
    per-partition topK is computed map-side before the single shuffle
    (Spark's TakeOrderedAndProject / window with AQE)."""
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    scored = vectors.crossJoin(F.broadcast(p)).select(
        "probe_id",
        F.col(id_col).alias("vec_id"),
        F.round(
            _dot(F.col(vec_col), F.col("probe_vec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("probe_vec"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "vec_id", "cosine", "rank")
    )


def _hyperplane(dim: int, plane_id: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 — the
    same construction is reproducible in SQL if ever needed."""
    import hashlib

    vals = []
    for j in range(dim):
        h = hashlib.md5(f"plane:{plane_id}:{j}".encode()).hexdigest()
        vals.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return vals


def sign_lsh_buckets(
    vectors: DataFrame, dim: int, n_planes: int = 12, vec_col: str = "embedding"
) -> DataFrame:
    """Attach a sign-LSH bucket id: bit i = sign(v · plane_i)."""
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, i)])
        bit = (_dot(F.col(vec_col), plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return vectors.withColumn("lsh_bucket", bucket)


def lsh_cosine_topk(
    vectors: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH
    bucket, then exact cosine rank within the bucket.  At 10^12 vectors
    the bucketed table is the partitioning key (write bucketed-by
    lsh_bucket), so a probe touches one partition group."""
    v = sign_lsh_buckets(vectors, dim, n_planes, vec_col)
    p = sign_lsh_buckets(
        probes.select(
            F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
        ),
        dim,
        n_planes,
        "probe_vec",
    )
    joined = v.join(F.broadcast(p), "lsh_bucket").select(
        "probe_id",
        F.col(id_col).alias("vec_id"),
        F.round(
            _dot(F.col(vec_col), F.col("probe_vec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("probe_vec"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "vec_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates restricted to
    equal sign-LSH buckets (near-identical vectors agree on every
    hyperplane sign with high probability), then exact cosine ≥
    threshold inside the bucket.  At 10^12 vectors the bucket id is the
    table's partition key, so the self join never crosses partition
    groups; bucket sizes are bounded because near-duplicate clusters
    are what the buckets isolate."""
    v = sign_lsh_buckets(vectors, dim, n_planes, vec_col)
    a = v.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"), "lsh_bucket"
    )
    b = v.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"), "lsh_bucket"
    )
    pairs = (
        a.join(b, "lsh_bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                6,
            ).alias("cosine"),
        )
    )
    return pairs.where(F.col("cosine") >= threshold)
