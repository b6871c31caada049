"""Distributed connected components over near-dup pair tables — the step
that turns pairwise dedup evidence (simhash/minhash/jaccard/embedding
pairs) into actionable DUPLICATE GROUPS with one canonical survivor per
group.

The reference has no cross-document grouping at all (its dup rule,
reference dup.py:146-211, is within-record); this tier exists for the
training-pipeline side of the engine: a corpus dedup pass at 10^12 docs
must (1) form the transitive closure of the near-dup relation and
(2) pick exactly one keeper per group, both without any driver-side
graph state.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC 2014).  Both operations are pure DataFrame
groupBy+join rounds; the edge set provably converges to a star forest
(every node pointing at its component minimum) in O(log^2 n) rounds —
O(log n) in practice — so a 10^12-node graph needs tens of shuffle
rounds, not diameter-many (a label-propagation loop over a chain of
length L needs L rounds; this needs ~log L).

Spark-specific care:
- every round ends in `localCheckpoint(eager=True)` — iterative
  DataFrame algorithms otherwise accumulate a lineage/plan that grows
  exponentially and stalls the driver in Catalyst long before the
  executors are busy;
- convergence is detected by (edge count, order-insensitive xxhash64
  fold) over the canonicalized edge set — one cheap agg per round, no
  except/join against the previous round;
- node ids keep their column type (string doc_ids or the streaming
  tier's bigint ids — every comparison is least/greatest/min) and the
  component id is the minimum member under that type's ordering:
  deterministic, no RNG, no driver-side id assignment
  (zipWithUniqueId-style indices would break resume determinism
  across partitionings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "connected_components",
    "assign_components",
    "dedup_keep_list",
    "near_dup_groups",
]


def _sym(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Symmetric directed edge list (u, v), self-loops dropped."""
    e = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).where(F.col(a) != F.col(b))
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min(N(u) ∪ {u}); re-link every strictly
    greater neighbor v > u to m.  Keeps (v, m) for v > u.

    Adjacency is symmetrized here: between rounds the edge list is the
    directed child→root form small-star emits, and large-star's
    neighborhood N(u) is over the UNDIRECTED graph."""
    edges = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        edges.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("u", "_mv").alias("m"))
    )
    return (
        edges.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge large→small, then for each node u link u and
    all of its (smaller) neighbors to m = min neighbor."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return relink


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(count, order-insensitive hash) of the canonicalized edge set —
    one agg, used as the convergence test between rounds."""
    canon = edges.select(F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")).distinct()
    row = canon.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(doc_id, component_id) for every node appearing in `pairs`, where
    component_id is the lexicographically smallest member of the node's
    connected component.  Only nodes present in `pairs` are returned —
    use `assign_components` to extend to a full corpus (singletons are
    their own component).

    Raises RuntimeError if the star forest has not converged after
    `max_rounds` alternating rounds (the SoCC-2014 bound makes this
    unreachable for any graph that fits in a real cluster; the guard
    exists so a logic regression fails loudly instead of looping).
    """
    edges = _sym(pairs, a_col, b_col).localCheckpoint(eager=True)
    prev = _edge_fingerprint(edges)
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _edge_fingerprint(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_rounds} rounds")
    # converged edge set is a star forest oriented child→root after
    # small-star; emit members + the roots themselves
    stars = edges.select(F.greatest("u", "v").alias("doc_id"), F.least("u", "v").alias("component_id"))
    roots = stars.select(F.col("component_id").alias("doc_id"), "component_id")
    return stars.unionByName(roots).distinct()


def assign_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """docs + component_id column: a doc in no pair is its own
    singleton component.  Left join against the (tiny relative to the
    corpus) component table — broadcast-eligible when the duplicate
    population is small; a plain shuffled left join otherwise, keyed on
    the uniformly-distributed doc_id."""
    comp = connected_components(pairs, a_col, b_col).withColumnRenamed("doc_id", id_col)
    return docs.join(comp, id_col, "left").withColumn(
        "component_id", F.coalesce(F.col("component_id"), F.col(id_col))
    )


def dedup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    prefer: Column | None = None,
) -> DataFrame:
    """docs + (component_id, keep): exactly one keeper per component.

    Default keeper = lexicographically smallest doc_id (deterministic,
    matches exact_dup_groups' canonical_doc convention).  Pass `prefer`
    (a Column over docs' columns, higher wins — e.g. a quality score) to
    keep the best-scoring member; doc_id breaks ties deterministically.

    The keeper election is a groupBy over (component_id) — components
    are small by construction (near-dup groups), so no skew treatment is
    needed; a pathological mega-component would be the signal of a bad
    similarity threshold, not a partitioning problem.
    """
    with_comp = assign_components(docs, pairs, id_col, a_col, b_col)
    # NULL-safe: a doc with no score must never beat a scored one (a
    # bare -NULL would sort FIRST inside the min-struct and win)
    score = (
        F.coalesce(prefer.cast("double"), F.lit(float("-inf")))
        if prefer is not None
        else F.lit(0.0)
    )
    ranked = with_comp.withColumn("_pref", score)
    # min/max struct trick: one map-side-combinable agg, no window over
    # the full corpus.  Highest _pref wins; smallest doc_id breaks ties
    # (invert the id ordering inside a max() by using a struct with the
    # negated preference in a min()).
    winners = (
        ranked.groupBy("component_id")
        .agg(F.min(F.struct((-F.col("_pref")).alias("neg_pref"), F.col(id_col).alias("winner"))).alias("w"))
        .select("component_id", F.col("w.winner").alias("_winner"))
    )
    return (
        ranked.join(winners, "component_id")
        .withColumn("keep", F.col(id_col) == F.col("_winner"))
        .drop("_pref", "_winner")
    )


def near_dup_groups(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end near-dup grouping over a text corpus: SimHash
    block-permutation candidate pairs (textops.simhash_near_pairs) →
    transitive closure → (component_id, n_docs, canonical_doc, doc_ids)
    summary, one row per multi-doc group.  The corpus-scale work is the
    simhash pass + the log-round star contraction; the summary groupBy
    runs over duplicate members only."""
    from gwv_spark.textops import simhash_near_pairs

    pairs = simhash_near_pairs(df, max_hamming=max_hamming, text_col=text_col, id_col=id_col)
    comp = connected_components(pairs)
    return (
        comp.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
            # doc_ids is a REPORT column: capped so one pathological
            # mega-component (threshold too loose) cannot materialize a
            # row the size of the corpus; n_docs stays exact
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, 1000).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )
