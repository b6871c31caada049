"""Connected-components dedup grouping (gwv_spark/components.py).

Correctness model: a driver-side union-find over the same pair list is
the reference; the distributed large-star/small-star result must agree
exactly — membership AND the lexicographic-min component id — on
adversarial topologies (long chains stress the log-round contraction,
cliques stress dedup, random graphs stress everything at once).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from gwv_spark import components as C


def union_find(pairs):
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[str, set[str]] = {}
    for node in list(parent):
        groups.setdefault(find(node), set()).add(node)
    return {min(members): members for members in groups.values()}


def expected_rows(pairs):
    return sorted(
        (doc, root) for root, members in union_find(pairs).items() for doc in members
    )


def run_cc(spark, pairs, partitions=None):
    df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    if partitions:
        df = df.repartition(partitions)
    out = C.connected_components(df)
    return sorted((r["doc_id"], r["component_id"]) for r in out.collect())


TOPOLOGIES = {
    # a 200-node chain: diameter 199 — label propagation would need ~200
    # rounds; the star contraction must close it in far fewer (bound
    # asserted separately below)
    "chain": [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(199)],
    "star": [("hub", f"leaf{i:02d}") for i in range(40)],
    "two_cliques": [
        (f"a{i}", f"a{j}") for i in range(6) for j in range(i + 1, 6)
    ] + [(f"b{i}", f"b{j}") for i in range(5) for j in range(i + 1, 5)],
    "disjoint_pairs": [(f"p{i}x", f"p{i}y") for i in range(30)],
    "self_loops_and_dups": [("s1", "s1"), ("s1", "s2"), ("s2", "s1"), ("s2", "s3"), ("s1", "s2")],
}


@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
def test_matches_union_find(spark, name):
    pairs = TOPOLOGIES[name]
    # self-loop-only nodes never connect to anything: union-find sees
    # them as singletons, the edge list drops them — align the reference
    ref = [
        (d, c)
        for d, c in expected_rows(pairs)
        if any(a != b and d in (a, b) for a, b in pairs)
    ]
    assert run_cc(spark, pairs) == ref


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = [f"n{i:03d}" for i in range(120)]
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert run_cc(spark, pairs) == expected_rows(pairs)


def test_partitioning_invariance(spark):
    pairs = TOPOLOGIES["chain"]
    assert run_cc(spark, pairs, partitions=1) == run_cc(spark, pairs, partitions=17)


def test_chain_converges_in_log_rounds(spark, monkeypatch):
    """The scale claim: a diameter-199 chain must close in O(log n)
    alternating rounds, not O(diameter).  Count rounds via the
    fingerprint hook."""
    calls = {"n": 0}
    orig = C._edge_fingerprint

    def counting(edges):
        calls["n"] += 1
        return orig(edges)

    monkeypatch.setattr(C, "_edge_fingerprint", counting)
    run_cc(spark, TOPOLOGIES["chain"])
    rounds = calls["n"] - 1  # first call is the pre-loop baseline
    assert rounds <= 12, f"chain took {rounds} alternating rounds"


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "doc_a string, doc_b string")
    out = C.connected_components(df)
    assert out.columns == ["doc_id", "component_id"]
    assert out.count() == 0


def test_assign_components_singletons(spark):
    docs = spark.createDataFrame([(f"d{i}",) for i in range(6)], "doc_id string")
    pairs = spark.createDataFrame([("d0", "d1"), ("d1", "d2")], "doc_a string, doc_b string")
    got = {r["doc_id"]: r["component_id"] for r in C.assign_components(docs, pairs).collect()}
    assert got == {"d0": "d0", "d1": "d0", "d2": "d0", "d3": "d3", "d4": "d4", "d5": "d5"}


def test_keep_list_default_min_id(spark):
    docs = spark.createDataFrame([(f"d{i}", i) for i in range(5)], "doc_id string, q int")
    pairs = spark.createDataFrame([("d3", "d1"), ("d1", "d2")], "doc_a string, doc_b string")
    rows = C.dedup_keep_list(docs, pairs).collect()
    kept = sorted(r["doc_id"] for r in rows if r["keep"])
    assert kept == ["d0", "d1", "d4"]  # min of {d1,d2,d3} plus singletons
    # exactly one keeper per component
    per_comp = {}
    for r in rows:
        per_comp.setdefault(r["component_id"], 0)
        per_comp[r["component_id"]] += int(r["keep"])
    assert all(v == 1 for v in per_comp.values())


def test_keep_list_prefer_column(spark):
    docs = spark.createDataFrame(
        [("d1", 1.0), ("d2", 9.0), ("d3", 9.0), ("d9", 0.0)],
        "doc_id string, quality double",
    )
    pairs = spark.createDataFrame([("d1", "d2"), ("d2", "d3")], "doc_a string, doc_b string")
    rows = C.dedup_keep_list(docs, pairs, prefer=F.col("quality")).collect()
    kept = sorted(r["doc_id"] for r in rows if r["keep"])
    # highest quality wins; d2 beats d3 on the doc_id tiebreak
    assert kept == ["d2", "d9"]


def test_no_cartesian_product(spark):
    pairs = spark.createDataFrame(TOPOLOGIES["two_cliques"], "doc_a string, doc_b string")
    plan = C.connected_components(pairs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_near_dup_groups_end_to_end(spark, monkeypatch):
    """Corpus → simhash pairs → groups: transitive closure is visible
    (a-b and b-c near pairs land in ONE group even if a-c exceeds the
    hamming bound) and the summary matches the keep-list view."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    mid = base.replace("quick", "rapid")
    far = mid.replace("lazy", "idle").replace("brown", "dark")
    docs = spark.createDataFrame(
        [("a", base), ("b", mid), ("c", far), ("x", "completely unrelated text about spark " * 9)],
        "doc_id string, text string",
    )
    from gwv_spark.textops import simhash_near_pairs

    pairs = simhash_near_pairs(docs, max_hamming=6)
    got_pairs = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    groups = C.near_dup_groups(docs, max_hamming=6)
    rows = groups.collect()
    members = {m for r in rows for m in r["doc_ids"]}
    # whatever the pair set is, the groups must be its transitive closure
    assert members == {d for p in got_pairs for d in p}
    for r in rows:
        assert r["canonical_doc"] == min(r["doc_ids"])
        assert r["n_docs"] == len(r["doc_ids"]) >= 2
    if ("a", "b") in got_pairs and ("b", "c") in got_pairs:
        assert any({"a", "b", "c"} <= set(r["doc_ids"]) for r in rows)


def test_dedup_job_cli(spark, tmp_path):
    """The spark-submit surface end to end: pairs → groups → keep list →
    deduped corpus, with exact-hash pairs unioned in and a quality
    preference deciding survivors."""
    from gwv_spark import dedup_job

    base = "common shared text that repeats across documents " * 6
    rows = [
        ("d1", base, 1.0),
        ("d2", base.replace("shared", "joint"), 9.0),   # near-dup of d1
        ("d3", "an entirely different document about spark " * 8, 5.0),
        ("d4", "an entirely different document about spark " * 8, 2.0),  # exact dup of d3
        ("d5", "unique and unlike anything else here " * 7, 3.0),
    ]
    data = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    spark.createDataFrame(rows, "doc_id string, text string, quality double").write.parquet(data)
    dedup_job.main(
        ["--input", data, "--output", out, "--max-hamming", "6",
         "--exact", "--prefer", "quality", "--write-corpus"],
        spark=spark,
    )
    keep = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/keep_list").collect()}
    assert len(keep) == 5
    # exact dups grouped; quality elects d3 over d4
    assert keep["d3"]["component_id"] == keep["d4"]["component_id"]
    assert keep["d3"]["keep"] and not keep["d4"]["keep"]
    # near-dups grouped; quality elects d2 over d1
    if keep["d1"]["component_id"] == keep["d2"]["component_id"]:
        assert keep["d2"]["keep"] and not keep["d1"]["keep"]
    assert keep["d5"]["keep"]
    groups = spark.read.parquet(f"{out}/groups").collect()
    assert all(r["n_docs"] >= 2 for r in groups)
    survivors = {r["doc_id"] for r in spark.read.parquet(f"{out}/deduped").collect()}
    assert survivors == {d for d, r in keep.items() if r["keep"]}
    # deduped corpus keeps the original columns only
    assert set(spark.read.parquet(f"{out}/deduped").columns) == {"doc_id", "text", "quality"}


def test_streaming_pair_log_composes_with_closure(spark, tmp_path):
    """On-arrival dedup at scale = the streaming simhash pair log (KB
    rows, maintained incrementally) + a periodic closure over it.  The
    groups computed from the accumulated pair log must equal the batch
    near_dup_groups over the accumulated corpus — so the expensive
    corpus scan happens once per document (at arrival), and group
    formation runs over the duplicate population only."""
    import pyarrow.parquet as pq

    from gwv_spark.streaming import simhash_pairs_view, stream_simhash_drain

    base = "a long shared passage that makes these documents near dups " * 6
    rows = [
        (1, base),
        (2, base.replace("long", "lengthy")),
        (3, "something else entirely about query engines " * 8),
        (4, base.replace("shared", "common")),   # near-dup of 1/2, lands later
        (5, "still another unrelated piece of text " * 9),
    ]
    land = tmp_path / "land"
    out = tmp_path / "out"
    land.mkdir()
    # the streaming tier's contract is TEXT_DOCS_SCHEMA (doc_id BIGINT)
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df.limit(3).coalesce(1).write.parquet(str(land / "drop0"))
    stream_simhash_drain(spark, str(land / "*"), str(out), max_hamming=6)
    df.subtract(df.limit(3)).coalesce(1).write.parquet(str(land / "drop1"))
    pair_log = stream_simhash_drain(spark, str(land / "*"), str(out), max_hamming=6)

    from gwv_spark import components as C
    from gwv_spark.textops import simhash_near_pairs

    stream_groups = sorted(
        tuple(r["doc_ids"])
        for r in C.connected_components(simhash_pairs_view(pair_log))
        .groupBy("component_id")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .collect()
    )
    batch_groups = sorted(
        tuple(r["doc_ids"])
        for r in C.near_dup_groups(df, max_hamming=6).collect()
    )
    assert stream_groups == batch_groups
    # cross-drop discovery: doc 4 (drop1) paired with doc 1 (drop0)
    flat = {d for g in stream_groups for d in g}
    assert {1, 4} <= flat


def test_keep_list_null_prefer_never_wins(spark):
    """Review regression: -NULL sorts first inside a min-struct, so an
    unscored doc used to beat every scored one."""
    docs = spark.createDataFrame(
        [("d1", None), ("d2", 5.0), ("d3", 1.0)],
        "doc_id string, quality double",
    )
    pairs = spark.createDataFrame([("d1", "d2"), ("d2", "d3")], "doc_a string, doc_b string")
    rows = C.dedup_keep_list(docs, pairs, prefer=F.col("quality")).collect()
    kept = [r["doc_id"] for r in rows if r["keep"]]
    assert kept == ["d2"]
    # all-NULL group: deterministic min-id fallback
    docs2 = spark.createDataFrame(
        [("x2", None), ("x1", None)], "doc_id string, quality double"
    )
    pairs2 = spark.createDataFrame([("x1", "x2")], "doc_a string, doc_b string")
    rows2 = C.dedup_keep_list(docs2, pairs2, prefer=F.col("quality")).collect()
    assert [r["doc_id"] for r in rows2 if r["keep"]] == ["x1"]


def test_stream_job_near_dup_mode(spark, tmp_path):
    """spark-submit surface for on-arrival dedup: two drops drained via
    --near-dup, groups/ holds the closure of the accumulated pair log
    (identical to the batch groups over the accumulated corpus)."""
    from gwv_spark import stream_job

    base = "a long shared passage that makes these documents near dups " * 6
    rows = [
        (1, base),
        (2, base.replace("shared", "common")),
        (3, "entirely different content about stream jobs " * 8),
        (4, base.replace("passage", "excerpt")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    land = tmp_path / "land"
    out = tmp_path / "out"
    land.mkdir()
    df.limit(2).coalesce(1).write.parquet(str(land / "d0"))
    argv = ["--input", str(land / "*"), "--output", str(out),
            "--near-dup", "--max-hamming", "6"]
    stream_job.main(argv, spark=spark)
    df.subtract(df.limit(2)).coalesce(1).write.parquet(str(land / "d1"))
    # second drain also exercises the post-drain maintenance hook
    # (review regression: --near-dup used to return before --compact-after)
    stream_job.main(argv + ["--compact-after", str(1 << 30)], spark=spark)

    got = sorted(
        tuple(r["doc_ids"]) for r in spark.read.parquet(str(out / "groups")).collect()
    )
    want = sorted(
        tuple(r["doc_ids"])
        for r in C.near_dup_groups(df, max_hamming=6).collect()
    )
    assert got == want and got  # non-empty and identical to batch
    # mode exclusions fail fast
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        stream_job.main(argv + ["--ri"], spark=spark)
    with _pytest.raises(SystemExit):
        stream_job.main(argv + ["--continuous", "1 second"], spark=spark)


def test_blank_docs_never_near_dup_pair(spark):
    """Review regression: token-less docs all hash to the empty SimHash
    signature — pairing them would declare every pair of blanks a
    near-dup AND blow the candidate join up quadratically.  They are
    excluded from signature pairing; exact_dup_groups still owns the
    'identical (empty) text' claim."""
    from gwv_spark.textops import exact_dup_groups, simhash_near_pairs

    docs = spark.createDataFrame(
        [("a", None), ("b", ""), ("c", "   "),
         ("d", "real content here " * 10), ("e", "real content here " * 10)],
        "doc_id string, text string",
    )
    pairs = simhash_near_pairs(docs, max_hamming=6).collect()
    paired = {d for r in pairs for d in (r["doc_a"], r["doc_b"])}
    assert paired <= {"d", "e"}
    assert ("d", "e") in {(r["doc_a"], r["doc_b"]) for r in pairs}
    # exact dedup still groups the truly identical blanks ("" == "")
    eg = exact_dup_groups(docs.where(F.col("text").isNotNull())).collect()
    assert any(r["n_docs"] == 2 for r in eg)  # d+e group at minimum


def test_simhash_hot_bucket_cap(spark):
    """The boilerplate safety valve: a template population whose docs
    all share every signature block is dropped from candidate
    generation at max_bucket, while a diverse planted pair is still
    found; the default (None) preserves exact semantics."""
    from gwv_spark.textops import simhash_near_pairs

    template = [
        (f"b{i:02d}", "identical boilerplate body shared by everyone " * 5)
        for i in range(30)
    ]
    diverse = [
        ("x1", "genuinely distinct content alpha beta gamma delta " * 5),
        ("x2", "genuinely distinct content alpha beta gamma delta " * 5),
    ]
    docs = spark.createDataFrame(template + diverse, "doc_id string, text string")
    capped = simhash_near_pairs(docs, max_hamming=3, max_bucket=10).collect()
    capped_docs = {d for r in capped for d in (r["doc_a"], r["doc_b"])}
    assert ("x1", "x2") in {(r["doc_a"], r["doc_b"]) for r in capped}
    assert not any(d.startswith("b") for d in capped_docs)
    # uncapped default still pairs the boilerplate population
    full = simhash_near_pairs(docs, max_hamming=3).collect()
    full_docs = {d for r in full for d in (r["doc_a"], r["doc_b"])}
    assert any(d.startswith("b") for d in full_docs)
