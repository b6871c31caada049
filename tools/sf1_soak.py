"""One-decade scale soak (VERDICT r4 next #2): the full 18-rule suite
and the dedup pipeline measured at 10M docs against the 1M anchor.

The 100x claim needs a measured decade, not an extrapolated one: this
runs the SAME code at n=1M and n=10M on the same session and records

- sustained suite throughput (docs/s) at both sizes and their ratio
  (criterion: 10M rate >= 0.7x the 1M rate — sub-linear decay only);
- a normalized executed-plan fingerprint of the 18-rule union at both
  sizes (criterion: identical operator tree — AQE may re-coalesce
  partition COUNTS at runtime, but the operator SHAPE must not change
  with scale: a join that flips strategy at 10x would flip again at
  the design point);
- dedup pipeline (simhash pairs -> star-contraction closure -> keeper
  election) wall time at both sizes over a deterministic token-diverse
  text corpus with 0.5% planted near-dup twins, and the group counts
  (exact precision expectation: groups == planted twins).

Writes BENCH_sf1_soak.json.  Run alone (no concurrent Spark-heavy
work) — the scaling campaign's one-at-a-time rule applies here too.

Usage: python tools/sf1_soak.py [small_n] [big_n]
Env: SPARK_GRAFT_CPUS (default 32), SPARK_DRIVER_MEM (default 48g
here — the 10M cached parse needs headroom; spills are counted as
decay, not failure).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

SMALL_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BIG_N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000


def plan_fingerprint(df) -> list[str]:
    """Operator-shape lines of the executed plan, normalized: expression
    ids, partition/row counts, paths and AQE runtime annotations are
    stripped so two runs differ only if an OPERATOR differs."""
    s = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for ln in s.splitlines():
        m = re.match(r"^[\s:+\-*]*\(?(\d+\))?\s*([A-Za-z][A-Za-z0-9]+)", ln)
        if not m:
            continue
        op = m.group(2)
        if op in ("Arguments", "Input", "Output", "Results", "Keys", "Functions",
                  "Condition", "ReadSchema", "Batched", "Location", "Subquery"):
            continue
        out.append(op)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    if os.environ.get("SOAK_PHASE") == "incremental":
        # phase-only rerun: merge into the existing artifact
        from gwv_spark.corpus import spark_generate
        from gwv_spark.session import get_spark

        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark = get_spark("gwv-sf1-soak", cpus=cpus, shuffle_partitions=cpus)
        out = REPO / "BENCH_sf1_soak.json"
        rec = json.loads(out.read_text()) if out.exists() else {"metric": "sf1_scale_soak"}
        try:
            _incremental_phase(spark, rec, cpus, spark_generate, F)
        except Exception as e:  # noqa: BLE001
            rec["incremental_error"] = f"{e.__class__.__name__}: {e}"[:400]
        out.write_text(json.dumps(rec, indent=2) + "\n")
        print(json.dumps(rec.get("incremental", rec.get("incremental_error"))))
        spark.stop()
        return

    from gwv_spark import engine
    from gwv_spark.components import dedup_keep_list
    from gwv_spark.corpus import spark_generate
    from gwv_spark.session import get_spark
    from gwv_spark.textops import simhash_near_pairs

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("gwv-sf1-soak", cpus=cpus, shuffle_partitions=cpus)
    rec: dict = {
        "metric": "sf1_scale_soak",
        "sizes": [SMALL_N, BIG_N],
        "cpus": cpus,
        "driver_mem": os.environ.get("SPARK_DRIVER_MEM"),
    }

    suite = {}
    plans = {}
    for n in (SMALL_N, BIG_N):
        docs = spark_generate(spark, n, partitions=cpus * 4).select("doc_id", "spans")
        t0 = time.time()
        ctx = engine.make_context(spark, docs, cache=True)
        cold = time.time() - t0
        t0 = time.time()
        engine.run_suite(ctx)
        cold += time.time() - t0
        runs = []
        for _ in range(2):
            t0 = time.time()
            engine.run_suite(ctx)
            runs.append(time.time() - t0)
        sustained = min(runs)
        plans[n] = plan_fingerprint(engine.run_rules(ctx))
        suite[n] = {
            "cold_s": round(cold, 1),
            "sustained_s": round(sustained, 1),
            "docs_per_sec": round(n / sustained, 1),
        }
        print(json.dumps({"suite_at": n, **suite[n]}), flush=True)
        ctx.docs.unpersist()
        ctx.spans.unpersist()
    rec["suite"] = {str(k): v for k, v in suite.items()}
    ratio = suite[BIG_N]["docs_per_sec"] / suite[SMALL_N]["docs_per_sec"]
    rec["suite_rate_ratio_10x"] = round(ratio, 3)
    rec["criterion_rate_ratio_ge_0_7"] = ratio >= 0.7
    same_plan = plans[SMALL_N] == plans[BIG_N]
    rec["plan_shape_stable"] = same_plan
    if not same_plan:
        import difflib

        rec["plan_diff"] = [
            d for d in difflib.unified_diff(
                plans[SMALL_N], plans[BIG_N], lineterm="", n=0
            )
        ][:80]

    # ---- dedup pipeline: token-diverse text + 0.5% planted twins.
    #
    # RADIUS-vs-CORPUS-SIZE scale wall, measured the hard way (first
    # soak attempt): block-permutation candidate volume is
    # ~ (k+1) * N^2 / 2^(64/(k+1)).  At k=3 (16-bit blocks) that is
    # ~31M candidates at N=1M (fine, measured 20.7 s) but ~3.1e9 at
    # N=10M — a ~150 GB candidate shuffle that exceeded this box's
    # 80 GB scratch and killed the job.  k=3 at 10M random-signature
    # docs is past the width's collision knee (bucket occupancy
    # N/2^16 = 152); the 10^12-scale prescription is wider blocks
    # (smaller k per pass, run passes at increasing k over survivors),
    # extra signature bits in the bucket key, or exact-hash
    # pre-partitioning.  The soak therefore measures k=3 AND k=1 at
    # 1M, and k=1 at 10M (32-bit blocks: expected random collisions
    # ~ 2*N^2/2^32 = 46k candidates — back to linear-dominated).
    dedup = {}
    for n, k in ((SMALL_N, 3), (SMALL_N, 1), (BIG_N, 1)):
        ids = spark.range(n, numPartitions=cpus * 4)
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda j: F.concat(F.lit("w"), F.col("id"), F.lit("x"), j),
        )
        base = ids.select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
            F.concat_ws(" ", toks).alias("text"),
        )
        twin_toks = F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda j: F.when(j == 0, F.concat(F.lit("q"), F.col("id"))).otherwise(
                F.concat(F.lit("w"), F.col("id"), F.lit("x"), j)
            ),
        )
        twins = ids.where(F.col("id") % 200 == 0).select(
            F.concat(F.lit("t"), F.col("id")).alias("doc_id"),
            F.concat_ws(" ", twin_toks).alias("text"),
        )
        text_df = base.unionByName(twins)
        t0 = time.time()
        try:
            keep = dedup_keep_list(text_df, simhash_near_pairs(text_df, max_hamming=k))
            agg = keep.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((~F.col("keep")).cast("long")).alias("removed"),
            ).collect()[0]
        except Exception as e:  # noqa: BLE001 — recorded, not hidden
            rec[f"dedup_n{n}_k{k}_error"] = f"{e.__class__.__name__}: {e}"[:400]
            print(json.dumps({"dedup_at": n, "max_hamming": k, "error": True}),
                  flush=True)
            continue
        n_total, n_removed = int(agg["n"]), int(agg["removed"] or 0)
        wall = time.time() - t0
        dedup[(n, k)] = {
            "wall_s": round(wall, 1),
            "n_docs": n_total,
            "n_removed": n_removed,
            "docs_per_sec": round((n + n // 200) / wall, 1),
        }
        print(json.dumps({"dedup_at": n, "max_hamming": k, **dedup[(n, k)]}), flush=True)
    rec["dedup"] = {f"n{n}_k{k}": v for (n, k), v in dedup.items()}
    if (BIG_N, 1) in dedup and (SMALL_N, 1) in dedup:
        dratio = (
            dedup[(BIG_N, 1)]["docs_per_sec"] / dedup[(SMALL_N, 1)]["docs_per_sec"]
        )
        rec["dedup_rate_ratio_10x_k1"] = round(dratio, 3)
    rec["dedup_k3_at_10M"] = (
        "not measured: candidate volume (k+1)*N^2/2^16 ~ 3.1e9 rows "
        "(~150 GB shuffle) exceeds this box's 80 GB scratch — the "
        "radius/width knee documented in the dedup section comment; "
        "at 10^12 use wider blocks (smaller k per pass) or extra "
        "bucket-key bits"
    )

    # ---- incremental append at scale (verdict next #1's done bar):
    # at bench SF the per-action constants swamp a 6k-doc delta; HERE a
    # 10% append's doc-local delta work should land near 10% of the
    # baseline's rule work (component_timings separates it from the
    # per-run commit machinery).
    try:
        _incremental_phase(spark, rec, cpus, spark_generate, F)
    except Exception as e:  # noqa: BLE001 — recorded, not hidden
        rec["incremental_error"] = f"{e.__class__.__name__}: {e}"[:400]
        print(json.dumps({"incremental": "FAILED", "error": rec["incremental_error"]}), flush=True)

    (REPO / "BENCH_sf1_soak.json").write_text(json.dumps(rec, indent=2) + "\n")
    print(json.dumps({k: v for k, v in rec.items() if k not in ("suite", "dedup", "plan_diff")}))
    spark.stop()


def _incremental_phase(spark, rec, cpus, spark_generate, F) -> None:
    import shutil
    import tempfile
    import time
    from pathlib import Path

    from gwv_spark import job as jobmod
    from gwv_spark.streaming import DOC_LOCAL_RULES

    inc_dir = tempfile.mkdtemp(prefix="gwv_soak_inc_")
    inc_out = tempfile.mkdtemp(prefix="gwv_soak_incout_")
    delta_tmp = tempfile.mkdtemp(prefix="gwv_soak_delta_")
    docs_all = spark_generate(spark, BIG_N, partitions=cpus * 4)
    split = F.pmod(F.xxhash64("doc_id"), F.lit(10))
    docs_all.where(split < 9).write.mode("overwrite").parquet(inc_dir)
    docs_all.where(split == 9).write.mode("overwrite").parquet(delta_tmp)
    n_docs_base = spark.read.parquet(inc_dir).count()
    incr_rules = list(DOC_LOCAL_RULES) + ["delquote", "delvar"]
    incr_args = ["--input", inc_dir, "--output", inc_out,
                 "--rules", *incr_rules, "--n-buckets", "64", "--incremental"]
    t0 = time.time()
    jobmod.main(incr_args, spark=spark)
    t_base = time.time() - t0
    # append: MOVE the delta's data files into the corpus dir (base
    # files untouched -> a true append for the manifest diff)
    moved = 0
    for p in sorted(Path(delta_tmp).glob("*.parquet")):
        p.rename(Path(inc_dir) / f"delta-{moved:05d}.parquet")
        moved += 1
    t0 = time.time()
    jobmod.main(incr_args, spark=spark)
    t_app = time.time() - t0
    comp = {
        r["component"]: r["wall_s"]
        for r in spark.read.parquet(f"{inc_out}/component_timings").collect()
    }
    base_work = comp.get("__rules__", 0.0) + comp.get("__ri_state__", 0.0)
    app_work = comp.get("__local_delta__", 0.0) + comp.get("__ri_fold__", 0.0)
    rec["incremental"] = {
        # counted from the written base files (the xxhash64 split is a
        # ~90% sample, not an exact 90% — review finding r5)
        "n_docs_base": n_docs_base,
        "baseline_total_s": round(t_base, 1),
        "append10_total_s": round(t_app, 1),
        "baseline_rulework_s": round(base_work, 1),
        "append10_rulework_s": round(app_work, 1),
        "rulework_ratio": round(app_work / base_work, 3) if base_work else None,
        # per-component split: __local_delta__ is the doc-local rules
        # over ONLY the appended files (the verdict's ~10% claim);
        # __ri_fold__ carries the fold's fixed column-pruned corpus key
        # scan, an O(N) term that is NOT delta-proportional by design
        "components": {c: round(v, 1) for c, v in sorted(comp.items())},
        "local_delta_ratio": (
            round(comp.get("__local_delta__", 0.0) / base_work, 3)
            if base_work else None
        ),
    }
    print(json.dumps({"incremental": rec["incremental"]}), flush=True)
    shutil.rmtree(inc_dir, ignore_errors=True)
    shutil.rmtree(inc_out, ignore_errors=True)
    shutil.rmtree(delta_tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
