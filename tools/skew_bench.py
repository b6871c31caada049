"""Hot-key skew bench (north rule: "skewed doc_id prefixes / explicit
skew handling"; VERDICT r3 Missing #5).

Plants a genuinely hot part reference — ONE part quoted by ~20% of all
documents — into a generated corpus, then measures the two rules whose
shuffles carry that key:

- delquote (RI anti join on part_base): AQE skew-join ON vs OFF, with
  broadcast disabled so the join keeps the sort-merge shape it has at
  10^12-doc catalog cardinality (a 1M-row catalog would otherwise be
  broadcast and hide the skew entirely).
- mustrenew (groupBy part_full + collect_set): the deployed salted
  2-phase aggregate vs an unsalted single-phase variant — AQE handles
  join skew but NOT aggregation skew, which is exactly why the rule
  salts manually (rules/mustrenew.py:45-58).

Straggler evidence comes from the Spark REST API's per-stage
taskSummary (p50/max task duration) — max/median >> 1 is the straggler
signature; the mitigation should pull it toward 1.

Output: one JSON line + BENCH_skew.json.

Usage: python tools/skew_bench.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

HOT_FRACTION_MOD = 5  # 1 in 5 docs quote the hot part
HOT_LINE = "99:0:0:10:10:190:190:zzzhot@9"  # dangling versioned quote


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications/{spark.sparkContext.applicationId}{path}") as r:
        return json.loads(r.read())


def _completed_stage_ids(spark) -> set[int]:
    return {s["stageId"] for s in _rest(spark, "/stages?status=complete")}


def _stage_summary(spark, top) -> dict | None:
    sid = top["stageId"]
    try:
        s = _rest(spark, f"/stages/{sid}/0/taskSummary?quantiles=0.5,1.0")
    except Exception:
        return None
    p50, mx = s["duration"]
    rec = {
        "stage_id": sid,
        "n_tasks": top["numCompleteTasks"],
        "shuffle_read_mb_total": round(top["shuffleReadBytes"] / 1e6, 2),
        "task_p50_s": round(p50 / 1000, 3),
        "task_max_s": round(mx / 1000, 3),
        "straggler_ratio": round(mx / p50, 2) if p50 else None,
    }
    srm = s.get("shuffleReadMetrics") or {}
    for key, label in (("readRecords", "rows"), ("readBytes", "bytes")):
        v = srm.get(key)
        if isinstance(v, list) and len(v) == 2 and v[1]:
            rec[f"task_read_{label}_p50"] = int(v[0])
            rec[f"task_read_{label}_max"] = int(v[1])
            if v[0]:
                rec[f"read_{label}_skew_ratio"] = round(v[1] / v[0], 2)
    return rec


def _reduce_stage_summaries(spark, new_ids: set[int]) -> dict:
    """Summaries of the run's reduce stages — where a hot join/agg key
    lands.  `reduce_stage` = largest total shuffle read (the join);
    `skewest_stage` = largest per-task rows max/p50 ratio (for mustrenew
    that is the aggregation stage, whose total read is smaller than the
    join's but whose hot task reads every quoter of the hot part).
    Per-task readRecords max/p50 is host-noise-free; duration max/p50 is
    the straggler it causes."""
    stages = [
        s
        for s in _rest(spark, "/stages?status=complete")
        if s["stageId"] in new_ids and (s.get("shuffleReadBytes") or 0) > 0
    ]
    recs = [r for r in (_stage_summary(spark, s) for s in stages) if r]
    if not recs:
        return {}
    by_read = max(recs, key=lambda r: r["shuffle_read_mb_total"])
    by_skew = max(recs, key=lambda r: r.get("read_rows_skew_ratio") or 0)
    out = {"reduce_stage": by_read}
    if by_skew["stage_id"] != by_read["stage_id"]:
        out["skewest_stage"] = by_skew
    return out


def _measure(spark, label: str, run, n_runs: int = 2) -> dict:
    walls = []
    before = _completed_stage_ids(spark)
    for _ in range(n_runs):
        t0 = time.time()
        run()
        walls.append(round(time.time() - t0, 3))
    new_ids = _completed_stage_ids(spark) - before
    rec = {"wall_s_min": min(walls), "wall_s_runs": walls}
    rec.update(_reduce_stage_summaries(spark, new_ids))
    print(f"  {label}: {rec}", file=sys.stderr)
    return rec


def main() -> None:
    from pyspark.sql import functions as F

    from gwv_spark import engine
    from gwv_spark.corpus import spark_generate
    from gwv_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(
        "gwv_spark-skew-bench",
        cpus=32,
        extra_conf={
            "spark.ui.enabled": "true",  # REST taskSummary is the evidence
            # keep the anti join sort-merge (the 10^12-catalog shape):
            # no static OR adaptive broadcast conversion
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            # skew detection thresholds sized to this corpus (defaults
            # are 256M partitions — cluster scale); the MECHANISM under
            # test is identical, only the trigger size differs
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # corpus with the hot key: 1 in HOT_FRACTION_MOD docs gets an extra
    # part span quoting zzzhot@9 (dangling base -> delquote fires;
    # versioned quote -> mustrenew groups every quoter under one key)
    hot_span = F.struct(
        F.lit("part").alias("kind"),
        F.lit(HOT_LINE).alias("text"),
        F.lit("zzzhot").alias("media_ref"),
        F.size("spans").cast("int").alias("offset"),
    )
    docs = (
        spark_generate(spark, n_docs, partitions=128)
        .select(
            "doc_id",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(HOT_FRACTION_MOD)) == 0,
                F.concat(F.col("spans"), F.array(hot_span)),
            )
            .otherwise(F.col("spans"))
            .alias("spans"),
        )
    )
    ctx = engine.make_context(spark, docs, cache=True)
    ctx.docs.count()  # materialize the cache outside the timings

    from gwv_spark.rules import RULES, load_all_rules

    load_all_rules()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    results: dict = {
        "metric": "hot_key_skew_mitigation",
        "n_docs": n_docs,
        "hot_fraction": 1 / HOT_FRACTION_MOD,
    }

    # --- delquote: AQE skew-join OFF vs ON --------------------------
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    force(RULES["delquote"](ctx))  # warm: codegen + python workers
    results["delquote_skewjoin_off"] = _measure(
        spark, "delquote skewJoin=off", lambda: force(RULES["delquote"](ctx))
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["delquote_skewjoin_on"] = _measure(
        spark, "delquote skewJoin=on", lambda: force(RULES["delquote"](ctx))
    )

    # --- mustrenew: unsalted single-phase vs deployed salted --------
    def unsalted(ctx):
        """The single-phase shape the deployed rule deliberately avoids."""
        quotes = (
            ctx.spans.where(
                (~F.col("is_alias"))
                & (F.col("category") != "user-owned")
                & (F.col("kind") == "part")
            )
            .select("doc_id", "part_full", F.col("media_ref").alias("part_base"))
            .where(F.col("part_full").contains("@"))
        )
        old_bases = ctx.docs.select(
            F.col("doc_id").alias("part_base"),
            F.col("gdata").contains("@").alias("base_is_old"),
        )
        j = quotes.join(old_bases, "part_base", "left")
        return j.groupBy("part_full").agg(
            F.max(F.coalesce(F.col("base_is_old"), F.lit(False))).alias("is_old"),
            F.sort_array(F.collect_set("doc_id")).alias("quoters"),
        )

    force(unsalted(ctx))
    results["mustrenew_unsalted"] = _measure(
        spark, "mustrenew unsalted", lambda: force(unsalted(ctx))
    )
    force(RULES["mustrenew"](ctx))
    results["mustrenew_salted"] = _measure(
        spark, "mustrenew salted (deployed)", lambda: force(RULES["mustrenew"](ctx))
    )

    out = json.dumps(results)
    (REPO / "BENCH_skew.json").write_text(json.dumps(results, indent=1))
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
