"""Per-rule timing profile of the full suite at one parallelism level.

Usage: python tools/profile_rules.py <cpus> <n_docs> [driver_mem]
Prints per-rule sustained seconds (2nd run, warmed) sorted desc, plus
suite totals (concurrent execution) cold + sustained.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
if len(sys.argv) > 3:
    os.environ["SPARK_DRIVER_MEM"] = sys.argv[3]

from gwv_spark.session import get_spark  # noqa: E402
from gwv_spark import engine  # noqa: E402
from gwv_spark.corpus import spark_generate  # noqa: E402
from gwv_spark.rules import ALL_RULE_IDS, RULES, load_all_rules  # noqa: E402

extra = json.loads(os.environ.get("SPARK_EXTRA_CONF", "{}"))
spark = get_spark(
    f"profile-{cpus}", cpus=cpus, shuffle_partitions=cpus, extra_conf=extra
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark_generate(spark, n, partitions=max(cpus * 2, 16)).select("doc_id", "spans")

t0 = time.time()
ctx = engine.make_context(spark, docs, cache=True)
print(f"parse+cache: {time.time()-t0:.2f}s", flush=True)

load_all_rules()


def force(df):
    df.write.format("noop").mode("overwrite").save()


# warm every rule once (codegen etc), then time each sequentially
per_rule = {}
for rid in ALL_RULE_IDS:
    t0 = time.time()
    force(RULES[rid](ctx))
    cold = time.time() - t0
    # min-of-3 sustained: single samples are 2-6x noise-dominated on
    # this host (BENCH_scaling.json hardware calibrations)
    runs = []
    for _ in range(3):
        t0 = time.time()
        force(RULES[rid](ctx))
        runs.append(time.time() - t0)
    per_rule[rid] = (round(cold, 2), round(min(runs), 2))

print("rule: cold / sustained sec")
for rid, (c, s) in sorted(per_rule.items(), key=lambda kv: -kv[1][1]):
    print(f"  {rid:12s} {c:7.2f} {s:7.2f}", flush=True)

# full concurrent suite, sustained
for label in ("suite_run1", "suite_run2"):
    t0 = time.time()
    engine.run_rules_concurrent(ctx)
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)

print(json.dumps({
    "cpus": cpus, "n_docs": n,
    "seq_sustained_total": round(sum(s for _, s in per_rule.values()), 2),
}))
spark.stop()
