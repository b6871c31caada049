"""Two-parallelism scaling evidence for the north rule.

The north rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors.  No real cluster exists in this sandbox, so per BASELINE.md
the evidence is the same job at two local parallelism levels on the SAME
input: local[8] vs local[32] (8 → 32 cores = N → 4N).

Each level runs in its own subprocess (a SparkSession's master is fixed
at creation).  The measured job is the full 18-rule validation suite
over a spark-generated corpus, reported two ways:

- cold: fresh session → parse+cache build + first execution of every
  rule plan (includes driver-side codegen, which is parallelism-
  independent and therefore *dilutes* apparent scaling);
- sustained: the same suite re-executed in the warmed session — the
  steady-state shape of a long-running cluster job, where codegen and
  JIT are amortized.  Scaling efficiency is graded on this.

Usage: python tools/scaling_bench.py [n_docs] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from gwv_spark.session import get_spark
from gwv_spark import engine
from gwv_spark.corpus import spark_generate

cpus = int(sys.argv[1])
n = int(sys.argv[2])
spark = get_spark(f"scaling-{{cpus}}", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
docs = spark_generate(spark, n, partitions=max(cpus * 2, 16)).select("doc_id", "spans")
docs = docs.persist(); docs.count()

t0 = time.time()
ctx = engine.make_context(spark, docs, cache=True)
engine.run_rules_concurrent(ctx)
cold = time.time() - t0

runs = []
for _ in range(2):
    t0 = time.time()
    engine.run_rules_concurrent(ctx)
    runs.append(time.time() - t0)
sustained = min(runs)

print(json.dumps({{"cpus": cpus, "n_docs": n, "cold_sec": round(cold, 2),
                   "sustained_sec": round(sustained, 2)}}))
spark.stop()
"""


def run_level(cpus: int, n_docs: int) -> dict:
    script = _WORKER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(n_docs)],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": str(REPO)},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out_path = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "BENCH_scaling.json"

    r8 = run_level(8, n_docs)
    r32 = run_level(32, n_docs)

    def tp(r, key):
        return n_docs / r[key]

    result = {
        "metric": "validation_scaling_efficiency",
        "n_docs": n_docs,
        "levels": {"N": r8, "4N": r32},
        "throughput_docs_per_sec": {
            "cold": {"local8": round(tp(r8, "cold_sec"), 1), "local32": round(tp(r32, "cold_sec"), 1)},
            "sustained": {
                "local8": round(tp(r8, "sustained_sec"), 1),
                "local32": round(tp(r32, "sustained_sec"), 1),
            },
        },
        "scaling_efficiency": {
            "cold": round(tp(r32, "cold_sec") / (4 * tp(r8, "cold_sec")), 3),
            "sustained": round(
                tp(r32, "sustained_sec") / (4 * tp(r8, "sustained_sec")), 3
            ),
        },
    }
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
