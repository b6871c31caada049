"""Run the full suite at one parallelism level: cold + 2 sustained.

Usage: python tools/suite_once.py <cpus> <n_docs> [extra_conf_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cpus = int(sys.argv[1])
n = int(sys.argv[2])
extra = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}
mode = sys.argv[4] if len(sys.argv) > 4 else "concurrent"
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
extra.setdefault("spark.ui.showConsoleProgress", "false")

from gwv_spark.session import get_spark  # noqa: E402
from gwv_spark import engine  # noqa: E402
from gwv_spark.corpus import spark_generate  # noqa: E402

spark = get_spark(f"suite-{cpus}", cpus=cpus, shuffle_partitions=cpus, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
docs = spark_generate(spark, n, partitions=max(cpus * 2, 16)).select("doc_id", "spans")

t0 = time.time()
ctx = engine.make_context(spark, docs, cache=True)
built = time.time() - t0

if mode == "both":
    t0 = time.time(); engine.run_suite(ctx); warm_f = time.time() - t0
    t0 = time.time(); engine.run_rules_concurrent(ctx); warm_c = time.time() - t0
    out = {"cpus": cpus, "n_docs": n, "build": round(built, 2),
           "warm_fused": round(warm_f, 2), "warm_conc": round(warm_c, 2)}
    for label, fn in (("fused", engine.run_suite),
                      ("conc", engine.run_rules_concurrent)):
        times = []
        for _ in range(2):
            t0 = time.time(); fn(ctx); times.append(round(time.time() - t0, 2))
        out[label] = times
    print(json.dumps(out))
else:
    run = engine.run_suite if mode == "fused" else engine.run_rules_concurrent
    t0 = time.time(); run(ctx); cold = time.time() - t0
    runs = []
    for _ in range(2):
        t0 = time.time(); run(ctx); runs.append(round(time.time() - t0, 2))
    print(json.dumps({"cpus": cpus, "n_docs": n, "mode": mode,
                      "build": round(built, 2), "cold": round(cold, 2),
                      "runs": runs}))
spark.stop()
