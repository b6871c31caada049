"""Codegen/JIT sweep: steady-state shape of the fused suite.

Usage: python tools/diag_codegen.py <cpus> <n_docs> <mode>
modes: base | huge8k | nocodegen
Runs the same suite DataFrame 5x and prints all timings.
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
mode = sys.argv[3]
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

conf = {"spark.ui.showConsoleProgress": "false"}
if mode == "huge8k":
    conf["spark.sql.codegen.hugeMethodLimit"] = "8000"
elif mode == "nocodegen":
    conf["spark.sql.codegen.wholeStage"] = "false"

from gwv_spark.session import get_spark  # noqa: E402
from gwv_spark import engine  # noqa: E402
from gwv_spark.corpus import spark_generate  # noqa: E402

spark = get_spark(f"cg-{mode}-{cpus}", cpus=cpus, shuffle_partitions=cpus,
                  extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")
docs = spark_generate(spark, n, partitions=max(cpus * 4, 16)).select("doc_id", "spans")
ctx = engine.make_context(spark, docs, cache=True)

df = engine.run_rules(ctx)
execs = []
for _ in range(5):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    execs.append(round(time.time() - t0, 2))
print(json.dumps({"cpus": cpus, "n_docs": n, "mode": mode, "execs": execs}))
spark.stop()
