"""Isolate one rule at one parallelism level / join strategy.

Usage: python tools/diag_j.py <cpus> <rule> [extra_conf_json] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cpus = int(sys.argv[1])
rid = sys.argv[2]
extra = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}
n = int(sys.argv[4]) if len(sys.argv) > 4 else 500_000
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
extra.setdefault("spark.ui.showConsoleProgress", "false")

from gwv_spark.session import get_spark  # noqa: E402
from gwv_spark import engine  # noqa: E402
from gwv_spark.corpus import spark_generate  # noqa: E402
from gwv_spark.rules import RULES, load_all_rules  # noqa: E402

spark = get_spark(f"diagj-{cpus}", cpus=cpus, shuffle_partitions=cpus, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
docs = spark_generate(spark, n, partitions=max(cpus * 2, 16)).select("doc_id", "spans")
ctx = engine.make_context(spark, docs, cache=True)
load_all_rules()

times = []
for i in range(3):
    t0 = time.time()
    RULES[rid](ctx).write.format("noop").mode("overwrite").save()
    times.append(round(time.time() - t0, 2))
print(json.dumps({"cpus": cpus, "rule": rid, "times": times}))
spark.stop()
