"""Where does the fused suite's serial time go?

Usage: python tools/diag_union.py <cpus> <n_docs> [aqe 0/1]
Times: union plan build+explain; exec of the SAME DataFrame x3;
fresh-build exec x2.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cpus = int(sys.argv[1])
n = int(sys.argv[2])
aqe = sys.argv[3] if len(sys.argv) > 3 else "1"
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

from gwv_spark.session import get_spark  # noqa: E402
from gwv_spark import engine  # noqa: E402
from gwv_spark.corpus import spark_generate  # noqa: E402

spark = get_spark(
    f"union-{cpus}-{aqe}",
    cpus=cpus,
    shuffle_partitions=cpus,
    extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.adaptive.enabled": "true" if aqe == "1" else "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark_generate(spark, n, partitions=max(cpus * 4, 16)).select("doc_id", "spans")
ctx = engine.make_context(spark, docs, cache=True)

t0 = time.time()
df = engine.run_rules(ctx)
with contextlib.redirect_stdout(io.StringIO()):
    df.explain("formatted")
plan_s = round(time.time() - t0, 2)

execs = []
for _ in range(3):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    execs.append(round(time.time() - t0, 2))

fresh = []
for _ in range(2):
    t0 = time.time()
    engine.run_suite(ctx)
    fresh.append(round(time.time() - t0, 2))

print(json.dumps({"cpus": cpus, "n_docs": n, "aqe": aqe, "plan_s": plan_s,
                  "same_df_execs": execs, "fresh_execs": fresh}))
spark.stop()
