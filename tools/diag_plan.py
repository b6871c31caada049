"""Split rule runtime into driver planning vs execution.

Usage: python tools/diag_plan.py <cpus> [extra_conf_json] [n_docs]
For each rule: time to build+explain (analysis/opt/physical planning,
no execution), then 2 noop executions of the SAME DataFrame object,
then 1 noop of a freshly rebuilt DataFrame.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cpus = int(sys.argv[1])
extra = json.loads(sys.argv[2]) if len(sys.argv) > 2 else {}
n = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
extra.setdefault("spark.ui.showConsoleProgress", "false")

from gwv_spark.session import get_spark  # noqa: E402
from gwv_spark import engine  # noqa: E402
from gwv_spark.corpus import spark_generate  # noqa: E402
from gwv_spark.rules import ALL_RULE_IDS, RULES, load_all_rules  # noqa: E402

spark = get_spark(f"plan-{cpus}", cpus=cpus, shuffle_partitions=cpus, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
docs = spark_generate(spark, n, partitions=max(cpus * 2, 16)).select("doc_id", "spans")
ctx = engine.make_context(spark, docs, cache=True)
load_all_rules()

import io
import contextlib


def noop(df):
    df.write.format("noop").mode("overwrite").save()


print(f"{'rule':12s} {'plan':>6s} {'exec1':>7s} {'exec2':>7s} {'fresh':>7s}")
tot = [0.0] * 4
for rid in ALL_RULE_IDS:
    t0 = time.time()
    df = RULES[rid](ctx)
    with contextlib.redirect_stdout(io.StringIO()):
        df.explain("formatted")
    plan_s = time.time() - t0
    t0 = time.time(); noop(df); e1 = time.time() - t0
    t0 = time.time(); noop(df); e2 = time.time() - t0
    t0 = time.time(); noop(RULES[rid](ctx)); fr = time.time() - t0
    for i, v in enumerate((plan_s, e1, e2, fr)):
        tot[i] += v
    print(f"{rid:12s} {plan_s:6.2f} {e1:7.2f} {e2:7.2f} {fr:7.2f}", flush=True)
print(f"{'TOTAL':12s} {tot[0]:6.2f} {tot[1]:7.2f} {tot[2]:7.2f} {tot[3]:7.2f}")
spark.stop()
