"""One-off diagnosis of the slow native rules (kosekitoki, j, width)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from gwv_spark.session import get_spark
from gwv_spark import engine
from gwv_spark.corpus import spark_generate
from gwv_spark.rules import RULES, load_all_rules, entity_checked

spark = get_spark("diag", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark_generate(spark, 500_000, partitions=64).select("doc_id", "spans")
ctx = engine.make_context(spark, docs, cache=True)
load_all_rules()


def t(label, df):
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)


t("docs.scan", ctx.docs.select("doc_id"))
t("docs.scan_all", ctx.docs)
t("spans.scan", ctx.spans.select("doc_id"))

# kosekitoki pieces
num = F.regexp_extract(F.col("doc_id"), r"^toki-([0-9]{8})$", 1)
toki = (
    ctx.docs.where(F.col("category") == "toki")
    .select("doc_id", "is_alias", "entity_ref", num.alias("num"))
    .where(F.col("num").startswith("00"))
    .withColumn("koseki_name", F.concat(F.lit("koseki-"), F.expr("substring(num, 3)")))
)
t("ktk.toki_filter", toki)
toki_e = entity_checked(ctx, toki, "entity")
t("ktk.entity_checked", toki_e)
koseki = ctx.docs.select(
    F.col("doc_id").alias("koseki_name"),
    F.coalesce(F.col("entity_ref"), F.col("doc_id")).alias("koseki_raw_entity"),
)
j = toki_e.join(koseki, "koseki_name", "left")
t("ktk.join_koseki", j)
t("ktk.full", RULES["kosekitoki"](ctx))
RULES["kosekitoki"](ctx).explain("formatted")
spark.stop()
