"""mustrenew — versioned part quotes, keyed BY PART (mustrenew.py:30-61).

For every 99-line quote 'base@version' from a non-alias, non-user-owned
doc: group quoters by the full versioned name; classify the part by
whether the quoted base's *current* gdata itself contains '@' (is_old).
Output rows: [part_name, *sorted(quoter doc_ids)] under code "@" when
is_old else "0".  Both codes always appear in the report, even empty
(handled by engine.result_json's always-present map).

This is the one genuinely global shuffle aggregation of the rule suite:
explode → join on base → groupBy(part_full) with sort_array(collect_set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gwv_spark import parse
from gwv_spark.rules import RuleContext, rule, shape, tag_s


@rule("mustrenew")
def mustrenew(ctx: RuleContext) -> DataFrame:
    quotes = (
        ctx.spans.where(
            (~F.col("is_alias"))
            & (F.col("category") != "user-owned")
            & (F.col("kind") == "part")
        )
        .select(
            "doc_id",
            F.col("part_full"),  # shared parsed column (derive.exploded_spans)
            F.col("media_ref").alias("part_base"),
        )
        .where(F.col("part_full").contains("@"))
    )
    old_bases = ctx.docs.select(
        F.col("doc_id").alias("part_base"),
        F.col("gdata").contains("@").alias("base_is_old"),
    )
    j = quotes.join(old_bases, "part_base", "left").withColumn(
        "is_old", F.coalesce(F.col("base_is_old"), F.lit(False))
    )
    grouped = j.groupBy("part_full").agg(
        F.max(F.col("is_old")).alias("is_old"),
        F.sort_array(F.collect_set(F.col("doc_id"))).alias("quoters"),
    )
    # reference rows are keyed by the part name, quoters as params
    out = grouped.select(
        F.col("part_full").alias("doc_id"),
        F.when(F.col("is_old"), F.lit("@")).otherwise(F.lit("0")).alias("errcode_"),
        F.transform(F.col("quoters"), lambda q: tag_s(q)).alias("detail_"),
    )
    return shape(out, "mustrenew", F.col("errcode_"), F.col("detail_"))
