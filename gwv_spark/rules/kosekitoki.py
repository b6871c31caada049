"""kosekitoki — toki-00XXXXXX must alias koseki-XXXXXX's entity
(kosekitoki.py:34-57).

Two different entity semantics appear here (both join against the
corpus):
- toki's own entity: existence-checked deref (validatorctx.py:32-37);
- koseki's entity: raw deref (dump.py:59-61) but only when the koseki
  doc exists — else the koseki *name* stands in.

Codes: "0" NOT_ALIAS (no params), "1" NOT_ALIAS_OF_KOSEKI(entity),
"2" NOT_ALIAS_OF_ENTITY_OF_KOSEKI(entity, koseki_entity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gwv_spark.rules import RuleContext, rule, shape, tag_s


@rule("kosekitoki")
def kosekitoki(ctx: RuleContext) -> DataFrame:
    num = F.regexp_extract(F.col("doc_id"), r"^toki-([0-9]{8})$", 1)
    toki = (
        ctx.docs.where(F.col("category") == "toki")
        .select("doc_id", "is_alias", "entity", num.alias("num"))
        .where(F.col("num").startswith("00"))
        .withColumn("koseki_name", F.concat(F.lit("koseki-"), F.expr("substring(num, 3)")))
    )
    # The probed key is always 'koseki-' + 6 digits (num is 8 digits
    # with a '00' prefix), so only doc_ids of exactly that shape can
    # match — a static, name-structure-guaranteed prefilter that bounds
    # this side at 10^6 rows REGARDLESS of corpus scale (vs shuffling
    # the whole corpus's (doc_id, raw_entity) projection).
    koseki = ctx.docs.where(F.col("doc_id").rlike(r"^koseki-[0-9]{6}$")).select(
        F.col("doc_id").alias("koseki_name"),
        F.col("raw_entity").alias("koseki_raw_entity"),
    )
    j = toki.join(koseki, "koseki_name", "left").withColumn(
        "koseki_entity", F.coalesce(F.col("koseki_raw_entity"), F.col("koseki_name"))
    )
    bad = j.where(F.col("entity") != F.col("koseki_entity"))
    errcode = (
        F.when(~F.col("is_alias"), F.lit("0"))
        .when(F.col("koseki_entity") == F.col("koseki_name"), F.lit("1"))
        .otherwise(F.lit("2"))
    )
    detail = (
        F.when(~F.col("is_alias"), F.array().cast("array<string>"))
        .when(
            F.col("koseki_entity") == F.col("koseki_name"),
            F.array(tag_s(F.col("entity"))),
        )
        .otherwise(F.array(tag_s(F.col("entity")), tag_s(F.col("koseki_entity"))))
    )
    return shape(bad, "kosekitoki", errcode, detail)
