"""ucsalias — alias-shape rules for UCS glyphs (ucsalias.py:53-98).

Gate: is_alias AND category ∈ {ucs-kanji, ucs-hikanji}.  entity is the
*raw* alias target string (no deref).  Codes:

  suffixed names:
    "10"/"20"  uxxxx-var/itaiji-NNN aliasing uxxxx's raw entity
    "1"        uxxxx-<region> aliasing uxxxx itself (no params)
  bare uxxxx:
    "0"        alias of non-UCS / IDS target (unless 'undefined')
    "11"/"21"  alias of its own -var-NNN / -itaiji-NNN
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gwv_spark.derive import RE_UCS
from gwv_spark.rules import RuleContext, rule, shape, tag_s
from gwv_spark.rules.order import RE_REGIONS

_RE_TAIL_VAR_ITAIJI = r"^-(var|itaiji)-[0-9]{3}$"
_RE_SOURCES_FULL = "^-" + RE_REGIONS + "$"
_RE_UCS_PREFIX = r"^u[0-9a-f]+(-|$)"
_RE_IDS_PREFIX = r"^(u2ff[0-9a-f]|u31ef)-"


@rule("ucsalias")
def ucsalias(ctx: RuleContext) -> DataFrame:
    docs = ctx.docs.where(
        F.col("is_alias") & F.col("category").isin("ucs-kanji", "ucs-hikanji")
    ).select(
        "doc_id",
        F.col("entity_ref").alias("entity"),
        F.regexp_extract(F.col("doc_id"), RE_UCS, 1).alias("cp_hex"),
    )
    docs = docs.withColumn("nomark", F.concat(F.lit("u"), F.col("cp_hex"))).withColumn(
        "tail", F.expr("substring(doc_id, length(nomark) + 1)")
    )
    # nomark lookup: raw entity + existence (dump.get_entity_name)
    nomark_side = ctx.docs.select(
        F.col("doc_id").alias("nomark"),
        F.col("raw_entity").alias("nomark_entity"),
    )
    d = docs.join(nomark_side, "nomark", "left")

    tail_vi = F.regexp_extract(F.col("tail"), _RE_TAIL_VAR_ITAIJI, 1)
    has_tail = F.col("tail") != ""
    nomark_exists = F.col("nomark_entity").isNotNull()

    # suffixed branch
    suffixed_code = (
        F.when(
            tail_vi != "",
            F.when(
                nomark_exists & (F.col("entity") == F.col("nomark_entity")),
                F.when(tail_vi == "var", F.lit("10")).otherwise(F.lit("20")),
            ),
        )
        .when(
            F.col("tail").rlike(_RE_SOURCES_FULL),
            F.when(F.col("entity") == F.col("nomark"), F.lit("1")),
        )
    )
    # bare-uxxxx branch
    entity_tail_vi = F.when(
        F.col("entity").startswith(F.concat(F.col("nomark"), F.lit("-"))),
        F.regexp_extract(
            F.expr("substring(entity, length(nomark) + 1)"), _RE_TAIL_VAR_ITAIJI, 1
        ),
    ).otherwise(F.lit(""))
    bare_code = F.when(
        (~F.col("entity").rlike(_RE_UCS_PREFIX)) | F.col("entity").rlike(_RE_IDS_PREFIX),
        F.when(F.col("entity") != "undefined", F.lit("0")),
    ).when(
        entity_tail_vi != "",
        F.when(entity_tail_vi == "var", F.lit("11")).otherwise(F.lit("21")),
    )
    d = d.withColumn(
        "errcode", F.when(has_tail, suffixed_code).otherwise(bare_code)
    ).where(F.col("errcode").isNotNull())
    detail = F.when(F.col("errcode") == "1", F.array().cast("array<string>")).otherwise(
        F.array(tag_s(F.col("entity")))
    )
    return shape(d, "ucsalias", F.col("errcode"), detail)
