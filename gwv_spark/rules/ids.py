"""ids — IDC structure in the *name* vs the entity's first part
(ids.py:101-197).

Gate: category = ids.  Works on the existence-checked entity's spans
(ids.py:104, via validatorctx.entity).  Per IDC class of the first name
token, checks the first part's henka suffix code, the aspect ratio of
its placement box (thresholds 1.8 / 0.65), and that the IDS's first
kanji is quoted by span 0.  Codes 1/2/3/6/10/12/13/15/22/23/33/90.

Replicates the reference's quirks: the 'u2ffe, u2fff' tuple typo makes
those IDCs fall through to UNKNOWN_IDC (ids.py:192), and the suffix
regex uses a lookahead (ids.py:83).

Shape: self join on entity + array expressions over the entity's spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gwv_spark import parse
from gwv_spark.rules import RuleContext, rule, shape, tag_line, tag_s
from gwv_spark.rules.order import RE_REGIONS

_RE_VARS_LOOKAHEAD = "-" + RE_REGIONS + r"?([0-9]{2})(?:-(?:var|itaiji)-[0-9]{3})?(?=@|$)"
_RE_IDC_FULL = r"^(u2ff[0-9a-f]|u31ef)$"

_LR = ("u2ff0", "u2ff2")
_TB = ("u2ff1", "u2ff3")
_SURROUND = ("u2ff4", "u2ff5", "u2ff6", "u2ff7", "u2ff8", "u2ff9", "u2ffa", "u2ffc", "u2ffd")


@rule("ids")
def ids(ctx: RuleContext) -> DataFrame:
    d0 = ctx.docs.where(F.col("category") == "ids").select(
        "doc_id", "entity", "is_alias", "spans", "spans_d"
    )
    # existence-checked entity spans (validatorctx.py:32-37): the
    # precomputed ``entity`` column falls back to the doc itself, so a
    # doc with entity == doc_id already CARRIES its entity spans — no
    # join, no shuffle.  Only alias docs (entity != doc_id, a small
    # minority of the ids category) fetch the target's spans via the
    # equi join; that branch's left side is tiny, so AQE broadcasts it
    # and the full-corpus right side never shuffles.
    self_d = (
        d0.where(F.col("entity") == F.col("doc_id"))
        .withColumn("espans", F.col("spans"))
        .withColumn("espans_d", F.col("spans_d"))
    )
    ent_spans = ctx.docs.select(
        F.col("doc_id").alias("entity"),
        F.col("spans").alias("__ent_spans"),
        F.col("spans_d").alias("__ent_spans_d"),
    )
    # explicit broadcast of the alias side: left to AQE, both SMJ inputs
    # materialize their shuffles before the runtime conversion decision,
    # so the full corpus would still shuffle on entity.  Alias ids docs
    # are a domain-bounded sliver (aliases OF ids expressions); if that
    # ever outgrows broadcast limits, drop the hint and this degrades to
    # the plain co-partitioned SMJ, still correct.
    alias_d = (
        ent_spans.join(
            F.broadcast(d0.where(F.col("entity") != F.col("doc_id"))), "entity"
        )
        .withColumn("espans", F.col("__ent_spans"))
        .withColumn("espans_d", F.col("__ent_spans_d"))
        .drop("__ent_spans", "__ent_spans_d")
    )
    d = self_d.unionByName(alias_d).drop("spans", "spans_d")

    # First-span parse comes from the STORED per-span int arrays
    # (derive.prepare spans_d) materialized as ONE column.  Inlining
    # parse.int_data(first_text) here instead would copy its whole
    # expression tree into each of x1/y1/x2/y2/aspect/dx/dy — measured
    # ~1 s of per-execution optimizer time on this rule alone (the bulk
    # of ids' fixed cost in NOTES_r3), for a value the ingest layer
    # already stores.
    first_text = F.get(F.col("espans"), 0)["text"]
    d = (
        d.withColumn("ft", first_text)
        .withColumn("fd0", F.get(F.col("espans_d"), 0))
        .withColumn("fp", parse.part_name_full(F.col("ft")))
    )
    st0 = F.get(F.col("fd0"), 0)  # stroke type = parsed column 0
    d = d.where((st0 == 99) & (F.size("espans") > 1))
    x1, y1 = F.get(F.col("fd0"), 3), F.get(F.col("fd0"), 4)
    x2, y2 = F.get(F.col("fd0"), 5), F.get(F.col("fd0"), 6)
    d = d.where(x1.isNotNull() & y1.isNotNull() & x2.isNotNull() & y2.isNotNull())
    d = d.where(F.col("fp").isNotNull())  # reference crashes on 7-col 99 lines
    aspect = F.when(y1 == y2, F.lit(float("inf"))).otherwise(
        F.abs((x1 - x2).cast("double") / (y1 - y2))
    )
    d = (
        d.withColumn("aspect", aspect)
        .withColumn("dx", (x2 - x1).cast("double"))
        .withColumn("dy", (y2 - y1).cast("double"))
        .withColumn("sname", F.split(F.col("doc_id"), "-", -1))
        .withColumn("idc", F.col("sname")[0])
        .withColumn("sn1", F.get(F.col("sname"), 1))
        .withColumn("fbt", F.nullif(F.regexp_extract(F.col("fp"), _RE_VARS_LOOKAHEAD, 1), F.lit("")))
    )
    is_complicated = (
        F.col("sn1").isin(*_LR) & F.col("idc").isin(*_TB)
    ) | (F.col("sn1").isin(*_TB) & F.col("idc").isin(*_LR))

    # first kanji token of the IDS name ('cdp' merges with the next token)
    toks = F.filter(
        F.transform(
            F.col("sname"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))
        ),
        lambda s: ~s["t"].rlike(_RE_IDC_FULL),
    )
    d = d.withColumn("first_tok", F.get(toks, 0))  # one filter pass, stored
    first_tok = F.col("first_tok")
    first_kanji = F.when(
        first_tok["t"] == "cdp",
        F.concat(F.lit("cdp-"), F.get(F.col("sname"), first_tok["i"] + 1)),
    ).otherwise(first_tok["t"])
    d = d.withColumn("first_kanji", first_kanji)

    # first entity span quoting first_kanji (ids.py:86-98)
    fk = F.get(
        F.filter(
            F.col("espans"),
            lambda s: (s["kind"] == F.lit("part"))
            & s["media_ref"].isNotNull()
            & F.coalesce(
                parse.part_name_full(s["text"]).startswith(F.col("first_kanji")),
                F.lit(False),
            ),
        ),
        0,
    )
    # one stored struct: fk["offset"]/fk["text"] as separate withColumns
    # would copy the whole filter-lambda tree (part_name_full per span)
    d = d.withColumn("fk", fk)
    d = d.withColumn("fk_off", F.col("fk")["offset"]).withColumn(
        "fk_text", F.col("fk")["text"]
    )
    fk_not_first = F.col("first_kanji").isNotNull() & F.col("fk_off").isNotNull() & (
        F.col("fk_off") != 0
    )

    fbt = F.col("fbt")
    lr_code = (
        F.when(fbt.isin("03", "04", "09", "14", "24") & (F.col("dx") > 175.0), F.lit("1"))
        .when(fbt == "02", F.lit("2"))
        .when(
            (~is_complicated) & (~F.coalesce(fbt.isin("01", "08"), F.lit(False))) & (F.col("aspect") > 1.8),
            F.lit("6"),
        )
        .when(fk_not_first, F.lit("3"))
    )
    tb_code = (
        F.when(fbt.isin("01", "02", "08") & (F.col("dy") > 175.0), F.lit("10"))
        .when(fbt.isin("04", "14", "24"), F.lit("12"))
        .when(
            (~is_complicated) & (~F.coalesce(fbt.isin("03", "09"), F.lit(False))) & (F.col("aspect") < 0.65),
            F.lit("15"),
        )
        .when(fk_not_first, F.lit("13"))
    )
    surround_code = F.when(fbt.isin("02", "06", "07"), F.lit("22")).when(
        fk_not_first, F.lit("23")
    )
    overlap_code = F.when(fk_not_first, F.lit("33"))

    errcode = (
        F.when(F.col("idc").isin(*_LR), lr_code)
        .when(F.col("idc").isin(*_TB), tb_code)
        .when(F.col("idc").isin(*_SURROUND), surround_code)
        .when(F.col("idc") == "u2ffb", overlap_code)
        # 'u2ffe, u2fff' tuple typo in the reference: only u31ef passes
        .when(F.col("idc") == "u31ef", F.lit(None))
        .otherwise(F.lit("90"))
    )
    d = d.withColumn("errcode_", errcode).where(F.col("errcode_").isNotNull())
    detail = (
        F.when(F.col("errcode_").isin("1", "2", "10", "12", "22"), F.array(tag_s(F.col("fp"))))
        .when(
            F.col("errcode_").isin("3", "13", "23", "33"),
            F.array(tag_line(F.col("fk_off"), F.col("fk_text"))),
        )
        .when(F.col("errcode_").isin("6", "15"), F.array(tag_line(F.lit(0), F.col("ft"))))
        .otherwise(F.array(tag_s(F.col("idc"))))
    )
    return shape(d, "ids", F.col("errcode_"), detail)
