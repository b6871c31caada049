"""numexp — raw-text canonicality of every line (numexp.py:40-63).

Per line, first match wins (the reference `continue`s / `break`s):
  "0" BLANK_LINE                       line == ''
  "1" INVALID_CHAR                     any char outside [0-9a-z_:@-]
  "2" NOT_AN_INT                       first offending column not int()-able
  "3" NONNORMALIZED_NUMBER_EXPRESSION  first offending column has
                                       str(int(col)) != col
Column 7 is skipped when column 0 is literally '99' (numexp.py:51-52).
Param: the (line_number, raw text) pair.

Fully Catalyst-native: split + transform + filter array expressions; no
gates (the rule sees every record).  Scales as a narrow map over the
corpus — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gwv_spark.parse import _PY_INT_RE
from gwv_spark.rules import RuleContext, rule, shape, tag_line, default_sortkey

_INVALID_CHAR_RE = "[^0-9a-z_:@-]"

# A line made entirely of canonical ints (0 | -?[1-9]\d*) separated by
# ':' can violate nothing — one anchored regex rejects the overwhelming
# majority of lines before the per-column scan below runs.  Lines with a
# part name (letters), non-canonical ints, bad chars, or blanks all fail
# this and take the exact per-column path.
_CANONICAL_LINE_RE = r"^(0|-?[1-9][0-9]*)(:(0|-?[1-9][0-9]*))*$"


def classify(spans_df: DataFrame) -> DataFrame:
    """Flat per-line classification: (doc_id, offset, line_text, errcode)
    for offending lines only."""
    spans_df = spans_df.where(~F.col("text").rlike(_CANONICAL_LINE_RE))
    cols = F.split(F.col("text"), ":", -1)

    # Per-column violation class: 0 ok / 1 non-canonical / 2 not-an-int,
    # with the type-99 column-7 skip.  int() accepts whitespace padding,
    # but any whitespace was already caught by INVALID_CHAR at line level.
    def col_class(c, j):
        return (
            F.when((j == 7) & (F.get(cols, 0) == "99"), F.lit(0))
            .when(~c.rlike(_PY_INT_RE), F.lit(2))
            .when(
                F.regexp_replace(c, "_", "").cast("long").cast("string") != c,
                F.lit(1),
            )
            .otherwise(F.lit(0))
        )

    classed = F.transform(cols, lambda c, j: F.struct(col_class(c, j).alias("c")))
    first_bad = F.get(F.filter(classed, lambda s: s["c"] > 0), 0)["c"]

    errcode = (
        F.when(F.col("text") == "", F.lit("0"))
        .when(F.col("text").rlike(_INVALID_CHAR_RE), F.lit("1"))
        .when(first_bad == 2, F.lit("2"))
        .when(first_bad == 1, F.lit("3"))
    )

    return (
        spans_df.withColumn("errcode", errcode)
        .where(F.col("errcode").isNotNull())
        .select("doc_id", "offset", F.col("text").alias("line_text"), "errcode")
    )


@rule("numexp")
def numexp(ctx: RuleContext) -> DataFrame:
    out = classify(ctx.spans)
    return shape(
        out,
        "numexp",
        F.col("errcode"),
        F.array(tag_line(F.col("offset"), F.col("line_text"))),
        default_sortkey(F.col("doc_id"), F.col("offset")),
    )
