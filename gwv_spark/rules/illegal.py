"""illegal — per-line schema validation + whole-record alias/blank shape
checks (illegal.py:333-365 and helpers 92-331).

Per line (dispatch on parsed stroke type, illegal.py:338-348):
  99-line: column count must be 8 or 11 → "4"
  0-line:  exact meta forms / transform forms (7 cols) / len 4 or 7 →
           "4"/"5"/"6"
  stroke:  unknown type → "0"; arity vs datalens{1:7,2:9,3:9,4:9,6:11,
           7:11,9:7} → "1"/"2"/"3"; type 9 → "9"; geometry sanity →
           "10"/"11"/"30"/"31"/"40"/"41"; (stype,head,tail) combo not in
           the 88-entry allowed set (+4 for hikanji) → "6"
Whole record: alias_like (illegal.py:102-138) → "7" when not a true
alias; blank_like (92-99) → "8" unless gdata == '0:-1:-1:-1'.

Line-error params serialize as (first-3-columns prefix, line)
(illegal.py:357-363).  Everything is Catalyst-native; the whole-record
checks fold over the spans array without exploding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gwv_spark.rules import RuleContext, rule, shape, tag_line, tag_s

# kage-editor stroke-shape combinations (illegal.py:141-231)
KEIJO_KUMIAWASE = [
    (1, 0, 0), (1, 0, 2), (1, 0, 32), (1, 0, 13), (1, 0, 23), (1, 0, 4),
    (1, 0, 313), (1, 0, 413), (1, 0, 24), (1, 2, 0), (1, 2, 2), (1, 32, 0),
    (1, 32, 32), (1, 32, 13), (1, 32, 23), (1, 32, 4), (1, 32, 313),
    (1, 32, 413), (1, 32, 24), (1, 12, 0), (1, 12, 32), (1, 12, 13),
    (1, 12, 23), (1, 12, 313), (1, 12, 413), (1, 12, 24), (1, 22, 0),
    (1, 22, 32), (1, 22, 13), (1, 22, 23), (1, 22, 4), (1, 22, 313),
    (1, 22, 413), (1, 22, 24), (2, 0, 7), (2, 0, 5), (2, 32, 7), (2, 32, 4),
    (2, 32, 5), (2, 12, 7), (2, 22, 7), (2, 22, 4), (2, 22, 5), (2, 7, 0),
    (2, 7, 8), (2, 7, 4), (2, 27, 0), (3, 0, 0), (3, 0, 5), (3, 0, 32),
    (3, 32, 0), (3, 32, 5), (3, 32, 32), (3, 12, 0), (3, 12, 5), (3, 12, 32),
    (3, 22, 0), (3, 22, 5), (3, 22, 32), (4, 0, 0), (4, 0, 5), (4, 22, 0),
    (4, 22, 5), (6, 0, 7), (6, 0, 5), (6, 32, 7), (6, 32, 4), (6, 32, 5),
    (6, 12, 7), (6, 22, 7), (6, 22, 4), (6, 22, 5), (6, 7, 0), (6, 7, 8),
    (6, 7, 4), (6, 27, 0), (7, 0, 7), (7, 32, 7), (7, 12, 7), (7, 22, 7),
    (0, 0, 0), (0, -1, -1), (0, 99, 1), (0, 99, 2), (0, 99, 3), (0, 98, 0),
    (0, 97, 0), (9, 0, 0),
]
HIKANJI_EXTRA = [(2, 32, 0), (6, 32, 0), (2, 32, 8), (6, 32, 8)]

_COMBO = [f"{a},{b},{c}" for a, b, c in KEIJO_KUMIAWASE]
_COMBO_HIKANJI = _COMBO + [f"{a},{b},{c}" for a, b, c in HIKANJI_EXTRA]


def _yoko(x0, y0, x1, y1) -> Column:
    dx = x1 - x0
    dy = y1 - y0
    return ((y0 == y1) & (x0 != x1)) | ((-dx < dy) & (dy < dx))


def _expected_len(st: Column) -> Column:
    return (
        F.when(st == 1, 7)
        .when(st.isin(2, 3, 4), 9)
        .when(st.isin(6, 7), 11)
        .when(st == 9, 7)
    )


def _line_errcode(is_hikanji: Column) -> Column:
    d = F.col("d")
    dn = F.size(d)
    st = F.get(d, 0)

    # ---- 99-line (illegal.py:244-248)
    e99 = F.when(~dn.isin(8, 11), F.lit("4"))

    # ---- 0-line (illegal.py:251-263)
    pair12 = F.concat_ws(",", F.get(d, 1).cast("string"), F.get(d, 2).cast("string"))
    exact_ok = ((dn == 4) & (pair12 == "0,0") & (F.get(d, 3) == 0)) | (
        (dn == 4) & (pair12 == "-1,-1") & (F.get(d, 3) == -1)
    )
    transform_form = F.get(d, 1).isNotNull() & F.get(d, 2).isNotNull() & pair12.isin(
        "99,1", "99,2", "99,3", "98,0", "97,0"
    )
    e0 = F.when(exact_ok, F.lit(None).cast("string")).otherwise(
        F.when(transform_form, F.when(dn != 7, F.lit("4")))
        .when(~dn.isin(4, 7), F.lit("4"))
        .when(pair12.isin("0,0", "-1,-1") & F.get(d, 1).isNotNull() & F.get(d, 2).isNotNull(), F.lit("5"))
        .otherwise(F.lit("6"))
    )

    # ---- stroke line (illegal.py:266-322)
    st_eff = F.when(is_hikanji & (st >= 0), st % 100).otherwise(st)
    exp = _expected_len(st_eff)
    extras = F.slice(d, exp + 1, F.greatest(dn - exp, F.lit(0)))
    extras_nonzero = F.exists(extras, lambda x: x.isNull() | (x != 0))
    s0 = F.when(is_hikanji & (F.get(d, 1) >= 0), F.get(d, 1) % 100).otherwise(F.get(d, 1))
    s1 = F.when(is_hikanji & (F.get(d, 2) >= 0), F.get(d, 2) % 100).otherwise(F.get(d, 2))
    combo = F.concat_ws(",", st_eff.cast("string"), s0.cast("string"), s1.cast("string"))
    combo_bad = F.when(is_hikanji, ~combo.isin(_COMBO_HIKANJI)).otherwise(
        ~combo.isin(_COMBO)
    )

    n_pairs = F.floor((dn - 3) / 2).cast("int")
    pairs_ok = F.when(n_pairs <= 0, F.lit(True)).otherwise(
        F.forall(
            F.sequence(F.lit(0), F.greatest(n_pairs - 1, F.lit(0))),
            lambda i: F.get(d, 3 + i * 2).isNotNull() & F.get(d, 4 + i * 2).isNotNull(),
        )
    )
    x0, y0, x1, y1, x2 = F.get(d, 3), F.get(d, 4), F.get(d, 5), F.get(d, 6), F.get(d, 7)
    geo = F.when(
        pairs_ok,
        F.when(
            st_eff == 1,
            F.when(
                _yoko(x0, y0, x1, y1),
                F.when(
                    s0.isin(12, 22, 32) | s1.isin(32, 13, 23, 24, 313, 413),
                    F.lit("10"),
                ),
            ).otherwise(F.when((s0 == 2) | (s1 == 2), F.lit("11"))),
        )
        .when(
            st_eff == 3,
            F.when(_yoko(x0, y0, x1, y1), F.lit("30")).when(
                (s1 == 5) & (x1 == F.get(d, 7)), F.lit("31")
            ),
        )
        .when(
            st_eff == 4,
            F.when(_yoko(x0, y0, x1, y1), F.lit("40")).when(
                (s1 == 5) & (x1 >= F.get(d, 7)), F.lit("41")
            ),
        ),
    )
    estroke = (
        F.when(st.isNull(), F.lit("0"))
        .when(~st_eff.isin(1, 2, 3, 4, 6, 7, 9), F.lit("0"))
        .when(dn < exp, F.lit("1"))
        .when(dn > exp, F.when(extras_nonzero, F.lit("2")).otherwise(F.lit("3")))
        .when(st_eff == 9, F.lit("9"))
        .when(F.get(d, 1).isNull() | F.get(d, 2).isNull(), F.lit("6"))
        .when(geo.isNotNull(), geo)
        .when(combo_bad, F.lit("6"))
    )

    return F.when(st == 99, e99).when(st == 0, e0).otherwise(estroke)


def _span_alias_class(d: Column) -> Column:
    """'F' fail / 'P' pass / 'Q' no-effect 200x200 quote
    (is_alias_like, illegal.py:102-138) — over the shared parsed int
    array, no re-parse."""
    dn = F.size(d)
    st = F.get(d, 0)
    coords_200 = (
        (dn >= 7)
        & (F.get(d, 3) == 0) & (F.get(d, 4) == 0) & (F.get(d, 5) == 200) & (F.get(d, 6) == 200)
    )
    sx, sy = F.get(d, 1), F.get(d, 2)
    adj = sx > 100
    sx_adj = F.when(adj, sx - 200).otherwise(sx)
    sx2 = F.when(adj, F.get(d, 9)).otherwise(F.lit(0))
    sy2 = F.when(adj, F.get(d, 10)).otherwise(F.lit(0))
    stretch_ok = (
        coords_200
        & sx.isNotNull()
        & sy.isNotNull()
        & F.when(adj, (dn >= 11) & F.get(d, 9).isNotNull() & F.get(d, 10).isNotNull()).otherwise(F.lit(True))
        & (((sx_adj == 0) & (sy == 0)) | ((sx_adj == sx2) & (sy == sy2)))
    )
    return (
        F.when(st.isNull() | (st < 0), F.lit("F"))
        .when(
            st == 0,
            F.when((dn >= 3) & F.get(d, 1).isin(97, 98, 99), F.lit("F")).otherwise(F.lit("P")),
        )
        .when(st == 99, F.when(stretch_ok, F.lit("Q")).otherwise(F.lit("F")))
        .when(st % 100 == 9, F.lit("P"))
        .otherwise(F.lit("F"))
    )


def _span_blank_ok(d: Column) -> Column:
    st = F.get(d, 0)
    return ~(
        st.isNull() | (st < 0) | (st == 99) | (st % 100).isin(1, 2, 3, 4, 6, 7)
    )


@rule("illegal")
def illegal(ctx: RuleContext) -> DataFrame:
    # ---- per-line codes
    sp = (
        ctx.spans.where(F.col("category") != "user-owned")
        .withColumn("errcode_", _line_errcode(F.col("is_hikanji")))
        .where(F.col("errcode_").isNotNull())
    )  # 'd' = shared parsed int columns (derive.exploded_spans)
    prefix3 = F.array_join(F.slice(F.split(F.col("text"), ":", -1), 1, 3), ":")
    line_v = shape(
        sp,
        "illegal",
        F.col("errcode_"),
        F.array(tag_s(prefix3), tag_line(F.col("offset"), F.col("text"))),
        F.concat(prefix3, F.lit("#"), F.col("doc_id"), F.lit("#"), F.lpad(F.col("offset").cast("string"), 6, "0")),
    )

    # ---- whole-record codes: a narrow higher-order-function pass over
    # docs.spans — per-doc reductions need NO shuffle (the earlier
    # groupBy(doc_id) over exploded spans re-shuffled the whole corpus
    # just to regroup rows that were already co-located per document).
    #
    # Expression-sharing note: a Column referenced N times is inlined N
    # times (CollapseProject + predicate pushdown collapse intermediate
    # Projects, and the optimizer does not CSE across HOF boundaries), so
    # the earlier exists/filter/forall formulation re-ran the full
    # int_data parse 3x per span and the class twice.  Here every shared
    # value is bound ONCE as a lambda variable of a higher-order
    # function, which is a structural guarantee of single evaluation:
    #   parse   — the STORED per-span int arrays (docs.spans_d,
    #             derive.prepare) — zero parse work at rule time
    #   class   — struct fields of the flags transform (once per span)
    #   fold    — ONE aggregate() producing (any_f, n_q, all_blank)
    #   verdict — transform over a 1-element array as a let-binding, so
    #             the fold result is a lambda variable, evaluated once
    # The two record codes come out of one explode — one pass per doc,
    # no .where branches for pushdown to duplicate into.
    fl = F.transform(
        F.col("spans_d"),
        lambda dd: F.struct(
            _span_alias_class(dd).alias("cls"), _span_blank_ok(dd).alias("bok")
        ),
    )
    folded = F.aggregate(
        fl,
        F.struct(
            F.lit(False).alias("any_f"),
            F.lit(0).alias("n_q"),
            F.lit(True).alias("all_blank"),
        ),
        lambda a, f: F.struct(
            (a["any_f"] | (f["cls"] == F.lit("F"))).alias("any_f"),
            (a["n_q"] + (f["cls"] == F.lit("Q")).cast("int")).alias("n_q"),
            (a["all_blank"] & f["bok"]).alias("all_blank"),
        ),
    )
    exact_blank = (F.col("n_spans") == 1) & (
        F.element_at(F.col("spans"), 1)["text"] == "0:-1:-1:-1"
    )
    codes = F.flatten(
        F.transform(
            F.array(folded),  # let-bind the fold result
            lambda t: F.array_compact(
                F.array(
                    F.when(
                        (~F.col("is_alias")) & (~t["any_f"]) & (t["n_q"] == 1),
                        F.lit("7"),
                    ),
                    F.when(t["all_blank"] & ~exact_blank, F.lit("8")),
                )
            ),
        )
    )
    rec_v = (
        ctx.docs.where(F.col("category") != "user-owned")
        .select("doc_id", F.explode(codes).alias("ec"))
    )
    record_v = shape(rec_v, "illegal", F.col("ec"), F.array().cast("array<string>"))
    return line_v.unionByName(record_v)
