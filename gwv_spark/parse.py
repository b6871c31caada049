"""Catalyst-native expression builders for the KAGE line grammar.

The reference parses every record in interpreted Python
(kagedata.py:20-110 in /root/reference).  Here the same semantics are
expressed as Spark Column expressions so the whole parse stays inside
whole-stage codegen — no Python in the hot path.

Semantics reproduced (cited against the reference):

- ``kageInt`` (kagedata.py:20-34): ``int(s)`` except ``''``/whitespace → 0;
  invalid → error.  The suppressed variant (kagedata.py:37-42) → NULL.
  Python ``int`` accepts an optional sign and underscore digit grouping
  (``'1_0'`` → 10), which the expression mirrors exactly.
- line columns: ``:``-separated; column 7 of a type-99 line is a string
  part name, optionally ``name@version`` (kagedata.py:70-78, 94-98).
- alias detection (kagedata.py:5-17): gdata with no ``$`` equal to
  ``99:0:0:0:0:200:200:<entity>`` where entity has no ``:``.
- has_transform (kagedata.py:51-57): any line with ≥2 columns,
  stroke_type 0 and head_type in (97, 98, 99).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALIAS_PREFIX = "99:0:0:0:0:200:200:"

# Matches exactly the strings CPython's int() accepts after .strip()
# (sign, decimal digits, single underscores between digits).
_PY_INT_RE = r"^[+-]?[0-9](?:_?[0-9])*$"


def kage_int(col: Column) -> Column:
    """kageIntSuppressError as a Column: '' → 0, invalid → NULL (int)."""
    t = F.trim(col)
    return (
        F.when(t == "", F.lit(0))
        .when(t.rlike(_PY_INT_RE), F.regexp_replace(t, "_", "").cast("int"))
        .otherwise(F.lit(None).cast("int"))
    )


def line_cols(text: Column) -> Column:
    """Split one raw line into its ':'-separated string columns."""
    return F.split(text, ":", -1)


def col_at(cols: Column, i: int) -> Column:
    """0-based, null-safe column access."""
    return F.get(cols, i)


def stroke_type(text: Column) -> Column:
    return kage_int(col_at(line_cols(text), 0))


def head_type(text: Column) -> Column:
    return kage_int(col_at(line_cols(text), 1))


def tail_type(text: Column) -> Column:
    return kage_int(col_at(line_cols(text), 2))


def int_data(text: Column) -> Column:
    """All columns parsed with kageInt semantics → ARRAY<INT> (NULL slots
    for unparsable columns; column 7 of a 99-line is forced NULL, matching
    kagedata.py:70-76)."""
    cols = line_cols(text)
    parsed = F.transform(cols, lambda c: kage_int(c))
    return F.when(
        kage_int(col_at(cols, 0)) == 99,
        F.transform(parsed, lambda c, i: F.when(i == 7, F.lit(None).cast("int")).otherwise(c)),
    ).otherwise(parsed)


def part_name_full(text: Column) -> Column:
    """Column 7 of a 99-line (may include '@version'); NULL otherwise or
    when the line has <8 columns (kagedata.py:77-78)."""
    cols = line_cols(text)
    return F.when(
        (kage_int(col_at(cols, 0)) == 99) & (F.size(cols) >= 8), F.get(cols, 7)
    ).otherwise(F.lit(None).cast("string"))


def part_base(name: Column) -> Column:
    """Strip an '@version' suffix from a part reference (delquote.py:26)."""
    return F.get(F.split(name, "@", -1), 0)


def span_kind(text: Column) -> Column:
    """'part' | 'meta' | 'stroke' from stroke_type (FIXTURES.md §1)."""
    st = stroke_type(text)
    return (
        F.when(st == 99, F.lit("part"))
        .when(st == 0, F.lit("meta"))
        .otherwise(F.lit("stroke"))
    )


def gdata_to_spans(gdata: Column) -> Column:
    """gdata string → ARRAY<STRUCT<kind, text, media_ref, offset>>.

    One span per '$'-separated line, in order (kagedata.py:45-49);
    media_ref = part base name for kind='part' else NULL.
    """
    lines = F.split(gdata, r"\$", -1)
    return F.transform(
        lines,
        lambda t, i: F.struct(
            span_kind(t).alias("kind"),
            t.alias("text"),
            part_base(part_name_full(t)).alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def spans_to_gdata(spans: Column) -> Column:
    """Inverse of gdata_to_spans (exact: span.text keeps the raw line)."""
    return F.array_join(F.transform(spans, lambda s: s["text"]), "$", null_replacement="")


def entity_ref(gdata: Column) -> Column:
    """Alias target name, NULL if the record is not an alias
    (get_entity_name, kagedata.py:9-17)."""
    rest = F.substring(gdata, len(ALIAS_PREFIX) + 1, 1 << 30)
    return F.when(
        (~gdata.contains("$"))
        & gdata.startswith(ALIAS_PREFIX)
        & (~rest.contains(":")),
        rest,
    ).otherwise(F.lit(None).cast("string"))


def has_transform(spans: Column) -> Column:
    """True iff any meta line 0:97/98/99:... is present (kagedata.py:51-57).

    The per-line predicate is coalesced to FALSE: an unparsable stroke
    type makes ``kage_int(...) == 0`` NULL, and under SQL three-valued
    logic a NULL element turns the whole ``exists`` NULL — which a
    ``~has_transform`` gate then silently drops.  The reference's
    ``None == 0`` is plain False (kagedata.py:51-57)."""
    def _line_is_transform(s: Column) -> Column:
        cols = line_cols(s["text"])
        return F.coalesce(
            (F.size(cols) >= 2)
            & (kage_int(col_at(cols, 0)) == 0)
            & kage_int(col_at(cols, 1)).isin(97, 98, 99),
            F.lit(False),
        )

    return F.exists(spans, _line_is_transform)
