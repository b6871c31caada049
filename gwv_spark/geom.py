"""Python-side KAGE line views for the geometry UDF rules (dup, corner).

These two rules are the only ones whose semantics — per-document sorted
scans with early exit and an order-dependent mutable connection graph —
are not relationally expressible (SURVEY.md §2 rows 1 and 9), so they run
as Arrow-batched pandas UDFs over the raw ``gdata`` string: the Arrow
transfer is a single string column per doc and the geometry stays
in-process per batch (never per-row Python through the serializer).

Semantics mirrored from the reference:
- int parsing: ``kageIntSuppressError`` (kagedata.py:37-42) — ``int(s)``,
  ``''``/whitespace → 0, invalid → None;
- line columns: col 7 of a type-99 line is the part name, not an int
  (kagedata.py:70-78);
- ``coords`` (kagedata.py:100-110): pairs ``(data[3::2], data[4::2])``
  for strokes, ``data[3..6]`` for part lines; None if any member is None.
  Where the reference would raise IndexError on a truncated type-99 line
  (kagedata.py:103-106 indexes data[3..6] directly) we return None
  instead — that path crashes the reference validator outright
  (validator.py:48-55 re-raises), so no parity case reaches it.
"""

from __future__ import annotations


def parse_int(s: str) -> int | None:
    """kageIntSuppressError (kagedata.py:20-42)."""
    try:
        return int(s)
    except ValueError:
        return 0 if s.strip() == "" else None


class Line:
    """Minimal KageLine view over one raw ``a:b:c`` line."""

    __slots__ = ("offset", "text", "vals", "part_name")

    def __init__(self, offset: int, text: str):
        self.offset = offset
        self.text = text
        cols = text.split(":")
        vals = [parse_int(c) for c in cols]
        self.part_name: str | None = None
        if vals and vals[0] == 99 and len(cols) >= 8:
            vals[7] = None
            self.part_name = cols[7]
        self.vals = vals

    @property
    def stroke_type(self) -> int | None:
        return self.vals[0] if self.vals else None

    @property
    def head_type(self) -> int | None:
        return self.vals[1] if len(self.vals) > 1 else None

    @property
    def tail_type(self) -> int | None:
        return self.vals[2] if len(self.vals) > 2 else None

    def coords(self) -> list[tuple[int, int]] | None:
        v = self.vals
        if self.stroke_type == 99:
            if len(v) < 7:
                return None
            pts = [(v[3], v[4]), (v[5], v[6])]
        else:
            pts = list(zip(v[3::2], v[4::2]))
        if any(x is None or y is None for x, y in pts):
            return None
        return pts

    def ref(self) -> str:
        """Detail encoding of a KageLine param: the reference serializes it
        as (line_number, strdata) (validators/__init__.py:57-60)."""
        return f"L{self.offset}:{self.text}"


def parse_gdata(gdata: str) -> list[Line]:
    """gdata → ordered Line views (KageData, kagedata.py:45-49)."""
    return [Line(i, t) for i, t in enumerate(gdata.split("$"))]
