"""Seeded geometry fuzz: random grid-snapped stroke compositions, engine
vs reference on the geometry rules (corner, dup, skew).

Unlike test_fuzz_parity's grammar (which also emits malformed lines),
every line here is full-arity with integer coordinates — the shapes the
reference's corner validator can process without crashing (it IndexErrors
on truncated curve lines, corner.py:215-216).  Endpoints are jittered by
0..±9 around shared anchors so pairs land inside, on the edge of, and
just outside the corner tolerance boxes (corner.py:518-591), and G/T
design names exercise the is_ZH_corner post-pass (corner.py:803-828).
"""

from __future__ import annotations

import random

import pytest

from tests.parity import assert_parity, run_engine, run_reference

GEOM_RULES = ["corner", "dup", "skew"]

_HEADS = [0, 0, 2, 12, 22, 32, 7, 27]
_TAILS = [0, 0, 2, 7, 13, 23, 32, 313, 413, 24, 8, 5]


def _jit(rng, v, mag=9):
    return v + rng.randrange(-mag, mag + 1)


def _stroke_lines(rng: random.Random) -> list[str]:
    """Compose 2-6 strokes around shared grid anchors."""
    ax = sorted(rng.sample(range(20, 190, 10), 3))
    ay = sorted(rng.sample(range(20, 190, 10), 3))
    lines = []
    for _ in range(rng.randrange(2, 7)):
        kind = rng.randrange(10)
        h, t = rng.choice(_HEADS), rng.choice(_TAILS)
        x0, x1 = rng.choice(ax), rng.choice(ax)
        y0, y1 = rng.choice(ay), rng.choice(ay)
        if kind <= 3:  # axis-aligned line between anchors, jittered ends
            if kind % 2 == 0:  # vertical
                lines.append(
                    f"1:{h}:{t}:{_jit(rng, x0, 4)}:{min(y0, y1)}"
                    f":{_jit(rng, x0, 4)}:{max(y0, y1) + 40}"
                )
            else:  # horizontal
                lines.append(
                    f"1:{h}:{t}:{min(x0, x1)}:{_jit(rng, y0, 4)}"
                    f":{max(x0, x1) + 40}:{_jit(rng, y0, 4)}"
                )
        elif kind <= 5:  # exact axis line (snapped — _OK / preemption food)
            if kind == 4:
                lines.append(f"1:{h}:{t}:{x0}:{y0}:{x0}:{y0 + 60}")
            else:
                lines.append(f"1:{h}:{t}:{x0}:{y0}:{x0 + 60}:{y0}")
        elif kind == 6:  # curve (2) — head 12/22/32 becomes a tate segment
            pts = [x0, y0, _jit(rng, x0), _jit(rng, y1), x1, y1]
            lines.append(f"2:{h}:{t}:" + ":".join(map(str, pts)))
        elif kind == 7:  # double curve (6)
            pts = [x0, y0, _jit(rng, x0), y0, x1, _jit(rng, y1), x1, y1]
            lines.append(f"6:{h}:{t}:" + ":".join(map(str, pts)))
        elif kind == 8:  # bend (3) / otsu (4)
            st = rng.choice([3, 4])
            pts = [x0, y0, x0, y1, x1, y1]
            lines.append(f"{st}:{h}:{t}:" + ":".join(map(str, pts)))
        else:  # vertical sweep (7)
            pts = [x0, y0, x0, y1, _jit(rng, x0), y1, x1, y1 + 20]
            lines.append(f"7:{h}:7:" + ":".join(map(str, pts)))
    return lines


def _box_lines(rng: random.Random) -> list[str]:
    """Closed-box compositions (口/日/臼/廿-like): the shapes that drive
    the bottom-left corner heuristics of is_ZH_corner (corner.py:349-497)
    and the G/T post-pass codes 14/16/41/61/64/46."""
    x = rng.choice(range(30, 100, 10))
    y = rng.choice(range(30, 100, 10))
    w = rng.choice(range(40, 100, 10))
    h = rng.choice(range(40, 100, 10))
    lt = rng.choice([13, 313, 413, 13, 313])
    j = lambda: rng.randrange(-2, 3)  # noqa: E731
    lines = [
        f"1:12:{lt}:{x}:{y}:{x}:{y + h}",
        f"1:2:2:{x + j()}:{y}:{x + w}:{y + j()}",
        f"1:2:2:{x}:{y + h}:{x + w + j()}:{y + h}",
    ]
    if rng.random() < 0.8:  # right vertical closes the box
        lines.append(f"1:22:23:{x + w}:{y + j()}:{x + w}:{y + h + j()}")
    if rng.random() < 0.5:  # middle horizontal → 日-like
        lines.append(f"1:2:2:{x + j()}:{y + h // 2}:{x + w + j()}:{y + h // 2}")
    if rng.random() < 0.3:  # wider free horizontal → 廿-like
        yy = y + h // 3
        lines.append(f"1:0:0:{x - 20}:{yy}:{x + w + 20}:{yy}")
    if rng.random() < 0.3:  # short inner horizontal stopping mid-box (臼-like)
        yy = y + h // 2 + rng.randrange(-4, 5)
        lines.append(f"1:2:0:{x + j()}:{yy}:{x + w // 2}:{yy}")
    return lines


_DIRECTED_SHAPES = (
    "sun", "yue", "jiu", "bottom_T", "bend", "cross_T",
    "tee_ladder", "nian", "tee_right", "ladder", "yue_ladder",
)


def _directed_lines(rng: random.Random) -> list[str]:
    """Canonical connection topologies the random generators almost never
    compose — the named shapes of is_ZH_corner's deep branches (reference
    corner.py:349-497: 日/曰 382-394, 臼 396-410, ├┼ 412-424, └┐┘
    426-439, ┌┬/┤-ladder 440-473, 廿 475-495).  Coordinates jitter as a
    whole (translation + box size) so connection offsets stay inside the
    tolerance boxes while preemption geometry varies; the left vertical's
    tail cycles 13/313/413 to exercise all three ZH verdict codes.
    Coverage audit: tools/corner_coverage.py."""
    x = rng.choice(range(30, 80, 5))
    y = rng.choice(range(30, 80, 5))
    w = rng.choice(range(50, 105, 5))
    h = rng.choice(range(50, 105, 5))
    lt = rng.choice([13, 313, 413])
    ym = y + h // 2
    x2, y2 = x + w, y + h
    shape = rng.choice(_DIRECTED_SHAPES)
    left = f"1:12:{lt}:{x}:{y}:{x}:{y2}"
    top = f"1:2:2:{x}:{y}:{x2}:{y}"
    bottom = f"1:2:2:{x}:{y2}:{x2}:{y2}"
    right = f"1:22:23:{x2}:{y}:{x2}:{y2}"
    if shape == "sun":  # 日: mid rung reaches the right vertical
        return [left, top, f"1:2:2:{x}:{ym}:{x2}:{ym}", bottom, right]
    if shape == "yue":  # 曰: mid rung stops short (free end)
        return [left, top, f"1:2:0:{x}:{ym}:{x + w - 25}:{ym}", bottom, right]
    if shape == "jiu":  # 臼: stubs left + inner-right rung to right-vert mid
        return [
            left, f"1:2:0:{x}:{y}:{x + 30}:{y}",
            f"1:2:0:{x}:{ym}:{x + 30}:{ym}", bottom,
            f"1:0:0:{x2}:{y - 20}:{x2}:{y2 + 20}",
            f"1:0:2:{x + 45}:{ym}:{x2}:{ym}",
        ]
    if shape == "bottom_T":  # ├┴: free mid rung + tate hanging into bottom
        return [
            left, f"1:2:0:{x}:{ym}:{x + 60}:{ym}", bottom,
            f"1:0:32:{x + 40}:{y - 10}:{x + 40}:{y2}",
        ]
    if shape == "bend":  # └┐┘: bottom ends on a type-3 bend
        return [
            left, top, f"1:2:2:{x}:{y2}:{x + 40}:{y2}",
            f"3:32:7:{x + 40}:{y2}:{x + 40}:{y2 + 30}:{x + 20}:{y2 + 30}",
            f"1:0:2:{x + 55}:{y2}:{x2}:{y2}", right,
        ]
    if shape == "cross_T":  # ┌┬: top passes over the right vertical's start
        return [
            left, f"1:2:0:{x}:{y}:{x2 + 40}:{y}", bottom,
            f"1:0:0:{x2}:{y}:{x2}:{y2 + 40}",
        ]
    if shape == "tee_ladder":  # ┤-ladder: all rungs end at a long right vert
        return [
            left, top, f"1:2:2:{x}:{ym}:{x2}:{ym}", bottom,
            f"1:0:0:{x2}:{y - 40}:{x2}:{y2 + 40}",
        ]
    if shape == "nian":  # 廿: free-start verticals + wide crossing rung
        return [
            f"1:0:{lt}:{x}:{y}:{x}:{y2}", f"1:0:13:{x2}:{y}:{x2}:{y2}",
            bottom, f"1:0:0:{x - 25}:{ym}:{x2 + 25}:{ym}",
        ]
    if shape == "ladder":  # 日-ladder: full mid rung, long right vert
        return [
            left, top, f"1:2:2:{x}:{ym}:{x2}:{ym}", bottom,
            f"1:22:32:{x2}:{y}:{x2}:{y2 + 40}",
        ]
    if shape == "yue_ladder":  # 曰-ladder: free short mid rung
        return [
            left, top, f"1:2:0:{x}:{ym}:{x + w - 25}:{ym}", bottom,
            f"1:22:32:{x2}:{y}:{x2}:{y2 + 40}",
        ]
    # tee_right: bottom ends at the right vertical's middle
    return [left, top, bottom, f"1:22:32:{x2}:{y}:{x2}:{y2 + 40}"]


def _geom_records(seed: int, n: int):
    rng = random.Random(f"geom:{seed}")
    recs = []
    for i in range(n):
        r = rng.random()
        if r < 0.25:  # G design → is_ZH_corner path
            name = f"zihai-{seed:02d}{i:04d}"
        elif r < 0.40:  # T design
            name = f"twedu-f{seed}-{i}"
        elif r < 0.50:  # hikanji (dup exact-thresholds; corner skips)
            # unique per i: u00c0.. stays in non-kanji (Latin) space for
            # any corpus size here.  ``i % 0x30`` collided names across
            # records — run_reference's dict keeps the LAST record while
            # the engine DataFrame keeps both rows, a false divergence.
            name = f"u{0x00C0 + i:04x}"
        else:
            name = f"gfuzz{seed}-{i}"
        r2 = rng.random()
        if r2 < 0.25:
            lines = _directed_lines(rng)
        elif r2 < 0.55:
            lines = _box_lines(rng)
        else:
            lines = _stroke_lines(rng)
        recs.append((name, "u3013", "$".join(lines)))
    return recs


@pytest.mark.parametrize("seed", [11, 12, 13, 14])
def test_geom_fuzz_parity(spark, reference_gwv, seed):
    from gwv_spark.corpus import CORPUS_TS, py_spans

    recs = _geom_records(seed, 120)
    ref = run_reference(reference_gwv, recs, GEOM_RULES)
    rows = [
        (name, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in py_spans(g)])
        for name, _r, g in recs
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id STRING, spans ARRAY<STRUCT<kind:STRING,text:STRING,media_ref:STRING,offset:INT>>",
    )
    attrs = spark.createDataFrame(
        [(n, r, CORPUS_TS) for n, r, _ in recs], "doc_id STRING, related STRING, ts DOUBLE"
    )
    eng = run_engine(spark, df, GEOM_RULES, attrs_df=attrs)
    assert_parity(ref, eng, GEOM_RULES)
