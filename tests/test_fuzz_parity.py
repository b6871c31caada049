"""Seeded fuzz differential test: random-grammar gdata, engine vs
reference on every implemented rule.

The grammar is constrained to line shapes the *reference itself* can
process without crashing (it IndexErrors on e.g. a 5-column type-1 line
in skew.py:90, and AttributeErrors on a 7-column 99-line in
donotuse.py:30 — shapes that never occur in real dumps).
"""

from __future__ import annotations

import random

import pytest

from tests.parity import assert_parity, run_engine, run_reference

FUZZ_RULES = [
    "numexp", "delquote", "delvar", "order", "kosekitoki", "ucsalias",
    "donotuse", "mustrenew", "skew", "illegal", "related", "ids", "naming",
    "j", "mj", "width",
]

INT_TOKENS = [
    "0", "1", "2", "3", "-1", "-5", "007", "-0", "", "1_0", "99", "98",
    "97", "100", "101", "200", "209", "313", "413", "12", "22", "32",
    "5", "7", "8", "13", "150", "a", "1.5", "+5",
]
COORD_TOKENS = ["0", "10", "50", "100", "150", "190", "200", "-10", "03", ""]
HEAD_TOKENS = ["0", "2", "7", "12", "22", "32", "27", "97", "98", "99", "-1", "101", "132"]
TAIL_TOKENS = ["0", "2", "4", "5", "7", "8", "13", "23", "24", "32", "313", "413", "-1", "105"]


def _rand_line(rng: random.Random, names: list[str]) -> str:
    kind = rng.randrange(10)
    if kind <= 3:  # stroke line with plausible arity
        st = rng.choice(["1", "2", "3", "4", "6", "7", "9", "101", "102", "107", "109"])
        base = int(st) % 100
        ncols = {1: 7, 2: 9, 3: 9, 4: 9, 6: 11, 7: 11, 9: 7}.get(base, 7)
        if rng.random() < 0.2:
            ncols += rng.choice([1, 2])  # too-many columns (maybe zeros)
        cols = [st, rng.choice(HEAD_TOKENS), rng.choice(TAIL_TOKENS)]
        cols += [rng.choice(COORD_TOKENS) for _ in range(ncols - 3)]
        return ":".join(cols)
    if kind <= 5:  # 99-line
        ncols = rng.choice([8, 8, 8, 11, 12])
        name = rng.choice(names + ["none-x", "u4e00@3", "u4e00-01", "u4e00-g02"])
        cols = (
            ["99", rng.choice(INT_TOKENS), rng.choice(INT_TOKENS)]
            + [rng.choice(["0", "200", "100", "03", ""]) for _ in range(4)]
            + [name]
        )
        cols += [rng.choice(["0", "200", "100"]) for _ in range(ncols - 8)]
        return ":".join(cols)
    if kind == 6:  # 0-line / meta
        return ":".join(
            ["0"]
            + [rng.choice(["0", "-1", "97", "98", "99", "1", "2", "3"]) for _ in range(rng.choice([3, 3, 6, 2]))]
        )
    if kind == 7:  # unknown stroke types / junk ints
        # first column constrained: raw stroke types 1/3/4/7 with short
        # coords and 99 with <8 columns crash the reference outright
        first = rng.choice(["2", "5", "8", "9", "0", "", "-5", "a", "1.5", "+5", "209", "102"])
        rest = [rng.choice(INT_TOKENS) or "5" for _ in range(rng.randrange(1, 8))]
        return ":".join([first] + rest)
    if kind == 8:  # alias-like candidates
        sx = rng.choice(["0", "100", "150", "200"])
        sy = rng.choice(["0", "50"])
        cols = ["99", sx, sy, "0", "0", "200", "200", rng.choice(names)]
        if rng.random() < 0.5:
            cols += [rng.choice(["0", "100"]) for _ in range(3)]
        return ":".join(cols)
    return rng.choice(["", "0:-1:-1:-1", "0:0:0:0", "9:0:0:10:10:100:100"])


def _fuzz_records(seed: int, n: int):
    rng = random.Random(seed)
    name_pool = (
        [f"u{0x4E00 + i:04x}" for i in range(40)]
        + [f"u{0x0041 + i:04x}" for i in range(20)]  # hikanji
        + [f"koseki-{i:06d}" for i in range(20)]
        + [f"koseki-9{i:05d}" for i in range(10)]  # hikanji koseki
        + [f"toki-00{i:06d}" for i in range(10)]
        + [f"u4e{i:02x}-var-{i:03d}" for i in range(10)]
        + [f"u4e{i:02x}-itaiji-{i:03d}" for i in range(10)]
        + [f"u4e{i:02x}-g" for i in range(6)]
        + [f"fuzz-{i}" for i in range(20)]
        + [f"user_{i}" for i in range(6)]
        + [f"u2ff{i % 2}-u4e{i:02x}-u4e{i + 1:02x}" for i in range(8)]
        + [f"uf9{i:02x}" for i in range(6)]  # gokan compat (related rule)
        + ["u2ffe-u4e00-u4e01", "cdp-8c42", "j78-3021", "j78-2120"]
        # mj name families (synth_mj strides, dims.py) — present + absent keys
        + [f"jmj-{i:06d}" for i in range(4)] + ["jmj-090004", "jmj-000777"]
        + [f"juki-{0x3000 + 2 * i:04x}" for i in range(4)]
        + ["nyukan-e000", "nyukan-e00a", "jsp-2122", "jsp-2126"]
        + [f"dkw-{3 * i:05d}" for i in range(4)] + ["dkw-h1234", "dkw-00012dd"]
        + ["shincho-10002", "shincho-10006", "sdjt-20003", "sdjt-20008"]
        + ["jx2-3021", "jx1-2004-3027", "jx1-2000-3021"]
        + [f"u{0x4E00 + i:04x}-ue0100" for i in (1, 7, 13)]
        + [f"u{0x4E00 + i:04x}-ufe00" for i in (2, 8, 14)]
        # j region tails over varied source rows (synth_cjksrc strides)
        + [f"u{0x4E00 + i:04x}-{r}" for i, r in
           [(0, "jv"), (3, "jv"), (27, "jv"), (19, "jv"), (0, "kv"), (2, "kv"),
            (0, "gv"), (0, "jn"), (0, "us"), (2, "j"), (3, "j"), (7, "ja"), (2, "j01")]]
        # width box/class names + naming prohibition/deprecation shapes
        + ["u0300", "u0301", "u0041-fullwidth", "u0042-halfwidth", "u0043-01",
           "u4e10-halfwidth", "u4e11-fullwidth"]
        + ["juki-ad96", "ud800", "cdp-80a1", "kx-123456", "geog-qin-7",
           "u4e00-vert", "u4e00-ue0101", "u2ff0-cdpn-8c43-u4e00"]
    )
    names = rng.sample(name_pool, min(n, len(name_pool)))
    recs = []
    for name in names:
        if rng.random() < 0.15:
            gdata = f"99:0:0:0:0:200:200:{rng.choice(name_pool)}"
        else:
            gdata = "$".join(
                _rand_line(rng, name_pool) for _ in range(rng.randrange(1, 5))
            )
        related = rng.choice(["u3013", "u3013", name, rng.choice(name_pool)])
        recs.append((name, related, gdata))
    return recs


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_parity(spark, reference_gwv, seed):
    from gwv_spark.corpus import py_spans

    recs = _fuzz_records(seed, 150)
    ref = run_reference(reference_gwv, recs, FUZZ_RULES)
    rows = [
        (name, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in py_spans(g)])
        for name, _r, g in recs
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id STRING, spans ARRAY<STRUCT<kind:STRING,text:STRING,media_ref:STRING,offset:INT>>",
    )
    from gwv_spark.corpus import CORPUS_TS

    attrs = spark.createDataFrame(
        [(n, r, CORPUS_TS) for n, r, _ in recs], "doc_id STRING, related STRING, ts DOUBLE"
    )
    eng = run_engine(spark, df, FUZZ_RULES, attrs_df=attrs)
    assert_parity(ref, eng, FUZZ_RULES)
