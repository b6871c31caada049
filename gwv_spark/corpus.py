"""Deterministic synthetic corpus of interleaved text+media documents.

The driver's parquet tables do not include a spans-shaped corpus, so we
synthesise one (BASELINE.json.input_hint pins the shape):

    documents(doc_id STRING, spans ARRAY<STRUCT<kind, text, media_ref, offset>>)
    doc_attrs(doc_id STRING, related STRING, ts DOUBLE)

Every record is a pure function of (seed, idx, n_docs) — no wall clock, no
global RNG — so the corpus is reproducible at any scale and can be
generated either driver-side (pyarrow, small SF: both Spark and the DuckDB
oracle read the same files) or distributed (mapInPandas over spark.range,
the path a 10^12-doc corpus would use).

Population design follows FIXTURES.md §1: skewed doc_id prefixes
(~40% under 'koseki-0' to exercise salting/AQE skew handling), aliases
with occasional dangling entities, blank docs, part quotes (valid,
dangling, versioned, do-not-use), malformed spans, non-canonical integer
reprs, and geometry patterns that trigger dup/skew/corner rules.
"""

from __future__ import annotations

import random
from pathlib import Path

DEFAULT_SEED = 42
CORPUS_TS = 1700000000.0
GEN_VERSION = 9  # bump when gen_record changes → fresh .synth cache dirs

# gdata of a glyph that is itself deprecated: aliases of 'do-not-use'
# (GlyphWiki convention; donotuse.py:27-34 checks for the literal string).
_DNU = "do-not-use"


def _py_int(s: str) -> int | None:
    try:
        return int(s)
    except ValueError:
        return 0 if s.strip() == "" else None


def py_spans(gdata: str) -> list[dict]:
    """Python mirror of parse.gdata_to_spans (used by the arrow writer and
    by tests as the round-trip oracle)."""
    spans = []
    for i, text in enumerate(gdata.split("$")):
        cols = text.split(":")
        st = _py_int(cols[0])
        kind = "part" if st == 99 else ("meta" if st == 0 else "stroke")
        media_ref = None
        if st == 99 and len(cols) >= 8:
            media_ref = cols[7].split("@")[0]
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": i})
    return spans


def _strokes(rng: random.Random, n: int) -> list[str]:
    out = []
    for _ in range(n):
        t = rng.randrange(4)
        if t == 0:  # horizontal line
            x0, x1 = sorted(rng.sample(range(10, 190), 2))
            y = rng.randrange(20, 180)
            out.append(f"1:0:2:{x0}:{y}:{x1}:{y}")
        elif t == 1:  # vertical line
            y0, y1 = sorted(rng.sample(range(10, 190), 2))
            x = rng.randrange(20, 180)
            out.append(f"1:0:0:{x}:{y0}:{x}:{y1}")
        elif t == 2:  # curve
            xs = [rng.randrange(10, 190) for _ in range(6)]
            out.append("2:0:7:" + ":".join(map(str, xs)))
        else:  # generic diagonal line
            xs = [rng.randrange(10, 190) for _ in range(4)]
            out.append("1:7:8:" + ":".join(map(str, xs)))
    return out


def _ucs_kanji_name(k: int) -> str:
    """k-th unique togo-kanji codepoint name."""
    if k < 0x5200:
        return f"u{0x4E00 + k:04x}"
    return f"u{0x20000 + (k - 0x5200):05x}"


def gen_record(idx: int, n_docs: int, seed: int = DEFAULT_SEED):
    """(doc_id, related, gdata) for document #idx — pure function."""
    rng = random.Random(f"{seed}:{idx}")
    b = idx % 20
    related = "u3013"

    if b <= 7:  # 40%: koseki docs — the skewed prefix band
        # doc_id is the TABLE KEY (SURVEY §1.1) — unique at any n.  The
        # 6-digit koseki numbers (leading 9 reserved: hikanji semantics)
        # run out at 900000; beyond that the kx fallback keeps the key
        # property (a wrap-around modulo here duplicated names once the
        # corpus passed 900k docs).
        name = f"koseki-{idx:06d}" if idx < 900000 else f"kx{idx}-x"
        if idx % 160 == 3:  # a few deprecated glyphs: alias of do-not-use
            gdata = f"99:0:0:0:0:200:200:{_DNU}"
        elif idx % 80 == 3:  # blank docs
            gdata = "0:-1:-1:-1"
        else:
            gdata = "$".join(_strokes(rng, rng.randrange(1, 5)))
    elif b <= 10:  # 15%: ucs-kanji (3 slots per idx//20 → unique names)
        name = _ucs_kanji_name(3 * (idx // 20) + (b - 8))
        r = rng.random()
        if r < 0.70:
            related = name
        elif r < 0.85:
            related = "u3013"
        else:
            related = f"u{0x4E00 + rng.randrange(0x5200):04x}"
        gdata = "$".join(_strokes(rng, rng.randrange(1, 5)))
    elif b == 11:  # 5%: ucs-hikanji (+ the IDC base glyphs, + bare-ucs aliases)
        if idx == 11:
            return "u2ff0", "u3013", "1:0:2:20:100:180:100"
        if idx == 31:
            return "u2ff1", "u3013", "1:0:0:100:20:100:180"
        cp = 0x0041 + (idx // 20) % 0x3000
        if cp in (0x2FF0, 0x2FF1):
            # reserved for the two fixed IDC base docs above (idx 11/31)
            # — remap to codepoints the cp loop never reaches, else the
            # loop re-mints those names once idx passes ~244k
            cp = 0x3100 + (cp - 0x2FF0)
        rep = (idx // 20) // 0x3000
        name = f"u{cp:04x}" if rep == 0 else f"u{cp:04x}-var-{rep:03d}"
        r2 = rng.random()
        if rep == 0 and r2 < 0.06:  # bare ucs alias of a non-ucs target
            gdata = f"99:0:0:0:0:200:200:koseki-{idx % 900000:06d}"
        elif rep == 0 and r2 < 0.10:  # bare ucs alias of its own variant
            gdata = f"99:0:0:0:0:200:200:{name}-var-001"
        else:
            gdata = "$".join(_strokes(rng, rng.randrange(1, 3)))
    elif b == 12:  # 5%: ucs variant bodies + a band of gokan compat glyphs
        k = idx // 20
        if k % 37 == 5 and (k // 37) < 40:
            name = f"uf9{k // 37:02x}"  # gokan kanji (related: compat variant)
            expected = f"u{0x4E00 + 7 * (k // 37):04x}"
            r2 = rng.random()
            related = expected if r2 < 0.6 else ("u3013" if r2 < 0.8 else name)
        else:
            name = f"u{0x4E00 + k % 0x5200:04x}-var-{100 + k // 0x5200:03d}"
        gdata = "$".join(_strokes(rng, rng.randrange(1, 4)))
    elif b == 13:  # 5%: aliases — valid/dangling/self-nomark/region cases
        base = f"u{0x4E00 + (idx // 20) % 0x5200:04x}"
        w = (idx // 20) // 0x5200  # base wrap counter (0 below ~420k docs)
        name = f"{base}-itaiji-{100 + w:03d}"
        r2 = rng.random()
        if r2 < 0.10:
            entity = f"none-{idx}"  # dangling
        elif r2 < 0.25:
            entity = base  # aliases its own nomark (ucsalias food)
        elif r2 < 0.32:
            # -g/-jv/-j carry no wrap counter, so they are reserved for
            # the FIRST base cycle; later cycles take counter-suffixed
            # itaiji families (300/400/500 bands, disjoint from the 100
            # and 200 bands) — doc_id stays a true key at any n
            name = f"{base}-g" if w == 0 else f"{base}-itaiji-{300 + w:03d}"
            entity = base  # region-source alias of the nomark
        elif r2 < 0.38:
            # -var-2xx: disjoint from bucket-12's -var-1xx names
            name = f"{base}-var-{200 + w:03d}"
            entity = base
        elif r2 < 0.44:  # region tail -jv (j rule: codes 30/5/…)
            name = f"{base}-jv" if w == 0 else f"{base}-itaiji-{400 + w:03d}"
            entity = base
        elif r2 < 0.50:  # region tail -j (j rule: code 40 when no J source)
            name = f"{base}-j" if w == 0 else f"{base}-itaiji-{500 + w:03d}"
            entity = base
        else:
            k = (idx // 20) % max(1, _count_in_bucket(n_docs, 8))
            entity = _ucs_kanji_name(3 * k)
        gdata = f"99:0:0:0:0:200:200:{entity}"
    elif b == 14:  # 5%: ids compositions
        k1 = rng.randrange(max(1, _count_in_bucket(n_docs, 8)))
        k2 = rng.randrange(max(1, _count_in_bucket(n_docs, 9)))
        p1 = _ucs_kanji_name(3 * k1)
        p2 = _ucs_kanji_name(3 * k2 + 1)
        idc = rng.choice(["u2ff0", "u2ff1"])
        name = f"{idc}-{p1}-{p2}"
        r2 = rng.random()
        if r2 > 0.96:  # unknown-IDC food (ids code 90 via the u2ffe typo)
            name = f"u2ffe-{p1}-{p2}"
            gdata = f"99:0:0:0:0:100:200:{p1}-01$99:0:0:100:0:200:200:{p2}-02"
        elif idc == "u2ff0":
            if r2 < 0.12:  # right part first (ids code 2)
                gdata = f"99:0:0:0:0:100:200:{p1}-02$99:0:0:100:0:200:200:{p2}-01"
            elif r2 < 0.24:  # left kanji not first (ids code 3)
                gdata = f"99:0:0:0:0:100:200:{p2}-01$99:0:0:100:0:200:200:{p1}-02"
            else:
                gdata = f"99:0:0:0:0:100:200:{p1}-01$99:0:0:100:0:200:200:{p2}-02"
        else:
            if r2 < 0.12:  # bottom part first (ids code 12)
                gdata = f"99:0:0:0:0:200:100:{p1}-04$99:0:0:0:100:200:200:{p2}-03"
            elif r2 < 0.24:  # top kanji not first (ids code 13)
                gdata = f"99:0:0:0:0:200:100:{p2}-03$99:0:0:0:100:200:200:{p1}-04"
            else:
                gdata = f"99:0:0:0:0:200:100:{p1}-03$99:0:0:0:100:200:200:{p2}-04"
    elif b == 15:  # 5%: toki docs, tied to koseki entries
        knum = (idx - 15) % 900000  # koseki docs exist at idx ≡ 0..7 (mod 20)
        if idx - 15 < 900000:
            name = f"toki-00{knum:06d}"
        else:
            # '00'-prefixed 8-digit names wrap past 900k docs; the tail
            # takes a non-'00' prefix (not kosekitoki food, but unique)
            name = f"toki-{10_000_000 + idx:08d}"
        target = f"koseki-{knum:06d}"
        r2 = rng.random()
        if r2 < 0.70:
            gdata = f"99:0:0:0:0:200:200:{target}"
        elif r2 < 0.85:  # alias of the wrong entity (kosekitoki code 1/2)
            wrong = _ucs_kanji_name(3 * ((idx // 20) % 64))
            gdata = f"99:0:0:0:0:200:200:{wrong}"
        else:  # not an alias at all (code 0)
            gdata = "$".join(_strokes(rng, 2))
    elif b == 16:  # 5%: user-owned
        name = f"test_{idx}"
        gdata = "0:-1:-1:-1" if rng.random() < 0.3 else "$".join(_strokes(rng, 1))
    elif b == 17:  # 5%: quoting docs (referential-integrity exercise)
        name = f"quoter-{idx}"
        r = rng.random()
        k = rng.randrange(max(1, _count_in_bucket(n_docs, 0)))
        target_idx = _kth_idx_in_bucket(k, 0)
        target = f"koseki-{target_idx % 900000:06d}"
        if r < 0.55:
            quote = target
        elif r < 0.70:
            quote = f"{target}@{rng.randrange(1, 30)}"  # versioned (mustrenew)
        elif r < 0.78 and idx >= 37:
            # versioned quote of an earlier quoter — that base's own gdata
            # may contain '@', exercising mustrenew's is_old branch
            quote = f"quoter-{idx - 20}@{rng.randrange(1, 5)}"
        elif r < 0.90:
            quote = f"none-{idx}"  # dangling (delquote)
        else:  # quote a deprecated glyph (donotuse): idx ≡ 3 (mod 160)
            k2 = rng.randrange(max(1, 1 + (n_docs - 1 - 3) // 160))
            quote = f"koseki-{(3 + 160 * k2) % 900000:06d}"
        lines = [f"99:0:0:{rng.randrange(50)}:{rng.randrange(50)}:150:150:{quote}"]
        lines += _strokes(rng, 1)  # keep it non-alias
        gdata = "$".join(lines)
    elif b == 18:  # 5%: geometry patterns (dup / skew / corner)
        name = f"geom-{idx}"
        if idx % 9 == 0:  # some under G/T-design names (corner.py:510-511,803-828)
            # no modulo: zihai numbers just grow past 6 digits (unique)
            name = f"zihai-{idx:06d}" if (idx // 20) % 2 == 0 else f"twedu-a{idx:05d}"
        g = rng.randrange(12)
        if g == 0:  # near-duplicate horizontal pair (dup.py:101-118)
            y = rng.randrange(30, 170)
            d = rng.randrange(0, 4)
            gdata = f"1:0:2:10:{y}:190:{y}$1:0:2:10:{y + d}:190:{y + d}"
        elif g == 1:  # skewed near-vertical line (skew.py:89-105)
            x = rng.randrange(30, 170)
            d = rng.randrange(1, 4)
            gdata = f"1:0:0:{x}:10:{x + d}:190"
        elif g == 2:  # skewed near-horizontal line
            y = rng.randrange(30, 170)
            d = rng.randrange(1, 4)
            gdata = f"1:0:2:10:{y}:190:{y + d}"
        elif g == 3:  # L-corner: vertical meets horizontal
            x, y = rng.randrange(30, 120), rng.randrange(30, 120)
            jx = rng.randrange(-2, 3)
            gdata = f"1:0:0:{x}:{y}:{x}:{y + 80}$1:2:2:{x + jx}:{y + 80}:{x + 80}:{y + 80}"
        elif g == 4:  # jittered corner pair over the tolerance-box grid
            x, y = rng.randrange(40, 120), rng.randrange(40, 120)
            ht = rng.choice([12, 22, 32, 0])
            tt = rng.choice([13, 23, 313, 413, 32, 0, 24])
            jx, jy = rng.randrange(-9, 10), rng.randrange(-7, 6)
            w = rng.randrange(40, 80)
            gdata = (
                f"1:{ht}:{tt}:{x}:{y}:{x}:{y + 80}"
                f"$1:0:2:{x + jx}:{y + 80 + jy}:{x + jx + w}:{y + 80 + jy}"
            )
        elif g == 5:  # T-joint: vertical endpoint on a horizontal middle
            x, y = rng.randrange(60, 140), rng.randrange(40, 140)
            jy = rng.randrange(-6, 7)
            ht = rng.choice([0, 32, 12, 22])
            gdata = (
                f"1:2:2:{x - 50}:{y}:{x + 50}:{y}"
                f"$1:{ht}:0:{x}:{y + jy}:{x}:{y + 70 + jy}"
            )
        elif g == 6:  # ⊢-joint: horizontal endpoint on a vertical middle
            x, y = rng.randrange(40, 120), rng.randrange(50, 130)
            jx = rng.randrange(-8, 9)
            tt = rng.choice([0, 2, 32])
            gdata = (
                f"1:0:0:{x}:{y - 40}:{x}:{y + 60}"
                f"$1:0:{tt}:{x + jx}:{y}:{x + 70}:{y}"
            )
        elif g == 7:  # box 口 with jittered corners (preemption / ZH-corner food)
            x, y = rng.randrange(40, 90), rng.randrange(40, 90)
            w, h = rng.randrange(50, 90), rng.randrange(50, 90)
            j = lambda: rng.randrange(-3, 4)  # noqa: E731
            gdata = (
                f"1:12:13:{x}:{y}:{x}:{y + h}"
                f"$1:22:23:{x + w + j()}:{y + j()}:{x + w}:{y + h}"
                f"$1:2:2:{x + j()}:{y}:{x + w}:{y + j()}"
                f"$1:2:2:{x + j()}:{y + h + j()}:{x + w + j()}:{y + h}"
            )
        elif g == 8:  # near-duplicate curve pair (dup code 2, dup.py:136-143)
            cs = [rng.randrange(20, 170) for _ in range(6)]
            d = [rng.randrange(0, 5) for _ in range(6)]  # ≤3 hits, >3 misses
            cs2 = [c + dd for c, dd in zip(cs, d)]
            gdata = (
                "2:0:7:" + ":".join(map(str, cs))
                + "$2:0:7:" + ":".join(map(str, cs2))
            )
        elif g == 9:  # near-duplicate double-curve pair (dup code 3)
            cs = [rng.randrange(20, 160) for _ in range(8)]
            d = [rng.randrange(0, 4) for _ in range(8)]
            cs2 = [c + dd for c, dd in zip(cs, d)]
            gdata = (
                "6:7:8:" + ":".join(map(str, cs))
                + "$6:7:8:" + ":".join(map(str, cs2))
            )
        elif g == 10:  # same-name part pair (dup code 99, dup.py:204-206)
            k = rng.randrange(max(1, _count_in_bucket(n_docs, 0)))
            target = f"koseki-{_kth_idx_in_bucket(k, 0) % 900000:06d}"
            x, y = rng.randrange(10, 60), rng.randrange(10, 60)
            w, h = rng.randrange(80, 130), rng.randrange(80, 130)
            dx, dy = rng.randrange(0, 6), rng.randrange(0, 6)
            gdata = (
                f"99:0:0:{x}:{y}:{x + w}:{y + h}:{target}"
                f"$99:0:0:{x + dx}:{y + dy}:{x + w + dx}:{y + h + dy}:{target}"
            )
        else:  # g == 11: part-position mark pair (dup code 9, st=9)
            x, y = rng.randrange(20, 160), rng.randrange(20, 160)
            dx, dy = rng.randrange(0, 6), rng.randrange(0, 6)
            gdata = (
                f"9:0:0:{x}:{y}:{x + 20}:{y + 20}"
                f"$9:0:0:{x + dx}:{y + dy}:{x + 20 + dx}:{y + 20 + dy}"
            )
    else:  # 5%: malformed spans (numexp / illegal food)
        name = f"bad-{idx}"
        g = rng.randrange(5)
        if g == 0:  # blank line
            gdata = "1:0:2:10:100:190:100$"
        elif g == 1:  # invalid char
            gdata = "1:0:2:10:100:190:100 $1:0:2:10:120:190:120"
        elif g == 2:  # non-canonical int
            gdata = f"1:0:2:0{rng.randrange(10, 99)}:100:190:100"
        elif g == 3:  # wrong arity for stroke type 2 (too many columns —
            # too few would crash the reference's corner validator,
            # corner.py:216 indexes coords[2] unconditionally)
            gdata = "2:0:7:10:10:50:50:100:100:0"
        else:  # unknown stroke type
            gdata = "8:0:0:10:10:100:100"
    return name, related, gdata


def _count_in_bucket(n_docs: int, b: int) -> int:
    """How many idx < n_docs have idx % 20 == b."""
    return (n_docs - b + 19) // 20 if n_docs > b else 0


def _kth_idx_in_bucket(k: int, b: int) -> int:
    return b + 20 * k


def n_docs_for_sf_dir(sf_dir: str) -> int:
    """Match the driver's documents-table scaling (500 rows at sf0.001)."""
    name = Path(sf_dir).name  # e.g. 'sf0.01'
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(200, int(round(500 * sf / 0.001)))


def synth_dir_for(sf_dir: str, root: str | Path | None = None) -> Path:
    root = Path(root) if root else Path(__file__).resolve().parent.parent / ".synth"
    return root / f"v{GEN_VERSION}" / Path(sf_dir).name


def ensure_corpus(
    out_dir: str | Path, n_docs: int, seed: int = DEFAULT_SEED, overwrite: bool = False
) -> Path:
    """Write documents.parquet + doc_attrs.parquet with pyarrow (driver
    side — used at test SF so DuckDB and Spark read identical bytes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(out_dir)
    docs_path = out / "documents.parquet"
    attrs_path = out / "doc_attrs.parquet"
    if docs_path.exists() and attrs_path.exists() and not overwrite:
        return out
    out.mkdir(parents=True, exist_ok=True)

    names, relateds, spans_col = [], [], []
    for idx in range(n_docs):
        name, related, gdata = gen_record(idx, n_docs, seed)
        names.append(name)
        relateds.append(related)
        spans_col.append(py_spans(gdata))

    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    docs = pa.table(
        {"doc_id": pa.array(names, pa.string()), "spans": pa.array(spans_col, span_type)}
    )
    pq.write_table(docs, docs_path)
    attrs = pa.table(
        {
            "doc_id": pa.array(names, pa.string()),
            "related": pa.array(relateds, pa.string()),
            "ts": pa.array([CORPUS_TS] * n_docs, pa.float64()),
        }
    )
    pq.write_table(attrs, attrs_path)
    return out


def ensure_corpus_for_sf_dir(sf_dir: str, seed: int = DEFAULT_SEED) -> Path:
    out = synth_dir_for(sf_dir)
    return ensure_corpus(out, n_docs_for_sf_dir(sf_dir), seed)


def spark_generate(spark, n_docs: int, seed: int = DEFAULT_SEED, partitions: int | None = None):
    """Distributed generation — the 10^12-doc path.  spark.range is evenly
    partitioned; each task generates its id range independently (no driver
    materialization, no shuffle)."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("related", StringType()),
            StructField("ts", DoubleType()),
            StructField(
                "spans",
                ArrayType(
                    StructType(
                        [
                            StructField("kind", StringType()),
                            StructField("text", StringType()),
                            StructField("media_ref", StringType()),
                            StructField("offset", IntegerType()),
                        ]
                    )
                ),
            ),
        ]
    )

    def gen_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for idx in pdf["id"]:
                name, related, gdata = gen_record(int(idx), n_docs, seed)
                rows.append(
                    {
                        "doc_id": name,
                        "related": related,
                        "ts": CORPUS_TS,
                        "spans": [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in py_spans(gdata)
                        ],
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "related", "ts", "spans"])

    rng_df = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen_batches, schema=schema)
