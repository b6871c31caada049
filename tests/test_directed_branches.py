"""Directed differential records for reference-validator branches the
random fuzz generators never reach (COVERAGE_validators.json blind
spots: mj name families, naming prohibition/IDS-content branches, j
region/source/coexistence branches, ids first-part topology codes,
width part-class box cases).

Each record is crafted to drive ONE named branch of the reference
(file:line cited inline); the whole set then runs through the standard
engine-vs-reference parity harness over every fuzz-safe rule, so any
divergence on these previously-unexercised paths fails loudly.
"""

from __future__ import annotations

from tests.parity import assert_parity, run_engine, run_reference
from tests.test_fuzz_parity import FUZZ_RULES

_BODY = "1:0:0:10:10:100:100"  # plain 7-col stroke line (extent 0..100)


def _alias(target: str) -> str:
    return f"99:0:0:0:0:200:200:{target}"


# (name, related, gdata) — reference branch in the trailing comment
DIRECTED_RECORDS: list[tuple[str, str, str]] = [
    # ---- mj: glyphname_to_field_key + key2gw family branches (mj.py:93-177)
    ("jmj-000777", "u3013", _BODY),          # UNDEFINED_MJ: absent jmj < 090000 (mj.py:234-236)
    ("jmj-000001", "u3013", _BODY),          # jmj present (row 1)
    ("jmj-090004", "u3013", _BODY),          # hentaigana-range jmj (row 4)
    ("juki-3002", "u3013", _BODY),           # juki family (key of synth row 2)
    ("nyukan-e00a", "u3013", _BODY),         # nyukan family (synth row 10)
    ("dkw-00006", "u3013", _BODY),           # dkw family (synth row 6)
    ("dkw-h1234", "u3013", _BODY),           # dkw h-prefix key shape
    ("dkw-00012dd", "u3013", _BODY),         # dkw d-suffix key shape
    ("shincho-10006", "u3013", _BODY),       # shincho family (synth row 6)
    ("sdjt-20008", "u3013", _BODY),          # sdjt family (synth row 8)
    ("jsp-2126", "u3013", _BODY),            # x0212 family (synth row 5)
    ("jx2-3021", "u3013", _BODY),            # x0213 plane 2 (absent key)
    ("jx1-2004-3027", "u3013", _BODY),       # x0213 plane 1 (synth row 6)
    ("u4e0d-ue0100", "u3013", _BODY),        # ivs family (synth row 13)
    ("u4e0e-ufe00", "u3013", _BODY),         # svs family (synth row 14)
    # koseki glyph whose entity is a DIFFERENT mj family → key2gw over
    # that family inside the WRONG_ENTITY expectation sets (mj.py:238-260)
    ("koseki-000008", "u3013", _alias("jmj-000001")),   # same row → consistent
    ("koseki-000016", "u3013", _alias("jmj-000010")),   # cross row → WRONG_ENTITY
    ("koseki-000048", "u3013", _alias("juki-3002")),    # cross row via juki
    ("koseki-000056", "u3013", _alias("dkw-00006")),    # cross row via dkw
    ("koseki-000040", "u3013", _alias("nyukan-e00a")),  # key2gw NYUKAN (mj.py:100-101)
    ("koseki-000104", "u3013", _alias("u4e07-ue0100")), # key2gw IVS (mj.py:92-93)
    ("koseki-000112", "u3013", _alias("u4e08-ufe00")),  # key2gw SVS (mj.py:92-93)
    ("toki-00000048", "u3013", _alias("jx1-2004-3032")),  # key2gw X0213 plane 1 (mj.py:102-104)
    ("koseki-000144", "u3013", _alias("jx2-303e")),     # key2gw X0213 plane 2 (mj.py:105)
    ("koseki-000072", "u3013", _alias("jsp-212e")),     # key2gw X0212 (mj.py:106-107)
    ("koseki-000080", "u3013", _alias("shincho-10014")),  # key2gw SHINCHO (mj.py:112-113)
    ("koseki-000064", "u3013", _alias("sdjt-20013")),   # key2gw SDJT (mj.py:114-115)
    ("toki-12345678", "u3013", _BODY),  # toki not 00-prefixed (kosekitoki.py:38-39)
    # ---- naming (naming.py:102-169)
    ("juki-ad96", "u3013", _BODY),           # dont-create string → PROHIBITED (naming.py:115-116)
    ("ud800", "u3013", _BODY),               # surrogate regex → PROHIBITED
    ("cdp-80a1", "u3013", _BODY),            # invalid CDP number → PROHIBITED (naming.py:121-125)
    ("u2ff0-cdp-8c42-u4e00", "u3013",
     "99:0:0:0:0:100:200:cdp-8c42$99:0:0:100:0:200:200:u4e00"),
    # ^ ENCODED_CDP_IN_IDS (naming.py:139-147) + ids cdp token merge (ids.py:91-93)
    ("u2ff0-cdpn-8c43-u4e00", "u3013", _BODY + "$" + _BODY),
    # ^ cdpo/cdpn fallback lookup (naming.py:143-144)
    ("u2ff0-u3013-u4e00", "u3013", _BODY + "$" + _BODY),   # 〓 in IDS (naming.py:151-152)
    ("u2ff0-ue111-u4e00", "u3013", _BODY + "$" + _BODY),   # PUA in IDS (naming.py:153-154)
    ("u4e00-ue0101", "u3013", _BODY),        # rule-novar acceptance (naming.py:159-160)
    ("u4e00-vert", "u3013", _BODY),          # rule-nohenka acceptance (naming.py:161-162)
    ("kx-123456", "u3013", _BODY),           # DEPRECATED_NAMING_RULE (naming.py:166-167)
    ("geog-qin-7", "u3013", _BODY),          # deprecated, second regex family
    # ---- j (j.py:101-195)
    ("irg2015-00001", "u3013", f"99:0:0:0:0:200:200:u4e45-j${_BODY}"),
    # ^ ext category → checkJV → NONJV_PART (j.py:117-119, 109-112)
    ("unstable-bsh-1234", "u3013", f"99:0:0:0:0:200:200:u4e45-j${_BODY}"),
    # ^ bsh category → checkJV (j.py:117-119)
    ("irg2015-00002", "u3013",
     "99:0:0:0:0:100:200:u4e13$99:0:0:100:0:200:200:u4e45-j"),
    # ^ no-apply part short-circuits the banned-part scan (j.py:106-108)
    ("u4e13", "u3013", _BODY),               # no-apply seed must exist in the dump (j.py:88-99)
    ("u4e03", "u3013", _BODY),
    ("u4e03-j", "u3013", _BODY),
    ("u4e03-jv", "u3013", _alias("u4e03")),  # J_JV_COEXISTENT("j") (j.py:187-189)
    ("u4e07", "u3013", _BODY),
    ("u4e07-ja", "u3013", _BODY),
    ("u4e07-jv", "u3013", _alias("u4e07")),  # J_JV_COEXISTENT("ja") (j.py:190-192)
    ("u4e13-jv", "u3013", _alias("u4e13")),  # ucs in no-apply → no jv check (j.py:193-195)
    ("u4e1b-jv", "u3013", _BODY),            # JV_SOURCE_SEPARATION (j.py:146-148)
    ("u4e00-kv", "u3013", _BODY),            # KV_HAS_KSOURCE (j.py:149-152)
    ("u4e02-kv", "u3013", _BODY),            # kv without K source → fall through
    ("u4e00-gv", "u3013", _BODY),            # gv/tv/vv/hv TODO branch (j.py:153-155)
    ("u4e00-jn", "u3013", _BODY),            # jn TODO branch (j.py:156-158)
    ("u4e00-us", "u3013", _BODY),            # -us region → return False (j.py:169-170)
    ("u4e05-i", "u3013", _BODY),             # -i region → return False
    ("u4e00-js", "u3013", _BODY),            # -js region → return False
    ("u4e01-j", "u3013", _BODY),             # nomark absent from dump (j.py:177-178)
    ("u4e06", "u3013", _BODY),
    ("u4e02", "u3013", _alias("u4e06")),
    ("u4e02-j", "u3013", _BODY),             # J_NOMARK_DIFFERENT (j.py:181-183)
    ("u4e02-j01", "u3013", _BODY),           # henka variant skips the nomark check
    # ---- ids (ids.py:101-197)
    ("u2ff0-u4e00-u4e01", "u3013", f"99:0:0:0:0:180:200:u4e00-03${_BODY}"),
    # ^ FIRST_PART_TB_IN_LR_IDS: type-03 part, width > 175 (ids.py:131-134)
    ("u2ff1-u4e00-u4e01", "u3013", f"99:0:0:0:0:200:180:u4e00-01${_BODY}"),
    # ^ FIRST_PART_LR_IN_TB_IDS: type-01 part, height > 175 (ids.py:150-153)
    ("u2ff4-u4e00-u4e01", "u3013", f"99:0:0:0:0:200:200:u4e00-02${_BODY}"),
    # ^ FIRST_PART_INNER_IN_SURROUND_IDS (ids.py:179-182)
    ("u2ff5-u4e02-u4e01", "u3013",
     "99:0:0:0:0:100:100:u4e09$99:0:0:0:0:200:200:u4e02-05"),
    # ^ OUTER_PART_NOT_FIRST_IN_SURROUND_IDS (ids.py:183-186)
    ("u2ffb-u4e03-u4e01", "u3013",
     "99:0:0:0:0:100:100:u4e09$99:0:0:0:0:200:200:u4e03"),
    # ^ FIRST_PART_NOT_FIRST_IN_OVERLAP_IDS (ids.py:187-191)
    ("u31ef-u4e00-u4e01", "u3013", f"99:0:0:0:0:200:200:u4e00${_BODY}"),
    # ^ u31ef passes (ids.py:192-193)
    ("u2ff0-u2ff1", "u3013", f"99:0:0:0:0:200:200:u4e00${_BODY}"),
    # ^ all-IDC name → indexOfFirstKanjiBuhinLine exhausts (ids.py:98)
    ("u2ff0-u4e04-u4e01", "u3013", f"99:0:0:a:0:200:200:u4e04${_BODY}"),
    # ^ unparsable placement coords → coords None → no check (ids.py:108-110)
    # ---- width (width.py:53-156)
    ("u0300", "u3013", "1:0:0:10:10:150:150"),
    # ^ nonspacing glyph rendered fullwidth → code 0 (width.py:53-55,148-151)
    ("u0041-fullwidth", "u3013", _BODY),     # fullwidth-name box (width.py:101-103)
    ("u0042-halfwidth", "u3013", _BODY),     # halfwidth-name box (width.py:104-106) → code 2
    ("u0043-01", "u3013", _BODY),            # hen-suffix box (width.py:107-109)
    ("fuzz-w1", "u3013", f"{_BODY}$99:0:0:0:0:200:200:u0301"),
    # ^ nonspacing PART copies the running extent (width.py:131-134)
    ("fuzz-w2", "u3013", f"99:0:0:0:0:200:200:u4e10${_BODY}"),
    # ^ '-halfwidth' sibling in dump → 0.31/0.69 box (width.py:135-138)
    ("u4e10-halfwidth", "u3013", "1:0:0:10:10:90:90"),
    ("fuzz-w3", "u3013", "99:0:0:0:0:200:200:u4e11-fullwidth$1:0:0:10:10:90:90"),
    # ^ fullwidth-named part → 0.31/0.69 box (width.py:135-138)
    # ---- order (order.py:49-80)
    ("fuzz-o1", "u3013", f"99:0:0:0:0:200:200:u4e00-06${_BODY}"),
    # ^ INNER_PART_FIRST: henka-06 part first (order.py:68-69)
    ("fuzz-o2", "u3013", f"{_BODY}$99:0:0:0:0:200:200:u4e00-03"),
    # ^ TOP_PART_LAST: henka-03 part last (order.py:77-78)
    # ---- related (related.py:53-62)
    ("ufa00", "u3013", _BODY),
    # ^ gokan kanji with NO compat-variant row in cjksrc (related.py:60-61)
    # ---- ucsalias (ucsalias.py:56-90)
    ("u4e21", "u3013", _BODY),
    ("u4e21-xyz", "u3013", _alias("u4e21")),
    # ^ tail neither var/itaiji nor a source suffix (ucsalias.py:82)
    ("u4e22", "u3013", _alias("undefined")),
    # ^ alias of the 'undefined' sentinel (ucsalias.py:84-85)
    # ---- illegal (illegal.py:112-127, 289-293)
    ("fuzz-i1", "u3013", "99:150:0:0:0:200:200:u4e00"),
    # ^ buhin-ichi probe: sx > 100 but < 11 columns (illegal.py:115-117)
    ("fuzz-i2", "u3013", "99:150:0:0:0:200:200:u4e00:0:a:0"),
    # ^ sx > 100 with unparsable sx2/sy2 (illegal.py:122-124)
    ("u0044", "u3013", _BODY),
    # ^ hikanji glyph with a plain stroke (illegal.py:290-293)
    ("fuzz-i3", "u3013", f"1:a:0:0:0:100:100${_BODY}"),
    # ^ unparsable head type → UNKNOWN_STROKE_FORM (illegal.py:290-291)
    ("u4e24", "u3013", _alias("u4e24-itaiji-001")),
    # ^ nomark aliasing its own -itaiji → UCS_IS_ALIAS_OF_ITAIJI (ucsalias.py:96-97)
]

# corner/dup/skew run only under the geometry differential — records
# here use only line shapes those validators parse without crashing
DIRECTED_GEOM_RECORDS: list[tuple[str, str, str]] = [
    ("geo-d1", "u3013", f"0:0:0:10:10${_BODY}"),
    # ^ stroke-type-0 line WITH parsable coords (dup.py:163-165)
    ("geo-s1", "u3013", "7:0:7:0:0:2:100:4:200:0:200"),
    # ^ SKEWED_VERT_TATEBARAI_FIRST: near-vertical straight part,
    #   xDif1 = 2 (skew.py:156-162)
    ("geo-c1", "u3013", "3:0:0:0:0:100:0:100:100"),
    # ^ 折れ whose FIRST segment is yoko (corner.py:228-230)
    ("geo-c2", "u3013", "1:a:0:0:0:100:0"),
    # ^ unparsable head type on a corner-relevant stroke (corner.py:202-203)
    ("geo-c3", "u3013", "1:0:0:100:0:100:100$1:0:0:0:0:100:0$1:0:0:100:0:200:0"),
    # ^ two yoko strokes sharing one tate start: the second connect()
    #   sees an existing error-free sttConnect (corner.py:295-297)
    ("geo-d2", "u3013", f"1:0:0:a:0:100:100${_BODY}"),
    # ^ unparsable coords on a stroke line → dup skips it (dup.py:163-164)
    ("geo-c4", "u3013", "1:0:13:100:0:100:100$1:0:0:100:100:200:100$1:0:0:0:100:100:100"),
    # ^ tail-13 tate: yoko2 makes the error-free (2,0) bottom-left corner
    #   first, then yoko1's (2,2) probe of the same tate END bails on the
    #   existing error-free endConnect (corner.py:298-300)
    ("geo-c5", "u3013", "3:0:0:0:50:100:50:100:100$1:0:0:100:0:100:100"),
    # ^ 折れ first segment's open (_STYLE_NO_END) yoko end probing a tate
    #   middle → rejected (corner.py:692-693)
]


GEOM_RULES = ["corner", "dup", "skew"]


def _run_parity(spark, reference_gwv, recs, rules):
    from gwv_spark.corpus import CORPUS_TS, py_spans

    assert len({n for n, _r, _g in recs}) == len(recs), "duplicate doc names"
    ref = run_reference(reference_gwv, recs, rules)
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
    eng = run_engine(spark, df, rules, attrs_df=attrs)
    assert_parity(ref, eng, rules)


def test_directed_branch_parity(spark, reference_gwv):
    _run_parity(spark, reference_gwv, DIRECTED_RECORDS, FUZZ_RULES)


def test_directed_geom_parity(spark, reference_gwv):
    _run_parity(spark, reference_gwv, DIRECTED_GEOM_RECORDS, GEOM_RULES)


def test_directed_records_produce_violations(reference_gwv):
    """Sanity: the directed set actually FIRES the targeted error codes
    (a silent no-op record would 'pass' parity while hitting nothing)."""
    ref = run_reference(reference_gwv, DIRECTED_RECORDS, FUZZ_RULES)
    fired = {
        (rule, code)
        for rule, payload in ref.items()
        for code, rows in payload["result"].items()
        if rows
    }
    expected = {
        ("mj", "3"),          # UNDEFINED_MJ
        ("mj", "0"),          # WRONG_ENTITY via cross-family alias
        ("naming", "2"),      # PROHIBITED
        ("naming", "3"),      # ENCODED_CDP_IN_IDS
        ("naming", "1"),      # INVALID_IDS content
        ("naming", "4"),      # DEPRECATED
        ("j", "2"),           # NONJV_PART
        ("j", "1"),           # J_JV_COEXISTENT
        ("j", "5"),           # JV_SOURCE_SEPARATION
        ("j", "31"),          # KV_HAS_KSOURCE
        ("j", "0"),           # J_NOMARK_DIFFERENT
        ("ids", "1"),
        ("ids", "10"),
        ("ids", "22"),
        ("ids", "23"),
        ("ids", "33"),
        ("width", "0"),
        ("width", "2"),
    }
    missing = expected - fired
    assert not missing, f"directed records failed to fire: {sorted(missing)}"
