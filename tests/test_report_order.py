"""Report-shape and byte-order tests.

1. The reference's only end-to-end unit test, ported: the empty corpus
   must produce the exact golden result dict
   (/root/reference/tests/test_validator.py:10-22).
2. Byte-exact result JSON on the 600-doc parity corpus: the engine's
   sortkeys must reproduce the reference's within-errcode row order —
   global sorted-doc iteration (validator.py:42), skew's angle-desc sort
   (skew.py:66-72), illegal's line-prefix sort (illegal.py:325-330),
   mustrenew's lexicographic parts (mustrenew.py:52-57) — byte for byte
   through the same JSON sink options (gwv.py:43-44).

The ONLY tolerated divergence: the reference iterates Python SETS when
emitting delquote's per-doc rows (delquote.py:25-30) and mj's
expected-set params (mj.py:259,277,280); with randomized str hashing
that order changes per reference process, so it is not a specified
order.  The engine emits those sorted (deterministic); the test sorts
exactly those spots on BOTH sides and requires byte equality everywhere
else.
"""

from __future__ import annotations

import copy
import json

from tests.parity import run_engine, run_reference

ALL_RULES = [
    "corner", "related", "illegal", "skew", "donotuse", "kosekitoki",
    "mj", "ucsalias", "dup", "naming", "ids", "order", "delquote",
    "delvar", "numexp", "mustrenew", "j", "width",
]


def test_empty_corpus_golden(spark, reference_gwv):
    from gwv.dump import Dump
    from gwv.validator import validate

    from gwv_spark import engine
    from gwv_spark.corpus import CORPUS_TS

    expected = validate(Dump({}, CORPUS_TS))
    got = engine.result_json([], None, timestamp=CORPUS_TS)
    assert got == expected
    # pin the golden shape itself (test_validator.py:13-19): every rule
    # empty, mustrenew always carries its two fixed keys
    assert got["mustrenew"]["result"] == {"@": [], "0": []}
    assert all(
        payload["result"] == {}
        for rid, payload in got.items()
        if rid != "mustrenew"
    )
    assert set(got) == set(ALL_RULES)


def _canon_set_order(result: dict) -> dict:
    """Sort ONLY the reference's set-derived orders (see module doc)."""
    out = copy.deepcopy(result)
    if "delquote" in out:
        for rows in out["delquote"]["result"].values():
            rows.sort(key=lambda r: (r[0], r[1]))
    if "mj" in out:
        for rows in out["mj"]["result"].values():
            for r in rows:
                for i, p in enumerate(r):
                    if isinstance(p, list) and all(isinstance(x, str) for x in p):
                        r[i] = sorted(p)
    return out


def test_result_json_byte_equal(
    spark, reference_gwv, small_corpus_records, small_corpus_df, small_attrs_df
):
    ref = run_reference(reference_gwv, small_corpus_records, ALL_RULES)
    eng = run_engine(spark, small_corpus_df, ALL_RULES, attrs_df=small_attrs_df)
    ref_c, eng_c = _canon_set_order(ref), _canon_set_order(eng)
    opts = {"separators": (",", ":"), "sort_keys": True}  # gwv.py:43-44
    for rid in ALL_RULES:
        rb = json.dumps(ref_c[rid], **opts)
        eb = json.dumps(eng_c[rid], **opts)
        assert rb == eb, f"rule {rid} result JSON not byte-equal"
    assert json.dumps(ref_c, **opts) == json.dumps(eng_c, **opts)
