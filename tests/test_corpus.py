"""Corpus generator invariants."""

from __future__ import annotations

from collections import Counter

from gwv_spark.corpus import gen_record


def test_doc_ids_unique():
    for n in (600, 5000):
        names = [gen_record(i, n)[0] for i in range(n)]
        dupes = [k for k, c in Counter(names).items() if c > 1]
        assert not dupes, f"duplicate doc_ids at n={n}: {dupes[:10]}"


def test_doc_ids_unique_at_anchor_scale():
    """doc_id is the TABLE KEY (SURVEY §1.1): unique at ANY corpus size,
    including past every name-family wrap boundary — koseki numbers run
    out at 900k, the band-13 base cycle wraps at ~420k, the band-11 cp
    loop reaches the fixed IDC names at ~244k, toki numbers wrap at
    ~900k.  1.2M covers them all (the 1M bench anchor sits inside).
    Full sweep, ~25 s — this is the property the incremental RI tier's
    definition set and every groupBy("doc_id") rely on."""
    n = 1_200_000
    seen = {}
    for i in range(n):
        name = gen_record(i, n)[0]
        assert name not in seen, (name, seen[name], i)
        seen[name] = i


def test_deterministic():
    a = [gen_record(i, 600) for i in range(600)]
    b = [gen_record(i, 600) for i in range(600)]
    assert a == b


def test_population_mix():
    recs = [gen_record(i, 5000) for i in range(5000)]
    names = [r[0] for r in recs]
    koseki = sum(1 for x in names if x.startswith("koseki-"))
    assert koseki / len(names) > 0.35  # skewed prefix band
    aliases = sum(
        1 for _, _, g in recs if g.startswith("99:0:0:0:0:200:200:") and "$" not in g
    )
    assert aliases > 100
