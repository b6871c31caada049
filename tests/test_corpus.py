"""Corpus generator invariants."""

from __future__ import annotations

from collections import Counter

from gwv_spark.corpus import gen_record


def test_doc_ids_unique():
    for n in (600, 5000):
        names = [gen_record(i, n)[0] for i in range(n)]
        dupes = [k for k, c in Counter(names).items() if c > 1]
        assert not dupes, f"duplicate doc_ids at n={n}: {dupes[:10]}"


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
