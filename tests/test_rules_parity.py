"""Differential parity: the Spark engine must reproduce the reference's
violations on the same synthetic corpus (canonicalized within errcode)."""

from __future__ import annotations

import pytest

from tests.parity import assert_parity, run_engine, run_reference

# Rules runnable against the reference with fixture dims injected
# (conftest.patch_reference_loaders) — no network, no missing build data.
PARITY_RULES_IMPLEMENTED = [
    "numexp", "delquote", "delvar", "order", "kosekitoki", "ucsalias",
    "donotuse", "mustrenew", "skew", "illegal", "related", "ids", "naming",
    "j", "mj", "width", "dup", "corner",
]


@pytest.mark.parametrize("rule_id", PARITY_RULES_IMPLEMENTED)
def test_rule_parity(
    spark, reference_gwv, small_corpus_records, small_corpus_df, small_attrs_df, rule_id
):
    ref = run_reference(reference_gwv, small_corpus_records, [rule_id])
    eng = run_engine(spark, small_corpus_df, [rule_id], attrs_df=small_attrs_df)
    assert_parity(ref, eng, [rule_id])
