from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from gwv_spark.session import get_spark

    s = get_spark("gwv_spark-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def reference_gwv():
    """Import the reference implementation (read-only, pure Python) for
    differential testing.  Skips if unavailable."""
    if not REFERENCE.exists():
        pytest.skip("reference repo not available")
    sys.path.insert(0, str(REFERENCE))
    import gwv.dump  # noqa: F401

    # inject network/build-time dims BEFORE any validator module imports
    # (naming.py builds cdp_dict over HTTP at import time)
    from gwv_spark.dims import patch_reference_loaders

    patch_reference_loaders()
    import gwv.validator  # noqa: F401

    return sys.modules["gwv"]


@pytest.fixture(scope="session")
def small_corpus_records():
    """Deterministic list of (doc_id, related, gdata) used by parity tests."""
    from gwv_spark.corpus import gen_record

    n = 600
    return [gen_record(i, n) for i in range(n)]


@pytest.fixture(scope="session")
def small_corpus_df(spark, small_corpus_records):
    from gwv_spark.corpus import py_spans

    rows = [
        (name, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in py_spans(g)])
        for name, _rel, g in small_corpus_records
    ]
    return spark.createDataFrame(
        rows,
        "doc_id STRING, spans ARRAY<STRUCT<kind:STRING,text:STRING,media_ref:STRING,offset:INT>>",
    )


@pytest.fixture(scope="session")
def small_attrs_df(spark, small_corpus_records):
    from gwv_spark.corpus import CORPUS_TS

    return spark.createDataFrame(
        [(n, r, CORPUS_TS) for n, r, _ in small_corpus_records],
        "doc_id STRING, related STRING, ts DOUBLE",
    )
