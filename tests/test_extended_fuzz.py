"""Opt-in wide fuzz-differential sweep (GWV_EXTENDED_FUZZ=1).

Re-runs the geometry and grammar fuzz parity cases over many more
seeds than the default suite.  Off by default to keep `pytest tests/`
within its time budget; run before a release or after touching the
geometry rules:

    GWV_EXTENDED_FUZZ=1 python -m pytest tests/test_extended_fuzz.py -q
"""

from __future__ import annotations

import os

import pytest

from tests.test_fuzz_parity import test_fuzz_parity as fuzz_case
from tests.test_geom_fuzz import test_geom_fuzz_parity as geom_case

pytestmark = pytest.mark.skipif(
    not os.environ.get("GWV_EXTENDED_FUZZ"),
    reason="extended fuzz sweep is opt-in (GWV_EXTENDED_FUZZ=1)",
)


# fresh-seed sweeps: override the 30-seed window base to fuzz seeds
# never run before (e.g. GWV_FUZZ_GEOM_BASE=130 GWV_FUZZ_GRAMMAR_BASE=230)
_GEOM_BASE = int(os.environ.get("GWV_FUZZ_GEOM_BASE", "100"))
_GRAMMAR_BASE = int(os.environ.get("GWV_FUZZ_GRAMMAR_BASE", "200"))


@pytest.mark.parametrize("seed", list(range(_GEOM_BASE, _GEOM_BASE + 30)))
def test_geom_ext(spark, reference_gwv, seed):
    geom_case(spark, reference_gwv, seed)


@pytest.mark.parametrize("seed", list(range(_GRAMMAR_BASE, _GRAMMAR_BASE + 30)))
def test_fuzz_ext(spark, reference_gwv, seed):
    fuzz_case(spark, reference_gwv, seed)
