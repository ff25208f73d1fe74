"""Parity harness for the STAGED batch (same gate as queries()).

Staged operators are fully implemented and oracle-twinned but held OUT of
the driver-facing surface until their window rotation (currently the r11
batch, promoting after the r10 window lands).
This module runs them through the exact assert_matches_oracle harness the
production surface uses, so promotion is a pure dict move.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE, assert_matches_oracle

QUERIES = entrymod.staged_queries()
ORACLES = entrymod.staged_oracle_sql()


def test_every_staged_query_has_oracle():
    assert sorted(QUERIES) == sorted(ORACLES)


def test_staged_stay_out_of_production_surface():
    prod = set(entrymod.queries())
    assert not prod & set(QUERIES), "staged op leaked into queries()"
    assert not set(entrymod.oracle_sql()) & set(ORACLES), (
        "staged oracle leaked into oracle_sql()"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_staged_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert_matches_oracle(df, ORACLES[name], SF_SMOKE, duck_con=duck)
