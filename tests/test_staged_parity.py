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

# r12 (VERDICT item 2): this file is one of the DEEP MIRROR suites — it
# re-verifies what the driver already verifies itself (oracle hashes /
# dtype parity / plan pins), and the six mirror files together grew past
# the driver's pytest window (VERIFY_r11: run killed at ~58% with zero
# failures). Default `pytest tests/` therefore skips them so the
# driver-visible suite finishes inside the window; the repo's own round
# gates run them with SPARK_GRAFT_DEEP=1 (see CLAUDE.md), and
# they remain mandatory before any commit that touches operators.
pytestmark = pytest.mark.skipif(
    not (os.environ.get("SPARK_GRAFT_DEEP")),
    reason="deep mirror suite: set SPARK_GRAFT_DEEP=1 to run "
    "(driver-window split, OPTIMIZATION_r12.md)",
)


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
