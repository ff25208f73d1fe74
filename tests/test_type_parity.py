"""Schema-level type parity between every Spark query and its DuckDB twin.

Guards the bug class found in r07: DuckDB wide-integer results (HUGEINT
from ``//`` or SUM, un-CAST DECIMAL) render as float64/object through
pandas while Spark emits int64 — numerically equal (so value-parity tests
pass) but liable to hash differently in the driver's recorder. Cheap:
both sides are PLANNED only (Spark dtypes + DuckDB DESCRIBE), no rows.

Legacy exceptions: columns that already carry GREEN driver rows with
their current shapes (proven tolerated) are frozen in an allowlist —
do not add to it for NEW queries; fix the oracle's casts instead.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from inde1_spark.schemas import TESTDATA_TABLES
from tests.conftest import SF_SMOKE

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


# (query, column) -> proven-tolerated DuckDB type (green driver rows exist)
LEGACY_OK = {
    ("cluster_separation", "label"): "INTEGER",
    ("cluster_separation", "nearest_label"): "INTEGER",
    ("hourly_stats", "revenue"): "DECIMAL",
    ("conversion_lag_histogram", "bucket_id"): "INTEGER",
    ("value_histogram", "bucket_lo"): "DECIMAL",
    ("revenue_daily_model", "revenue_daily"): "DECIMAL",
}

# spark simpleString dtype -> acceptable DuckDB type names
COMPAT = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER", "BIGINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT", "DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
}


@pytest.fixture(scope="module")
def duck_types():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_SMOKE}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_oracle_types_match_spark(spark, duck_types, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    spark_types = dict(q(spark, SF_SMOKE).dtypes)
    duck = {
        r[0]: r[1]
        for r in duck_types.execute(f"DESCRIBE {sql}").fetchall()
    }
    assert set(duck) == set(spark_types), (
        f"{name}: column sets differ: {sorted(duck)} vs {sorted(spark_types)}"
    )
    for col, stype in spark_types.items():
        dtype = duck[col]
        base = dtype.split("(")[0]
        legacy = LEGACY_OK.get((name, col))
        if legacy and base == legacy:
            continue
        allowed = COMPAT.get(stype)
        if allowed is None:
            # complex types (arrays/structs/decimals emitted deliberately):
            # require the same base kind on both sides
            if stype.startswith("decimal"):
                assert base == "DECIMAL", (name, col, stype, dtype)
            elif stype.startswith("array"):
                assert dtype.endswith("[]"), (name, col, stype, dtype)
            continue
        assert base in allowed, (
            f"{name}.{col}: spark={stype} but oracle={dtype} — numerically "
            "equal values can hash differently through pandas; CAST the "
            "oracle column (HUGEINT//DECIMAL -> BIGINT, DECIMAL -> DOUBLE)"
        )


@pytest.mark.parametrize("name", sorted(entrymod.staged_queries()))
def test_staged_oracle_types_match_spark(spark, duck_types, name):
    """Same plans-only dtype sweep for the STAGED surface — the cheap
    always-on guard between the env-gated staged rehearsals, so a dtype
    drift in a staged twin fails every suite run, not just the
    pre-promotion checklist. No LEGACY_OK here by construction: staged
    ops are new and must be born clean."""
    q = entrymod.staged_queries()[name]
    sql = entrymod.staged_oracle_sql()[name]
    spark_types = dict(q(spark, SF_SMOKE).dtypes)
    duck = {
        r[0]: r[1]
        for r in duck_types.execute(f"DESCRIBE {sql}").fetchall()
    }
    assert set(duck) == set(spark_types), (
        f"{name}: column sets differ: {sorted(duck)} vs {sorted(spark_types)}"
    )
    for col, stype in spark_types.items():
        dtype = duck[col]
        base = dtype.split("(")[0]
        allowed = COMPAT.get(stype)
        if allowed is None:
            if stype.startswith("decimal"):
                assert base == "DECIMAL", (name, col, stype, dtype)
            elif stype.startswith("array"):
                assert dtype.endswith("[]"), (name, col, stype, dtype)
            continue
        assert base in allowed, (
            f"{name}.{col}: spark={stype} but oracle={dtype} — numerically "
            "equal values can hash differently through pandas; CAST the "
            "oracle column (HUGEINT//DECIMAL -> BIGINT, DECIMAL -> DOUBLE)"
        )
