"""Shared pytest fixtures: one SparkSession per run + DuckDB oracle compare.

``assert_matches_oracle`` replicates the driver's correctness gate
(CORRECTNESS_r{N}.json): run the Spark query and the DuckDB SQL on the same
parquet tables, sort columns by name, compare row counts and values
order-insensitively and exactly (the driver hashes values, so approximate
equality is NOT good enough — tests fail where the gate would fail).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inde1_spark.schemas import TESTDATA_TABLES
from inde1_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="inde1-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def duck_with_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    s = _normalize(spark_pdf.copy())
    o = _normalize(oracle_pdf.copy())
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, ov)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"col {col}: {len(bad)}/{len(sv)} values differ; first at row {i}: "
                f"spark={x!r} oracle={y!r}"
            )
    return problems


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, duck_con=None) -> None:
    con = duck_con or duckdb.connect()
    duck_with_views(con, sf_dir)
    oracle_pdf = con.execute(sql).fetchdf()
    spark_pdf = spark_df.toPandas()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, "; ".join(problems)
