"""Generic asof_join semantics: direction, strictness, ties, tolerance.

Planted micro-data covers the branches the synthetic tables can't: exact
timestamp ties between probe and carry, duplicate carry timestamps (the
deterministic tie-winner), keys with no carry rows, tolerance cutoffs.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.operators.joins import asof_join


@pytest.fixture(scope="module")
def tj(spark):
    def ts(sec):
        return f"2024-01-01 00:00:{sec:02d}"

    right = spark.createDataFrame(
        [("a", ts(10), 1), ("a", ts(10), 2), ("a", ts(20), 3), ("b", ts(7), 9)],
        "k string, t string, rid long",
    ).withColumn("t", F.to_timestamp("t"))
    left = spark.createDataFrame(
        [("a", ts(5), 100), ("a", ts(10), 101), ("a", ts(25), 102), ("c", ts(9), 103)],
        "k string, t string, lid long",
    ).withColumn("t", F.to_timestamp("t"))
    return left, right


def _got(df):
    return {
        r["lid"]: r["asof_rid"]
        for r in df.select("lid", "asof_rid").collect()
    }


def test_backward_inclusive_with_ties(spark, tj):
    left, right = tj
    out = asof_join(left, right, "k", "t", "t", ("rid",), left_order="lid")
    # t=10 tie: probe sees equal-ts carries, max rid wins among the tie pair
    assert _got(out) == {100: None, 101: 2, 102: 3, 103: None}
    assert out.count() == left.count()  # left-outer: every probe survives once


def test_backward_strict_excludes_equal_ts(spark, tj):
    left, right = tj
    out = asof_join(left, right, "k", "t", "t", ("rid",), strict=True, left_order="lid")
    assert _got(out) == {100: None, 101: None, 102: 3, 103: None}


def test_forward_inclusive_and_strict(spark, tj):
    left, right = tj
    fwd = asof_join(
        left, right, "k", "t", "t", ("rid",), direction="forward", left_order="lid"
    )
    assert _got(fwd) == {100: 2, 101: 2, 102: None, 103: None}
    fwd_s = asof_join(
        left, right, "k", "t", "t", ("rid",),
        direction="forward", strict=True, left_order="lid",
    )
    assert _got(fwd_s) == {100: 2, 101: 3, 102: None, 103: None}


def test_backward_tolerance(spark, tj):
    left, right = tj
    out = asof_join(
        left, right, "k", "t", "t", ("rid",), tolerance_sec=3, left_order="lid"
    )
    # probe t=25 matches carry t=20 but the 5s gap exceeds tolerance
    assert _got(out) == {100: None, 101: 2, 102: None, 103: None}


def test_asof_plan_no_cartesian(spark, tj):
    left, right = tj
    plan = asof_join(
        left, right, "k", "t", "t", ("rid",), left_order="lid"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
