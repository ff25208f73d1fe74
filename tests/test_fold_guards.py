"""Scale-bound guards on the packed sequential folds (r06 verdict item 4).

The packed-fold recipe (dtw_entry_exit / holt_winters / burst_viterbi)
is only legitimate on BOUNDED daily-grid series: a misuse over a
per-second series would silently build a multi-GB single-task array and
churn the interpreted fold for hours. The guard turns that into an
immediate, named executor-side error. hitting_time_markov's horizon cap
turns the measured analyzer cliff (~20 s at 12 rounds vs >300 s at 30)
into a plan-build-time ValueError.

Tests trip the guards with a tiny ``max_fold_cells`` — the production
default (10^6 cells ~ 2700 years of days) is untouchable with testdata.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

from inde1_spark.sources.readers import load_table
from inde1_spark.operators.analytics import (
    HITTING_HORIZON_MAX,
    MAX_FOLD_CELLS,
    burst_viterbi,
    dtw_entry_exit,
    hitting_time_markov,
    holt_winters,
)


def _trips(df) -> bool:
    """True iff forcing the plan raises the guard's raise_error.

    collect(), not count(): Catalyst prunes an unused fold expression under
    count() — the guard fires exactly when the fold itself evaluates.
    """
    try:
        df.collect()
    except Exception as exc:  # Py4J wraps the SparkRuntimeException
        assert "packed fold input exceeds" in str(exc)
        return True
    return False


def test_dtw_guard_trips_on_tiny_bound(spark):
    events = load_table(spark, SF_SMOKE, "events")
    assert _trips(dtw_entry_exit(events, max_fold_cells=3))


def test_holt_winters_guard_trips_on_tiny_bound(spark):
    events = load_table(spark, SF_SMOKE, "events")
    assert _trips(holt_winters(events, max_fold_cells=3))


def test_burst_viterbi_guard_trips_on_tiny_bound(spark):
    events = load_table(spark, SF_SMOKE, "events")
    assert _trips(burst_viterbi(events, max_fold_cells=3))


def test_guards_pass_at_default_bound(spark):
    """The production bound never fires on real daily grids — outputs of
    all three folds still materialize (values pinned elsewhere by
    test_oracle_parity.py)."""
    events = load_table(spark, SF_SMOKE, "events")
    assert dtw_entry_exit(events).count() >= 1
    assert holt_winters(events, max_fold_cells=MAX_FOLD_CELLS).count() >= 1
    assert burst_viterbi(events).count() >= 1


def test_hitting_time_horizon_cap():
    with pytest.raises(ValueError, match="superlinear"):
        hitting_time_markov(None, horizon=HITTING_HORIZON_MAX + 1)


def test_hitting_time_default_inside_cap(spark):
    events = load_table(spark, SF_SMOKE, "events")
    assert hitting_time_markov(events).count() >= 1
