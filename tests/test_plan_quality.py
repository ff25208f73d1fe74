"""Plan-quality pins: a regression adding a shuffle or dropping a
broadcast/pushdown fails here, not in production."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from inde1_spark.plans.explain import assert_plan, plan_report
from tests.conftest import SF_SMOKE

Q = entrymod.queries()


def test_hourly_stats_single_pass(spark):
    # the flagship must stay scan -> one shuffle -> agg
    assert_plan(
        Q["hourly_stats"](spark, SF_SMOKE), max_exchanges=1, max_scans=1
    )


def test_pricing_summary_pushdown(spark):
    assert_plan(
        Q["pricing_summary"](spark, SF_SMOKE),
        max_exchanges=1,
        max_scans=1,
        require_pushed_filter="l_shipdate",
    )


def test_dimension_joins_broadcast(spark):
    # every dimension hop in the 5-way join broadcasts; no SMJ at this scale
    assert_plan(
        Q["revenue_by_nation"](spark, SF_SMOKE),
        require_broadcast_joins=3,
        forbid_sort_merge=True,
    )


def test_enrich_users_broadcast(spark):
    r = plan_report(Q["enrich_users"](spark, SF_SMOKE))
    assert r.broadcast_hash_joins == 1 and r.sort_merge_joins == 0


def test_cumulative_series_preaggregates(spark):
    # the unbounded window must sit above the aggregate (2 exchanges max:
    # daily agg + single-partition window), never over raw events
    assert_plan(Q["cumulative_series"](spark, SF_SMOKE), max_exchanges=2, max_scans=1)
