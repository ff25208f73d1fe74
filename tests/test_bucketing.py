"""Scale-path evidence: bucketed fact tables eliminate the join shuffle.

DESIGN.md claims the orders<->lineitem exchange (the one unavoidable
shuffle in the Q3/Q5 shapes) disappears when both tables are bucketed on
the join key. This test proves it on the actual plan: same join, bucketed
vs unbucketed, exchange count 0 vs 2.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    from inde1_spark.sources.writers import materialize_bucketed

    wh = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    materialize_bucketed(
        orders, "orders_b", str(wh / "orders_b"), "o_orderkey", buckets=8
    )
    materialize_bucketed(
        lineitem, "lineitem_b", str(wh / "lineitem_b"), "l_orderkey", buckets=8
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _join_plan(spark, left, right):
    df = (
        left.join(right, left.l_orderkey == right.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    return df, df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_eliminates_shuffle(warehouse):
    spark = warehouse
    # disable auto-broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lb, ob = spark.table("lineitem_b"), spark.table("orders_b")
        df_b, plan_b = _join_plan(spark, lb, ob)

        lu = load_table(spark, SF_SMOKE, "lineitem")
        ou = load_table(spark, SF_SMOKE, "orders")
        df_u, plan_u = _join_plan(spark, lu, ou)

        # join-input exchanges: bucketed reads are pre-partitioned on the key
        ex_b = plan_b.count("Exchange hashpartitioning(l_orderkey")
        ex_b += plan_b.count("Exchange hashpartitioning(o_orderkey")
        ex_u = plan_u.count("Exchange hashpartitioning(l_orderkey")
        ex_u += plan_u.count("Exchange hashpartitioning(o_orderkey")
        assert ex_u >= 2, f"unbucketed join should shuffle both sides:\n{plan_u}"
        assert ex_b == 0, f"bucketed join must not shuffle its inputs:\n{plan_b}"

        # and the results agree
        got = {r["o_orderstatus"]: r["n"] for r in df_b.collect()}
        want = {r["o_orderstatus"]: r["n"] for r in df_u.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_clustered_layout_skips_files_on_range_filter(spark, tmp_path):
    """Range-clustering on ts means a narrow ts filter touches few files;
    the same data written round-robin spreads every range over all files."""
    from pyspark.sql import functions as F

    from inde1_spark.sources.writers import materialize_clustered

    events = load_table(spark, SF_SMOKE, "events")
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    cut = lo + (hi - lo) / 20  # ~5% slice of the time range

    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    materialize_clustered(events, clustered, "ts", n_files=8)
    events.repartition(8).write.parquet(scattered)

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .filter(F.col("ts") <= F.lit(cut))
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    assert files_touched(clustered) <= 2  # range-disjoint files -> skip
    assert files_touched(scattered) == 8  # every file holds every range
    # layout is lossless
    assert spark.read.parquet(clustered).count() == events.count()
