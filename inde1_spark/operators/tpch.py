"""Volume-shaped analytics on the TPC-H-ish testdata tables.

These exercise the same operator shapes the reference needs (multi-way joins,
wide aggregation, top-k) at lineitem volume — the shapes that decide 100 TB
behavior. Plans are written so Catalyst produces:

- parquet scans with PushedFilters + pruned ReadSchema,
- broadcast hash joins for every dimension (region/nation/customer/part are
  tiny relative to the fact tables at any scale factor),
- single-shuffle hash aggregation with map-side partials,
- whole-stage codegen across the filter/project/agg pipeline.

Determinism note (the DuckDB oracle hash gate): per-row scalar arithmetic is
done in DOUBLE (IEEE — bit-identical in any engine), then cast to DECIMAL at
the SUM boundary so the aggregation is exact and order-independent (float
sums are not associative; partial-aggregate combine order varies run to run
and engine to engine), then cast back to DOUBLE for an engine-neutral output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dsum(expr: Column | str) -> Column:
    """Order-independent sum of a double expression via exact decimal."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(col.cast("decimal(18,6)")).cast("double")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: one-pass wide aggregation over the biggest table.

    The flagship 'is the engine sane' query: scan -> filter -> 8 aggregates,
    one shuffle. The date filter pushes to the parquet reader.
    """
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (dsum("l_discount") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def top_revenue_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 10
) -> DataFrame:
    """TPC-H Q3 shape: fact-fact join + dimension filter + top-k.

    customer (filtered segment, broadcast) x orders x lineitem; revenue per
    order; deterministic top-k via (revenue desc, orderkey asc). The
    orders<->lineitem join shuffles both sides on orderkey — at 100 TB this
    is the dominant exchange, so both tables should be bucketed on orderkey
    in a real deployment (see DESIGN.md).
    """
    cust = customer.filter(F.col("c_mktsegment") == "BUILDING")
    revenue = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    return revenue.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc()).limit(k)


def revenue_by_nation(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: 5-way join through the region>nation hierarchy.

    All dimension hops broadcast; only the orders<->lineitem join shuffles.
    """
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )
