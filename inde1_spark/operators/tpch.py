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


def forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: pure filter-aggregate over the fact table.

    Every predicate (date range, discount band, quantity cap) pushes to the
    parquet reader, and only 4 columns survive pruning — at 100 TB this query
    is IO-bound on exactly the row groups the footer stats admit. Zero joins,
    one map-side-combined shuffle of a single decimal accumulator.
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


def order_priority_check(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: LEFT SEMI join (EXISTS) fact-to-fact.

    Orders in a quarter window that have at least one lineitem shipped after
    the order date, counted by priority. The semi join shuffles both sides on
    orderkey but materializes nothing from the probe side — Spark's
    LeftSemi hash join short-circuits on first match, so the lineitem side
    never inflates the output (the classic EXISTS-done-as-inner-join bug
    would double-count multi-line orders).
    """
    window = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = window.join(
        lineitem,
        (window.o_orderkey == lineitem.l_orderkey)
        & (lineitem.l_shipdate > window.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregation.

    How many customers placed exactly k non-urgent orders, including k=0 —
    the outer join is what keeps the zero bucket (an inner join silently
    drops order-less customers). First aggregate is per-customer (shuffles
    on custkey); the second groups the 1-row-per-customer result by count —
    tiny by construction, so its exchange is trivial at any scale.
    """
    filtered = orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        customer.join(
            filtered, customer.c_custkey == filtered.o_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: fact-dimension join + conditional-aggregate ratio.

    Share of September-1996 revenue from PROMO parts. part is broadcast here
    (tiny at test SF); at 100 TB part outgrows the broadcast threshold and
    AQE falls back to a shuffled hash join on partkey — the plan stays
    correct either way. The ratio divides two exact decimal sums as the
    final scalar op, so the output double is engine-identical.
    """
    month = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    joined = month.join(F.broadcast(part), month.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * dsum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0)))
            / dsum(disc_price)
        ).alias("promo_revenue_pct")
    )


def top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: aggregate + global-max selection (scalar subquery).

    Revenue per supplier over a quarter, then keep the supplier(s) whose
    revenue equals the global max — expressed as an unpartitioned max window
    over the aggregated (one row per supplier) relation, so the single-task
    window sees |suppliers| rows, not |lineitem| rows. Deterministic under
    ties: all max-revenue suppliers are returned (set semantics, like the
    spec's subquery), ordered output left to the driver's sort.
    """
    quarter = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = quarter.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    from pyspark.sql import Window

    best = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    return (
        best.join(F.broadcast(supplier), best.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery + LEFT ANTI join (NOT EXISTS).

    Well-funded customers (balance above the positive-balance average) with
    no order since 1999, grouped by market segment. The average is a 1-row
    aggregate cross-broadcast onto customer (scalar-subquery shape, no
    collect); the anti join shuffles on custkey and emits only unmatched
    build rows, and its date filter pushes to the orders scan. Average =
    exact decimal sum / count, divided in double — engine-identical, so the
    > comparison can't flip between engines.
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count("*")).alias("avg_bal")
    )
    rich = customer.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    no_orders = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return no_orders.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        dsum("c_acctbal").alias("totacctbal"),
    )


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
