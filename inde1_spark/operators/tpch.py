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


def cross_nation_volume(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: volume shipped between two nations, by direction/year.

    The double-dimension-hop join (supplier->nation and customer->nation on
    the SAME tiny table, aliased twice) with a symmetric pair filter. Both
    nation hops broadcast; the only corpus-volume exchange remains
    orders<->lineitem on orderkey. The pair filter runs AFTER the broadcast
    joins but on broadcast-resolved columns, so it costs one row-local
    predicate — no shuffle is spent discarding the other nation pairs.
    """
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == nation_a)
                & (F.col("cust_nation") == nation_b)
            )
            | (
                (F.col("supp_nation") == nation_b)
                & (F.col("cust_nation") == nation_a)
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def nation_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    target_nation: str = "NATION_1",
    target_region: str = "ASIA",
) -> DataFrame:
    """TPC-H Q8 shape: market share — a conditional-sum ratio per year.

    Revenue delivered into a customer region, split by whether the SUPPLIER
    sits in the target nation: share(year) = sum(rev if supp_nation=T) /
    sum(rev). Both sums are exact decimal accumulations; the share divides
    the two resulting doubles once, so the ratio is engine-identical
    without any integer-ratio machinery. Joins: the region>nation>customer
    chain and the supplier->nation hop all broadcast.
    """
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("r_name") == target_region)
        .groupBy(F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(
            dsum(
                F.when(F.col("supp_nation") == target_nation, rev).otherwise(
                    F.lit(0.0)
                )
            ).alias("target_rev"),
            dsum(rev).alias("total_rev"),
        )
        .select(
            "o_year",
            "target_rev",
            "total_rev",
            (F.col("target_rev") / F.col("total_rev")).alias("mkt_share"),
        )
    )


def product_type_profit(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    p_type: str = "STANDARD",
) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year.

    profit = disc revenue - retail cost of goods (the schema has no
    partsupp table, so p_retailprice * quantity stands in for
    ps_supplycost — same join/agg shape, documented deviation). The part
    filter broadcasts and prunes the fact rows before the orders join;
    decimal sums keep signed profit exact.
    """
    amount = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    filtered_part = part.filter(F.col("p_type") == p_type)
    return (
        lineitem.join(
            F.broadcast(filtered_part), lineitem.l_partkey == part.p_partkey
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
    )


def returned_item_losses(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top customers by returned-merchandise revenue.

    Quarter of orders x returned lines (l_returnflag = 'R'), revenue per
    customer, deterministic top-k (revenue desc, custkey asc). The
    returnflag filter prunes the fact scan; customer/nation broadcast; the
    orderkey join is the one large exchange.
    """
    quarter = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = lineitem.filter(F.col("l_returnflag") == "R")
    return (
        returned.join(quarter, returned.l_orderkey == quarter.o_orderkey)
        .join(F.broadcast(customer), quarter.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def late_shipment_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape: late-shipment audit by priority class.

    Lines shipped more than 90 days after their order date during 1996,
    counted per linestatus with urgent/high priority split out (the schema
    has no shipmode/commitdate; shipdate-vs-orderdate lateness against
    linestatus keeps the join + dual-conditional-count shape). One
    orderkey join; both counts ride one aggregation pass.
    """
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
    )
    return joined.groupBy("l_linestatus").agg(
        F.count(F.when(high, 1)).alias("high_line_count"),
        F.count(F.when(~high, 1)).alias("low_line_count"),
    )


def small_qty_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1"
) -> DataFrame:
    """TPC-H Q17 shape: per-part average threshold + self-referential filter.

    Average yearly revenue lost if small-quantity orders (below half the
    part's average quantity) moved to bulk: the per-part avg is an
    aggregate over the SAME fact rows the filter scans — spelled as agg +
    re-join on partkey (the aggregate-pushdown shape), never a correlated
    per-row subquery. The brand filter broadcasts and prunes both sides.
    avg = exact decimal sum / count, so the 0.5*avg threshold is
    engine-identical.
    """
    branded = part.filter(F.col("p_brand") == brand)
    fact = lineitem.join(
        F.broadcast(branded), lineitem.l_partkey == part.p_partkey
    )
    per_part = fact.groupBy(F.col("l_partkey").alias("pk")).agg(
        (dsum("l_quantity") / F.count("*")).alias("avg_qty")
    )
    small = fact.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("pk")
    ).filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
    return small.agg(
        (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly")
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = 200,
    k: int = 10,
) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a fact aggregate + enrich + top-k.

    Orders whose total quantity exceeds ``min_qty``: aggregate lineitem by
    orderkey FIRST (map-side partials collapse each order's lines before
    the exchange), filter on the sum, then join the order/customer detail
    onto the few survivors — the join input is |qualifying orders|, not
    |lineitem|. Deterministic top-k on (totalprice desc, orderkey asc).
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > F.lit(float(min_qty)))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            F.col("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def brand_filtered_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-table predicate (OR of ANDs).

    Three brand/size/quantity bands OR-ed together across the part
    dimension and the fact table — the predicate-pushdown stress test: the
    quantity bounds (the only fact-side conjuncts common to all branches)
    push to the lineitem scan, the rest evaluates row-local after the
    broadcast join; nothing falls back to a nested-loop.
    """
    q = F.col("l_quantity")
    sz = F.col("p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & sz.between(1, 15)
            & q.between(1.0, 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & sz.between(10, 30)
            & q.between(10.0, 30.0)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & sz.between(20, 50)
            & q.between(20.0, 50.0)
        )
    )
    return (
        lineitem.filter(q.between(1.0, 50.0))
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def min_cost_supplier(
    part: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part (the correlated scalar
    subquery), spelled as a window min.

    The testdata has no partsupp table (reference parity note), so the
    observed average sale price per (part, supplier) from lineitem stands in
    for ps_supplycost — the plan shape is identical: build the per-(part,
    supplier) cost table once, then pick each part's min-cost row with a
    window instead of re-running a correlated subquery per part (the
    rewrite every engine does to Q2). Cost is an exact integer-scaled
    ratio (cents x 10^4 per unit), so the min and its tie-break
    (suppkey asc) are engine-deterministic. Region filter prunes the
    supplier side before the fact join; dimensions broadcast.
    """
    from pyspark.sql import Window
    from inde1_spark.functions.exprs import ratio_scaled

    eur_supp = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    brass = part.filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_brand")
    cost = (
        lineitem.join(F.broadcast(brass), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(eur_supp), lineitem.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            # explicit round before the long cast: Spark CAST(double AS
            # BIGINT) truncates while DuckDB rounds — round() agrees
            ratio_scaled(
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")),
                F.sum(F.round(F.col("l_quantity"), 0).cast("long")),
                4,
            ).alias("cost_scaled")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("cost_scaled").asc(), F.col("s_suppkey").asc()
    )
    return (
        cost.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_brand",
            "s_suppkey",
            "s_name",
            "n_name",
            "cost_scaled",
        )
        .orderBy(F.col("p_partkey").asc())
        .limit(k)
    )


def supplier_count_by_part_attr(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per part attribute, with an
    excluded-supplier anti-join.

    How many distinct suppliers ship each (brand, size band): the
    distinct aggregate every catalog query needs. Suppliers in deficit
    (s_acctbal < 0 — the stand-in for Q16's complaints list; no comment
    column in the schema) are removed with an ANTI join before counting,
    and one brand is excluded by predicate — both prune BEFORE the
    count-distinct shuffle. The lineitem bridge stands in for partsupp
    (no such table in the testdata). count(DISTINCT) shuffles (attrs,
    suppkey) once, then counts per attrs — two-phase, no row explosion.
    """
    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    sized = part.filter(F.col("p_brand") != "Brand#1").select(
        "p_partkey",
        "p_brand",
        (F.floor(F.col("p_size") / 10) * 10).cast("long").alias("size_band"),
    )
    bridged = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(sized), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        bridged.groupBy("p_brand", "size_band")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def excess_qty_suppliers(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding an outsized share of a part's
    flow (the nested IN-subquery chain, spelled as pre-aggregate + join).

    A supplier qualifies if for some CONTESTED part (>= 2 suppliers that
    year) they shipped more than 75% of the part's total 1996 volume.
    Both sides of the comparison are aggregates over the same fact rows:
    per-(part, supplier) sums and per-part totals, joined on partkey —
    never a correlated subquery per supplier. Quantities are
    integer-valued doubles, summed as longs, so the 75% threshold
    (spelled x4 > total x3, integer math) is exact. The year filter
    pushes to the scan; the qualifying pair set collapses to DISTINCT
    suppliers before the name join (semi-join shape).
    """
    year = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_quantity"), 0).cast("long").alias("q"),
    )
    per_pair = year.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("q").alias("supp_qty")
    )
    per_part = year.groupBy("l_partkey").agg(
        F.sum("q").alias("part_qty"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    hot = (
        per_pair.join(per_part, "l_partkey")
        .filter(
            (F.col("n_supp") >= 2)
            & (F.col("supp_qty") * 4 > F.col("part_qty") * 3)
        )
        .select("l_suppkey")
        .distinct()
    )
    # no trailing orderBy: the result is a set (the gate compares
    # order-insensitively) and an unlimited global sort is a pure wasted
    # range-partition exchange on the hot path
    return (
        hot.join(supplier, hot.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


def sole_late_supplier(
    orders: DataFrame, lineitem: DataFrame, supplier: DataFrame, k: int = 20
) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS / NOT-EXISTS double correlation —
    suppliers who were the ONLY late shipper in a multi-supplier order.

    The schema has no commitdate/receiptdate, so "late" is shipped more
    than 60 days after the order date. Q21's two correlated subqueries
    (another supplier exists in the order; no other supplier was late)
    collapse into per-order aggregates: distinct suppliers and distinct
    LATE suppliers per order, computed in one pass over the joined fact.
    An order contributes iff n_supp >= 2 and n_late_supp == 1, and the
    blame lands on that one late supplier (max of the late-only key —
    exact, since there is exactly one). No self-join of lineitem against
    itself, no per-row subquery: two aggregate shuffles on orderkey.
    """
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_orderstatus") == "F")
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
    )
    per_order = joined.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
        F.max(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    blamed = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return (
        blamed.groupBy("late_supp")
        .agg(F.count("*").cast("long").alias("numwait"))
        .join(F.broadcast(supplier), F.col("late_supp") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(k)
    )


def nation_stock_value(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    target_nation: str = "NATION_3",
    fraction_ppm: int = 1000,
) -> DataFrame:
    """TPC-H Q11 shape: parts holding an outsized share of one nation's
    inventory value (the HAVING-vs-global-scalar-subquery query).

    The testdata has no partsupp, so per-part shipped value
    (sum of extendedprice, in exact cents) from the target nation's
    suppliers stands in for supplycost x availqty — the plan shape is
    Q11's: aggregate once per part, derive the global threshold FROM THE
    SAME bounded per-part table (a second tiny aggregate, broadcast as a
    one-row cross join), and filter — the fact table is scanned exactly
    once, and the correlated scalar subquery every engine rewrites into
    that broadcast never re-runs per group. A part qualifies if its value
    exceeds ``fraction_ppm`` parts-per-million of the nation total,
    compared in exact integer cross-multiplication (value x 1e6 >
    total x ppm; cents sums are exact longs via decimal accumulation —
    DESIGN §3 wide-sum rule). share_ppm (exact integer division) gives
    relative weight without a float ratio.

    Reference parity: the reference exposes this shape through its SQL
    surface (SURVEY §2 free-join/agg rows); scale note: the nation filter
    prunes the supplier dim BEFORE the fact join (broadcast), so the
    shuffle carries only the target nation's rows.
    """
    nat_supp = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .filter(F.col("n_name") == target_nation)
        .select("s_suppkey")
    )
    per_part = (
        lineitem.join(F.broadcast(nat_supp), lineitem.l_suppkey == F.col("s_suppkey"))
        .select(
            "l_partkey",
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("l_partkey")
        .agg(F.sum(F.col("cents").cast("decimal(38,0)")).cast("long").alias("value_cents"))
    )
    # the global total as an unbounded window over the BOUNDED per-part
    # table (one single-partition exchange of n_parts tiny rows), not a
    # second aggregate branch — the agg+cross-join spelling duplicates the
    # whole fact subtree in the plan (ReuseExchange dedupes the shuffle at
    # runtime but the scan still plans twice; the transition_matrix lesson)
    from pyspark.sql import Window

    total_w = F.sum(F.col("value_cents").cast("decimal(38,0)")).over(
        Window.partitionBy()
    ).cast("long")
    # decimal(38,0) cross-multiplication: value_cents x 1e6 overflows LONG
    # once a part's value passes ~9e12 cents (certain at corpus scale);
    # Spark ANSI would throw, DuckDB's BIGINT*BIGINT hard-errors — the
    # wide-integer promotion sidesteps both (DESIGN §3)
    v_dec = F.col("value_cents").cast("decimal(38,0)")
    t_dec = F.col("total_cents").cast("decimal(38,0)")
    return (
        per_part.withColumn("total_cents", total_w)
        .filter(v_dec * 1_000_000 > t_dec * fraction_ppm)
        .select(
            "l_partkey",
            "value_cents",
            # exact integer quotient (values nonneg, so truncation ==
            # floor == DuckDB HUGEINT //)
            F.expr(
                "CAST(CAST(value_cents AS DECIMAL(38,0)) * 1000000"
                " DIV CAST(total_cents AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


def cube_returnflag_status(lineitem: DataFrame) -> DataFrame:
    """Full CUBE over (l_returnflag, l_linestatus): every grouping set —
    per cell, per flag, per status, and grand total — in ONE aggregation
    pass. The grouping-sets completion of the OLAP surface next to the
    hierarchy ROLLUP (``rollup_nation_region``): a BI layer points its
    cross-tab straight at this, with ``grouping_id`` distinguishing the
    margin rows from the cells.

    Plan: Spark expands the cube into one Expand + single shuffle with
    map-side partial aggregation — 4x the cell keys (all bounded here:
    |flags| x |status| is single digits), never 4 corpus scans. Sums are
    the exact decimal contract.
    """
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_price"),
            F.grouping_id().cast("long").alias("grouping_id"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "grouping_id",
            "n_items",
            "sum_qty",
            "sum_price",
        )
        .orderBy("grouping_id", "returnflag", "linestatus")
    )
