"""Classic decision-support query shapes (TPC-H Q2–Q22 adaptations).

The reference's gold marts (db_notebooks/07–09) are simple star-join
aggregates; a user replacing it with this engine will immediately write
the harder shapes every BI workload contains — correlated subqueries,
EXISTS/NOT EXISTS, scalar-subquery thresholds, disjunctive predicates,
conditional ratios, argmin-per-group. This module registers one gate
query per classic TPC-H pattern not already covered elsewhere
(Q1=pricing_summary, Q5=regional_local_supplier_revenue,
Q13=customer_order_histogram, Q18=big_basket_orders,
Q21=fully_shipped_multisupplier_orders live in other modules; Q17 is
DELIBERATELY registered twice — more.small_quantity_orders pins the
exact-decimal threshold spelling, q17_small_quantity_revenue the
benched revenue-total spelling — r5 review note), each
adapted to the columns the driver testdata actually has (no partsupp,
no commitdate/receiptdate/shipmode/phone — substitutions documented
per query).

Determinism strategy for the differential gate: every float aggregate
uses exact decimal accumulation (registry.dec_sum) and every
*comparison against an aggregate* (avg thresholds, max selection) is
multiplied through so both sides are exact decimals or integers —
``x < avg(y)*f`` becomes ``x * n * d < sum(y) * f_num`` — because a
double-rounded threshold can flip a boundary row differently in the
two engines; an exact comparison cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import (
    dec_sum,
    register,
    table,
)

REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {dec_sum(REV)} AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
    doc=(
        "TPC-H Q3 (shipping priority): revenue still in flight — ordered "
        "before a cutoff but shipped after it — for one market segment, "
        "top-10 orders. Plan: both date predicates push into their scans "
        "(orders AND lineitem pruned before the join), the segment "
        "filter reduces customer to a broadcast, and the top-10 is "
        "TakeOrderedAndProject (per-partition heaps, no global sort). "
        "Tie-break on l_orderkey makes the LIMIT deterministic."
    ),
    tags=("join", "agg", "sort", "tpch"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "1998-06-01"
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.expr(dec_sum(REV)).alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    doc=(
        "TPC-H Q4 (order priority checking): orders in a half-year "
        "window having at least one lineitem shipped more than 60 days "
        "after the order date (the testdata has no "
        "commitdate/receiptdate, so 'late' is shipdate vs orderdate+60). "
        "The correlated EXISTS compiles to a LEFT SEMI join — one probe "
        "per order regardless of how many lineitems are late, so the "
        "semi join's output (and the following aggregate's input) is "
        "bounded by the orders side at any scale."
    ),
    tags=("join", "subquery", "tpch"),
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q6_forecast_revenue_delta",
    oracle=f"""
    SELECT {dec_sum("l_extendedprice * l_discount", inner_scale=6)} AS revenue_delta,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6 (forecasting revenue change): a pure scan-side query — "
        "three conjunctive range predicates and a global two-column "
        "aggregate, no join, no groupBy shuffle (partial aggregates "
        "combine map-side into a single-row exchange). All three "
        "predicates push into the parquet scan; at 100 TB this is the "
        "shape that proves predicate pushdown + column pruning carry the "
        "whole query (2 columns read of 11)."
    ),
    tags=("agg", "scan", "tpch"),
)
def q6_forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(dec_sum("l_extendedprice * l_discount", inner_scale=6)).alias(
                "revenue_delta"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           {dec_sum(REV)} AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc=(
        "TPC-H Q7 (volume shipping): cross-border trade volume between "
        "every (supplier nation, customer nation) pair per ship year. "
        "The nation dimension joins twice under different aliases "
        "(supplier side and customer side) — both broadcast — and the "
        "inequality ns<>nc is applied post-broadcast, row-local. The "
        "only shuffles are lineitem⋈orders and the final 3-key group; "
        "output cardinality is bounded by nations² × years regardless "
        "of fact size."
    ),
    tags=("join", "agg", "tpch"),
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    ns = nation.alias("ns")
    nc = nation.alias("nc")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))
        .filter(F.col("ns.n_nationkey") != F.col("nc.n_nationkey"))
    )
    return joined.groupBy(
        F.col("ns.n_name").alias("supp_nation"),
        F.col("nc.n_name").alias("cust_nation"),
        F.year("l_shipdate").cast("long").alias("ship_year"),
    ).agg(F.expr(dec_sum(REV)).alias("volume"))


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_nations AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
               ns.n_name AS supp_nation,
               CAST(({REV}) AS DECIMAL(18,6)) AS volume
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
        JOIN region r   ON nc.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT order_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                               THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_nations
    GROUP BY order_year
    """,
    doc=(
        "TPC-H Q8 (national market share): the share of one supplier "
        "nation in revenue delivered into one region, per year — a "
        "conditional-sum ratio over a 6-way join. Both numerator and "
        "denominator accumulate as exact decimals in the SAME aggregate "
        "pass (sum(CASE)/sum), so the ratio is one shuffle, not two "
        "queries; the double division of two exact decimals is "
        "bit-identical across engines. The customer-side region filter "
        "prunes before the supplier join."
    ),
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = nation.alias("nc")
    ns = nation.alias("ns")
    vol = F.expr(f"CAST(({REV}) AS DECIMAL(18,6))")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))
        .join(F.broadcast(region), F.col("nc.n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey"))
    )
    grouped = joined.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year")
    ).agg(
        F.sum(
            F.when(F.col("ns.n_name") == "NATION_3", vol).otherwise(
                F.expr("CAST(0 AS DECIMAL(18,6))")
            )
        ).alias("num"),
        F.sum(vol).alias("den"),
    )
    return grouped.select(
        "order_year",
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("mkt_share"),
    )


@register(
    "q9_profit_by_nation_year",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           {dec_sum("l.l_extendedprice * (1 - l.l_discount)"
                    " - 0.6 * p.p_retailprice * l.l_quantity")} AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    doc=(
        "TPC-H Q9 (product-type profit): profit per supplier nation per "
        "year for one product family. The testdata has no partsupp, so "
        "ps_supplycost*quantity is substituted by a cost proxy "
        "0.6*p_retailprice*l_quantity — the shape (5-way join, LIKE "
        "filter on the part dimension, two-key group) is unchanged. The "
        "LIKE prunes part BEFORE the fact join, shrinking it to a "
        "broadcast; profit terms accumulate as exact decimals."
    ),
    tags=("join", "agg", "tpch"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").alias("ns")
    o = table(spark, sf_dir, "orders")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return joined.groupBy(
        F.col("ns.n_name").alias("supp_nation"),
        F.year("o_orderdate").cast("long").alias("order_year"),
    ).agg(
        F.expr(
            dec_sum(
                "l_extendedprice * (1 - l_discount)"
                " - 0.6 * p_retailprice * l_quantity"
            )
        ).alias("profit")
    )


@register(
    "q10_returned_revenue_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {dec_sum(REV)} AS lost_revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    doc=(
        "TPC-H Q10 (returned-item reporting): the 20 customers who "
        "returned the most revenue in one quarter. The returnflag "
        "equality pushes into the lineitem scan and the date range into "
        "orders — both facts shrink before their join; the top-20 is "
        "TakeOrderedAndProject with a custkey tie-break."
    ),
    tags=("join", "agg", "sort", "tpch"),
)
def q10_returned_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(F.expr(dec_sum(REV)).alias("lost_revenue"))
        .select("c_custkey", "c_name", "lost_revenue", "c_acctbal", "nation")
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH part_value AS (
        SELECT l_partkey,
               sum(CAST(({REV}) AS DECIMAL(18,6))) AS val
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(round(val, 2) AS DOUBLE) AS part_value
    FROM part_value
    WHERE val * 2000 > (SELECT sum(val) FROM part_value)
    """,
    doc=(
        "TPC-H Q11 (important stock): parts whose revenue exceeds "
        "1/2000 of global revenue — a scalar-subquery threshold over a "
        "grouped aggregate (partsupp is absent; lineitem revenue stands "
        "in for stock value, same shape). The threshold comparison is "
        "multiplied through (val*2000 > total) so both sides stay exact "
        "decimals — no double rounding can flip a boundary part. Spark "
        "plans the scalar total as a broadcast-joined single-row "
        "aggregate over the SAME grouped frame (self-reuse via cache), "
        "so the fact scans once."
    ),
    tags=("agg", "subquery", "tpch"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_partkey")
        .agg(F.sum(F.expr(f"CAST(({REV}) AS DECIMAL(18,6))")).alias("val"))
        .cache()
    )
    total = pv.agg(F.sum("val").alias("total"))
    out = (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("val") * 2000 > F.col("total"))
        .select(
            "l_partkey", F.round("val", 2).cast("double").alias("part_value")
        )
    )
    out._cached_deps = [pv]  # released by the harness/caller post-action
    return out


@register(
    "q14_promo_revenue_ratio",
    oracle=f"""
    SELECT CAST(year(l.l_shipdate) AS BIGINT)  AS ship_year,
           CAST(month(l.l_shipdate) AS BIGINT) AS ship_month,
           round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(({REV}) AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6))
                 END) AS DOUBLE)
                 / CAST(sum(CAST(({REV}) AS DECIMAL(18,6))) AS DOUBLE),
                 6) AS promo_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
    """,
    doc=(
        "TPC-H Q14 (promotion effect): the percentage of each month's "
        "revenue coming from promotional parts — numerator and "
        "denominator in one aggregate pass (sum(CASE)/sum of exact "
        "decimals, divided as doubles). part joins as a broadcast; the "
        "ship-date year pushes into the fact scan."
    ),
    tags=("join", "agg", "tpch"),
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = table(spark, sf_dir, "part")
    vol = F.expr(f"CAST(({REV}) AS DECIMAL(18,6))")
    grouped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("long").alias("ship_year"),
            F.month("l_shipdate").cast("long").alias("ship_month"),
        )
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", vol).otherwise(
                    F.expr("CAST(0 AS DECIMAL(18,6))")
                )
            ).alias("num"),
            F.sum(vol).alias("den"),
        )
    )
    return grouped.select(
        "ship_year",
        "ship_month",
        F.round(
            F.lit(100.0) * F.col("num").cast("double") / F.col("den").cast("double"),
            6,
        ).alias("promo_share_pct"),
    )


@register(
    "q15_top_suppliers",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey,
               sum(CAST(({REV}) AS DECIMAL(18,6))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM revenue r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    """,
    doc=(
        "TPC-H Q15 (top supplier): supplier(s) achieving the maximum "
        "quarterly revenue — the view + scalar-max shape. The maximum "
        "is selected by equality on the EXACT decimal revenue (never "
        "the rounded double), so ties and boundaries are engine- "
        "independent; Spark broadcasts the single-row max back onto the "
        "cached per-supplier aggregate instead of a global-window sort."
    ),
    tags=("agg", "subquery", "tpch"),
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.expr(f"CAST(({REV}) AS DECIMAL(18,6))")).alias("total_rev"))
        .cache()
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    out = (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )
    out._cached_deps = [rev]  # released by the harness/caller post-action
    return out


@register(
    "q16_supplier_diversity",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type  <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0
                                AND s_suppkey IS NOT NULL)
    GROUP BY 1, 2, 3
    """,
    doc=(
        "TPC-H Q16 (parts/supplier relationship): how many distinct "
        "suppliers ship each (brand, type, size) bucket, excluding one "
        "brand, one type, and suppliers on a complaint list (adapted: "
        "negative account balance — the testdata has no comment "
        "column). NULL-safety (r5 review): NOT IN is null-AWARE — one "
        "NULL in the subquery empties the whole result — while LEFT "
        "ANTI is null-REJECTING, so the two only coincide when the "
        "complaint keys are non-null; the subquery (and the Spark "
        "build side) filter NULL keys explicitly to pin that shared "
        "semantics instead of relying on the data. The anti join "
        "broadcasts (the complaint list is dimension-sized); the part "
        "predicates prune the broadcast dimension before the fact join."
    ),
    tags=("join", "agg", "subquery", "tpch"),
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    complaints = (
        table(spark, sf_dir, "supplier")
        .filter((F.col("s_acctbal") < 0) & F.col("s_suppkey").isNotNull())
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(complaints),
            li.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH part_qty AS (
        SELECT l_partkey,
               sum(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT {dec_sum("l.l_extendedprice")} AS total_small_qty_revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN part_qty q ON q.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#7'
      AND CAST(l.l_quantity AS DECIMAL(18,6)) * 5 * q.n < q.sum_qty
    """,
    doc=(
        "TPC-H Q17 (small-quantity-order revenue): revenue from "
        "lineitems whose quantity is below 20% of the part's average "
        "quantity — the correlated-average shape. The avg comparison is "
        "multiplied through (qty*5*n < sum_qty) so it stays exact "
        "decimal×integer — a double-rounded average threshold could "
        "flip boundary rows differently per engine. The correlated "
        "subquery decorrelates to one extra group-aggregate of the SAME "
        "fact + an equi-join on partkey; at 100 TB both sides partition "
        "on partkey so the join adds no extra shuffle of the fact."
    ),
    tags=("join", "agg", "subquery", "tpch"),
    bench=True,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#7")
    qty = li.groupBy(F.col("l_partkey").alias("q_partkey")).agg(
        F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,6))")).alias("sum_qty"),
        F.count("*").alias("n"),
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(qty, li.l_partkey == qty.q_partkey)
        .filter(
            F.expr("CAST(l_quantity AS DECIMAL(18,6))") * 5 * F.col("n")
            < F.col("sum_qty")
        )
        .agg(
            F.expr(dec_sum("l_extendedprice")).alias("total_small_qty_revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q19_disjunctive_brackets",
    oracle=f"""
    SELECT {dec_sum(REV)} AS revenue, count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    doc=(
        "TPC-H Q19 (discounted revenue): a disjunction of three "
        "conjunctive brackets spanning BOTH join sides. Catalyst "
        "extracts the common sub-predicates per side (brand IN "
        "(1,2,3)-ish on part, quantity<=30 on lineitem) and pushes them "
        "into the scans even though the full predicate only resolves "
        "after the join — the classic test that disjunctive pushdown "
        "works; the residual OR evaluates post-join, row-local."
    ),
    tags=("join", "scan", "tpch"),
)
def q19_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    qty = F.col("l_quantity")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & qty.between(20, 30)
        )
    )
    return joined.filter(bracket).agg(
        F.expr(dec_sum(REV)).alias("revenue"), F.count("*").alias("n_items")
    )


@register(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH avg_bal AS (
        SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS n
        FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name AS nation,
           count(*) AS numcust,
           {dec_sum("c.c_acctbal", inner_scale=2)} AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    CROSS JOIN avg_bal a
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * a.n > a.s
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    """,
    doc=(
        "TPC-H Q22 (global sales opportunity): customers with "
        "above-average positive balances and no RECENT order (every "
        "testdata customer has ordered at least once, so 'lapsed since "
        "2000' replaces 'never ordered'; the testdata also has no phone "
        "column, so nation replaces the country code). Two subquery "
        "flavors in one query: a scalar average (multiplied through to "
        "an exact decimal comparison, acctbal*n > sum) and a NOT EXISTS "
        "anti-join against date-filtered orders. The anti-join needs "
        "only orders' o_custkey after a pushed date predicate — at "
        "scale that is one pruned column of the fact, not a wide scan."
    ),
    tags=("join", "agg", "subquery", "tpch"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(F.expr("CAST(c_acctbal AS DECIMAL(18,2))")).alias("s"),
            F.count("*").alias("n_pos"),
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.expr("CAST(c_acctbal AS DECIMAL(18,2))") * F.col("n_pos") > F.col("s"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.expr(dec_sum("c_acctbal", inner_scale=2)).alias("totacctbal"),
        )
    )


@register(
    "q2_cheapest_supplier_per_part",
    oracle=f"""
    WITH per_pair AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(({REV}) AS DECIMAL(18,6))) AS pair_rev
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
        SELECT l_partkey, l_suppkey, pair_rev,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY pair_rev ASC, l_suppkey ASC) AS rn
        FROM per_pair
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS supp_nation,
           CAST(round(r.pair_rev, 2) AS DOUBLE) AS cheapest_volume
    FROM ranked r
    JOIN part p     ON p.p_partkey = r.l_partkey
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE r.rn = 1 AND p.p_size = 25 AND p.p_type = 'STANDARD'
    """,
    doc=(
        "TPC-H Q2 (minimum-cost supplier): for each part in a "
        "size/type family, the supplier with the LOWEST total trade "
        "volume (partsupp/supplycost absent; per-pair lineitem revenue "
        "stands in — same correlated-minimum-per-group shape). "
        "Implemented as argmin-per-group: aggregate to (part, supplier) "
        "pairs, then a partkey-partitioned row_number over the exact "
        "decimal — ordering on the rounded double would make rank ties "
        "engine-dependent. The final dimension joins all broadcast."
    ),
    tags=("join", "window", "subquery", "tpch"),
)
def q2_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 25) & (F.col("p_type") == "STANDARD")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.expr(f"CAST(({REV}) AS DECIMAL(18,6))")).alias("pair_rev")
    )
    # prune to surviving parts BEFORE the window (r5 review): the rank
    # within a partkey partition is independent of other partitions, so
    # semi-joining the filtered part dim first drops ~98% of the window
    # shuffle/sort at TPC-H part-predicate selectivity — the dominant
    # cost at scale — without changing any rank
    pair = pair.join(
        F.broadcast(p.select("p_partkey")),
        pair.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("pair_rev"), F.asc("l_suppkey")
    )
    ranked = pair.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        ranked.join(F.broadcast(p), ranked.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ranked.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            F.round("pair_rev", 2).cast("double").alias("cheapest_volume"),
        )
    )


@register(
    "q20_dominant_part_suppliers",
    oracle="""
    WITH pair AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS DECIMAL(18,6))) AS q
        FROM lineitem GROUP BY 1, 2
    ),
    tot AS (SELECT l_partkey, sum(q) AS tq FROM pair GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, n.n_name AS supp_nation,
           count(*) AS n_dominated_parts
    FROM pair p
    JOIN tot t      ON p.l_partkey = t.l_partkey
    JOIN supplier s ON s.s_suppkey = p.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.q * 8 > t.tq
    GROUP BY 1, 2, 3
    """,
    doc=(
        "TPC-H Q20 shape (nested aggregate threshold feeding a "
        "dimension rollup): suppliers that shipped more than an EIGHTH of "
        "some part's total quantity (partsupp availability is absent; "
        "shipped-quantity share stands in for the availqty-vs-demand "
        "test — same two-level aggregate with a correlated threshold). "
        "The inner aggregate reuses its own output for the outer total "
        "(pair -> tot is a second tiny group on the already-reduced "
        "frame, NOT a second fact scan) and the share comparison is "
        "exact decimal (q*8 > tq). At 100 TB both aggregates and the "
        "threshold join partition on partkey — one fact shuffle total."
    ),
    tags=("agg", "subquery", "tpch"),
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    pair = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,6))")).alias("q"))
        .cache()
    )
    tot = pair.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
    out = (
        pair.join(tot, "l_partkey")
        .filter(F.col("q") * 8 > F.col("tq"))
        .join(F.broadcast(s), pair.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
        .agg(F.count("*").alias("n_dominated_parts"))
    )
    out._cached_deps = [pair]  # released by the harness/caller post-action
    return out


@register(
    "q12_late_lines_by_priority_class",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    doc=(
        "TPC-H Q12 (shipping modes / order priority): lineitems shipped "
        "in a one-year window and late (>30 days after order date), "
        "classified by order priority into high/low conditional counts, "
        "grouped by a lineitem attribute. The testdata has no "
        "l_shipmode/l_receiptdate, so the group key is l_linestatus and "
        "'late' is shipdate vs orderdate+30 (same shape: scan-window "
        "filter + fact-fact equi-join + join-condition residual + "
        "CASE-conditional counts). The year filter pushes into the "
        "lineitem scan; the join shuffles both sides on orderkey once "
        "(sort-merge at scale) and the residual date comparison rides "
        "the join, so no second pass over lineitem is needed."
    ),
    tags=("join", "agg", "conditional", "tpch"),
)
def q12_late_lines_by_priority_class(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 30 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )
