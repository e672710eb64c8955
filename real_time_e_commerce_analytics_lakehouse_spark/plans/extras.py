"""Coverage extensions: the relational surface the reference never uses
but its users get free from Spark (SURVEY §2.6 notes the absence of
sorts/limits/set-ops; §2.4 notes no cube/rollup/percentiles). Each is
declared with an oracle so the capability is verified, not just present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.operators.bounded_frames import (
    CARRIED,
    BUCKET,
    carried_range_buckets,
    carried_rows_buckets,
)
from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import (
    dec_sum,
    register,
    table,
)

_SUM_TOTALPRICE = dec_sum("o_totalprice")


def _orders_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return orders.join(customer, orders.o_custkey == customer.c_custkey).join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )


@register(
    "cube_revenue",
    oracle=f"""
    SELECT n.n_name AS nation, o.o_orderstatus AS order_status,
           {_SUM_TOTALPRICE} AS revenue, count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY CUBE (n.n_name, o.o_orderstatus)
    """,
    doc="CUBE: all 4 grouping combinations in one pass (shared shuffle via expand).",
    tags=("agg",),
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _orders_nation(spark, sf_dir)
        .select(F.col("n_name").alias("nation"), F.col("o_orderstatus").alias("order_status"), "o_totalprice")
        .cube("nation", "order_status")
        .agg(F.expr(_SUM_TOTALPRICE).alias("revenue"), F.count("*").alias("n_orders"))
    )


@register(
    "grouping_sets_revenue",
    oracle=f"""
    SELECT n.n_name AS nation, o.o_orderstatus AS order_status,
           {_SUM_TOTALPRICE} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (o.o_orderstatus))
    """,
    doc="Explicit GROUPING SETS (nation-only and status-only subtotals, one scan).",
    tags=("agg",),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _orders_nation(spark, sf_dir).select(
        F.col("n_name").alias("nation"),
        F.col("o_orderstatus").alias("order_status"),
        "o_totalprice",
    )
    df.createOrReplaceTempView("on_view")
    return spark.sql(
        f"""
        SELECT nation, order_status, {_SUM_TOTALPRICE} AS revenue
        FROM on_view
        GROUP BY GROUPING SETS ((nation), (order_status))
        """
    )


@register(
    "pivot_status_counts",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(sum(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(sum(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="PIVOT with explicit value list (explicit list avoids the extra distinct-values job).",
    tags=("agg",),
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _orders_nation(spark, sf_dir)
        .select(F.col("n_name").alias("nation"), "o_orderstatus")
        .groupBy("nation")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "unpivot_status_counts",
    oracle="""
    WITH w AS (
        SELECT n.n_name AS nation,
               CAST(sum(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
               CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
               CAST(sum(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT nation, 'O' AS status, o_cnt AS n FROM w
    UNION ALL SELECT nation, 'F', f_cnt FROM w
    UNION ALL SELECT nation, 'P', p_cnt FROM w
    """,
    doc="UNPIVOT via stack(): wide pivot back to long form without re-scanning.",
    tags=("agg",),
)
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = pivot_status_counts(spark, sf_dir)
    return wide.select(
        "nation",
        F.expr("stack(3, 'O', O, 'F', F, 'P', P) AS (status, n)"),
    )


@register(
    "union_high_low_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'high' AS tier FROM orders WHERE o_totalprice >= 400000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'low' AS tier FROM orders WHERE o_totalprice < 10000
    """,
    doc="UNION ALL of disjoint projections (no dedup shuffle needed or incurred).",
    tags=("setop",),
)
def union_high_low_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_totalprice") >= 400000).select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("tier")
    )
    low = orders.filter(F.col("o_totalprice") < 10000).select(
        "o_orderkey", "o_totalprice", F.lit("low").alias("tier")
    )
    return high.unionByName(low)


@register(
    "except_inactive_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    EXCEPT
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    doc="EXCEPT (set difference): customers with no open orders.",
    tags=("setop",),
)
def except_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    base = customer.select("c_custkey", "c_mktsegment")
    open_cust = customer.join(
        orders.filter(F.col("o_orderstatus") == "O"),
        customer.c_custkey == orders.o_custkey,
        "left_semi",
    ).select("c_custkey", "c_mktsegment")
    # DataFrame.subtract IS SQL's (distinct) EXCEPT; exceptAll().distinct()
    # would subtract multiplicities first — different answer when the left
    # side has duplicate rows that also appear (fewer times) on the right
    # (ADVICE r1 #4).
    return base.subtract(open_cust)


@register(
    "intersect_both_status_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT: customers holding both open and finished orders.",
    tags=("setop",),
)
def intersect_both_status_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersect(f)


# exact-decimal second moment => cross-engine-identical variance/stddev
_N = "count(o_totalprice)"
_S1 = "cast(sum(cast(o_totalprice as decimal(27,6))) as double)"
_S2 = "cast(sum(cast(o_totalprice * o_totalprice as decimal(38,6))) as double)"
_VAR = f"(({_S2}) - ({_S1}) * ({_S1}) / {_N}) / ({_N} - 1)"


@register(
    "dispersion_by_status",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round({_VAR}, 2)       AS var_totalprice,
           round(sqrt({_VAR}), 4) AS stddev_totalprice
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc=(
        "Sample variance / stddev via exact decimal moments "
        "(sum, sum-of-squares) so both engines produce identical doubles — "
        "built-in stddev_samp uses engine-specific streaming algorithms "
        "whose float noise breaks differential comparison."
    ),
    tags=("agg", "stats"),
)
def dispersion_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.expr(f"round({_VAR}, 2)").alias("var_totalprice"),
        F.expr(f"round(sqrt({_VAR}), 4)").alias("stddev_totalprice"),
    )


@register(
    "price_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "Exact interpolated percentiles (Spark percentile == DuckDB "
        "quantile_cont: both sort and linearly interpolate). The approx "
        "variant (approx_percentile/t-digest) is the 100 TB path but is "
        "engine-specific, hence not oracle-comparable."
    ),
    tags=("agg", "stats"),
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75"),
    )


@register(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS estimate_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "approx_count_distinct (HyperLogLog++): the constant-memory "
        "distinct-count for 100 TB (exact countDistinct doubles the "
        "shuffle). The HLL estimate itself is engine-specific, so the "
        "gate asserts the ESTIMATOR GUARANTEE as an exact boolean "
        "(r9 trending_tokens_sketch template): |approx - exact| <= 5% "
        "of exact, per group, computed in-plan against the exact "
        "countDistinct (the verification harness at gate scale; "
        "production keeps the one-pass sketch alone) — Spark's default "
        "rsd is 5%, and HLL++ is near-exact at these cardinalities."
    ),
    tags=("agg", "approx"),
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey")
                - F.countDistinct("l_partkey")
            )
            <= 0.05 * F.countDistinct("l_partkey")
        ).alias("estimate_ok"),
    )


@register(
    "daily_revenue_momentum",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               {_SUM_TOTALPRICE} AS revenue
        FROM orders GROUP BY 1
    )
    SELECT order_date, revenue,
           lag(revenue)  OVER (ORDER BY order_date) AS prev_revenue,
           lead(revenue) OVER (ORDER BY order_date) AS next_revenue,
           round(revenue - lag(revenue) OVER (ORDER BY order_date), 2) AS delta
    FROM daily
    """,
    doc=(
        "lag/lead day-over-day deltas, partitioned by 512-day buckets "
        "with 1-row carries in both directions (operators/bounded_frames"
        ".carried_rows_buckets) — each bucket's first/last row sees its "
        "true global neighbor, no single-reducer window."
    ),
    tags=("window",),
)
def daily_revenue_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.expr(_SUM_TOTALPRICE).alias("revenue"))
        .withColumn("__day", F.datediff("order_date", F.lit("1995-01-01")))
    )
    aug = carried_rows_buckets(daily, "__day", k_back=1, k_fwd=1)
    w = W.partitionBy(BUCKET).orderBy("__day")
    out = (
        aug.select(
            "order_date",
            "revenue",
            CARRIED,
            F.lag("revenue").over(w).alias("prev_revenue"),
            F.lead("revenue").over(w).alias("next_revenue"),
            F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias(
                "delta"
            ),
        )
        .where(~F.col(CARRIED))
        .drop(CARRIED)
    )
    out._cached_deps = getattr(aug, "_cached_deps", [])
    return out


@register(
    "promo_window_shipments",
    oracle="""
    WITH promo AS (
        SELECT o_orderkey, epoch_us(o_orderdate) AS start_us,
               epoch_us(o_orderdate + INTERVAL '7 days') AS end_us
        FROM orders WHERE o_totalprice > 490000
    )
    SELECT p.o_orderkey, count(*) AS n_shipments
    FROM promo p
    JOIN lineitem l
      ON epoch_us(l.l_shipdate) >= p.start_us
     AND epoch_us(l.l_shipdate) < p.end_us
    GROUP BY p.o_orderkey
    """,
    doc=(
        "Pure range join (NO equi key): shipments falling in each promo "
        "week. Runs through operators/joins.py:range_join — intervals are "
        "exploded onto week buckets and the join becomes an equi-join on "
        "the bucket, avoiding the O(n*m) BroadcastNestedLoopJoin Spark "
        "picks for a bare inequality condition."
    ),
    tags=("range-join",),
    bench=True,
)
def promo_window_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.joins import range_join

    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    week_us = 7 * 24 * 3600 * 1_000_000
    # parquet stores these as TIMESTAMP_NTZ; cast to TIMESTAMP (session is
    # pinned UTC, so the cast is value-preserving) for epoch extraction
    odate = F.col("o_orderdate").cast("timestamp")
    promo = orders.filter(F.col("o_totalprice") > 490000).select(
        "o_orderkey",
        F.unix_micros(odate).alias("start_us"),
        (F.unix_micros(odate) + week_us).alias("end_us"),
    )
    points = li.select(
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("ship_us")
    )
    joined = range_join(
        points,
        promo,
        point_col="ship_us",
        start_col="start_us",
        end_col="end_us",
        bucket_width=week_us,
    )
    return joined.groupBy("o_orderkey").agg(F.count("*").alias("n_shipments"))


@register(
    "order_price_ranks",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(dense_rank() OVER w AS BIGINT) AS price_rank,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 9) AS pct_rank,
           round(cume_dist() OVER w, 9) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    doc=(
        "Ranking-function family (dense_rank / ntile / percent_rank / "
        "cume_dist) over a per-status price ordering with a full "
        "tie-breaker, so every rank — including ntile's positional "
        "quartiles — is deterministic across engines."
    ),
    tags=("window",),
)
def order_price_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.dense_rank().over(w).cast("long").alias("price_rank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@register(
    "approx_price_percentiles",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM orders GROUP BY o_orderstatus
    """,
    doc=(
        "percentile_approx (quantile sketch): the constant-memory "
        "quantile path for 100 TB — exact percentiles need the whole "
        "group's values materialized per reducer, a sketch merges "
        "map-side like any algebraic agg. The sketch VALUES are "
        "engine-specific, so the gate row checks the sketch's "
        "GUARANTEE instead (VERDICT r8 next #8): each estimate must "
        "lie between the exact percentiles at q∓0.01 — two orders of "
        "magnitude looser than the sketch's 1/accuracy = 1e-4 rank "
        "error — emitted as boolean columns the DuckDB oracle matches "
        "exactly (it asserts TRUE). pytest keeps the tighter 1% "
        "value-tolerance twin."
    ),
    tags=("agg", "approx"),
)
def approx_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr(
            "percentile_approx(o_totalprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("ap"),
        F.expr(
            "percentile(o_totalprice, array(0.49, 0.89, 0.98))"
        ).alias("lo"),
        F.expr(
            "percentile(o_totalprice, array(0.51, 0.91, 1.0))"
        ).alias("hi"),
    )
    ok = [
        (
            F.expr(f"ap[{i}] >= lo[{i}] AND ap[{i}] <= hi[{i}]")
        ).alias(name)
        for i, name in enumerate(["p50_ok", "p90_ok", "p99_ok"])
    ]
    return agg.select("o_orderstatus", "n_orders", *ok)


@register(
    "daily_revenue_gapfilled",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               {_SUM_TOTALPRICE} AS revenue,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    ),
    spine AS (
        SELECT unnest(generate_series(
                   (SELECT min(order_date) FROM daily),
                   (SELECT max(order_date) FROM daily),
                   INTERVAL '1 day'))::DATE AS order_date
    )
    SELECT s.order_date,
           coalesce(d.revenue, 0.0) AS revenue,
           coalesce(d.n_orders, 0) AS n_orders,
           CAST(d.order_date IS NULL AS BOOLEAN) AS gap_filled
    FROM spine s LEFT JOIN daily d USING (order_date)
    """,
    doc=(
        "Gap filling over a generated date spine (time-series "
        "regularization): sequence(min, max) explodes a calendar, the "
        "daily aggregate left-joins onto it, missing days read zero. "
        "The spine is derived from a 2-row min/max aggregate and "
        "broadcast — no driver-side date loop."
    ),
    tags=("window", "timeseries"),
)
def daily_revenue_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.expr(_SUM_TOTALPRICE).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    bounds = daily.agg(
        F.min("order_date").alias("lo"), F.max("order_date").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("order_date")
    )
    return (
        spine.join(daily, "order_date", "left")
        .select(
            "order_date",
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.col("revenue").isNull().alias("gap_filled"),
        )
    )


@register(
    "trailing_7d_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               sum(CAST(o_totalprice AS DECIMAL(18,6))) AS day_rev
        FROM orders GROUP BY 1
    )
    SELECT order_date,
           round(CAST(day_rev AS DOUBLE), 2) AS day_revenue,
           round(CAST(sum(day_rev) OVER (
               ORDER BY order_date
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS trailing_7d_revenue
    FROM daily
    """,
    doc=(
        "Time-RANGE window frame (distinct from the ROWS frames in "
        "running_revenue): per-day revenue plus a trailing-7-DAY sum — "
        "the frame is value-based (missing days shrink it), expressed in "
        "Spark as rangeBetween(-6, 0) over a day-number ordering. The "
        "windowed sum accumulates DECIMAL so the value is association- "
        "order independent (DuckDB's segment-tree window vs Spark's "
        "sliding frame would disagree in double), cast to double only at "
        "the end. The window runs over the daily pre-agg, NOT the fact "
        "table, and is PARTITIONED by 512-day range buckets with the "
        "6-day bucket tails carry-replicated forward "
        "(operators/bounded_frames) — per-bucket frames equal the "
        "global frames exactly, no single-reducer window at any scale."
    ),
    tags=("window",),
    bench=True,
)
def trailing_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("day_rev"))
        .withColumn("__day", F.datediff("order_date", F.lit("1995-01-01")))
    )
    aug = carried_range_buckets(daily, "__day", lookback=6)
    w = W.partitionBy(BUCKET).orderBy("__day").rangeBetween(-6, 0)
    return (
        aug.withColumn("__t7", F.sum("day_rev").over(w))
        .where(~F.col(CARRIED))
        .select(
            "order_date",
            F.round(F.col("day_rev").cast("double"), 2).alias("day_revenue"),
            F.round(F.col("__t7").cast("double"), 2).alias(
                "trailing_7d_revenue"
            ),
        )
    )


@register(
    "daily_revenue_anomalies",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS day_rev,
               -- width 19 AT THE SOURCE: DuckDB's optimizer elides a
               -- later 18->19 widening cast and the width-18 multiply
               -- stays int64-backed and overflows (r9 memory note)
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS DECIMAL(19,0)) AS x_c
        FROM orders GROUP BY 1
    ),
    framed AS (
        SELECT order_date,
               CAST(day_rev AS DOUBLE) AS x,
               x_c,
               CAST(sum(x_c) OVER w AS DECIMAL(19,0)) AS s_c,
               -- operands widened past 18: DuckDB 1.0 keeps width-18
               -- multiplies int64-backed and overflows; 19 forces
               -- hugeint, exact. Width 34 (r10 advice, headroom to
               -- ~sf2e5 ≈ 100 TB: ss_c ~ 3e23*sf^2 cents^2) chosen so
               -- n(3,0)*ss_c stays within DuckDB's 38-width multiply
               -- bound; the old 25 overflowed NULL-vs-error at ~sf10
               CAST(sum(x_c * x_c) OVER w AS DECIMAL(34,0)) AS ss_c,
               CAST(count(day_rev) OVER w AS DECIMAL(3,0)) AS n
        FROM daily
        WINDOW w AS (ORDER BY order_date
                     RANGE BETWEEN INTERVAL 27 DAY PRECEDING AND CURRENT ROW)
    )
    SELECT order_date,
           round(x, 2) AS day_revenue,
           CAST(n AS BIGINT) AS n_window,
           round(z, 4) AS zscore,
           coalesce(abs(z) > 2, FALSE) AS is_anomaly
    FROM (
        SELECT *,
               -- variance numerator n*E[X^2]-E[X]^2 scaled by n^2, in
               -- EXACT cent-grid decimals: the positivity branch is an
               -- integer comparison, identical across engines (the sf1
               -- sweep caught the old double-residue spelling flipping
               -- NULL-vs-0.0: above 2^53 the engines' decimal->double
               -- casts round a last bit apart). z's numerator is exact
               -- and < 2^53 (cast exact in both engines); only
               -- sqrt(vnum) sees a >2^53 cast, a last-bit effect far
               -- below the round(z, 4) grid.
               -- s_c*s_c is DECIMAL(38,0) in both engines (19+19);
               -- cast to 37 so the subtraction vs n*ss_c (37) stays
               -- inside width 38 on DuckDB — s_c^2 ~ 1e35 at sf1e5,
               -- within 10^37 (r10 advice: the old DECIMAL(25,0)
               -- NULL'd in Spark / errored in DuckDB at ~sf10)
               CASE WHEN n * ss_c - CAST(s_c * s_c AS DECIMAL(37,0)) > 0
                    THEN CAST(n * x_c - s_c AS DOUBLE)
                         / sqrt(CAST(n * ss_c
                                     - CAST(s_c * s_c AS DECIMAL(37,0))
                                AS DOUBLE))
               END AS z
        FROM framed
    )
    """,
    doc=(
        "Rolling z-score anomaly detection over daily revenue: each "
        "day scored against the trailing 28-day mean/stddev (RANGE "
        "frame, so missing days shrink the window rather than "
        "stretching it), |z| > 2 flagged. Cross-engine exactness: the "
        "windowed sum and sum-of-squares accumulate DECIMAL (exact, "
        "order-independent) — day_rev is pinned to DECIMAL(18,2) (the "
        "cent-exact price grid, zero rounding) so its square is "
        "decimal(37,4), INSIDE decimal38 on BOTH engines; the r8 "
        "(18,6) spelling overflowed the product differently per "
        "engine at sf0.1 (found by the r9 full-suite sf0.1 run: the "
        "one-day window's variance came out exactly 0 on one engine "
        "and ~1e-2 on the other, flipping z between NULL and 0.0). "
        "Every double step after the exact decimals — mean, population "
        "variance via E[X^2]-E[X]^2 clamped at 0, sqrt, ratio — is "
        "the same IEEE expression tree on identical inputs on both "
        "engines, so even the boolean flag hash-matches. The window "
        "runs over the ~2.4k-row daily pre-agg, not the fact table "
        "(the 100 TB-safe shape shared with trailing_7d_revenue)."
    ),
    tags=("window", "events"),
)
def daily_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)").alias("day_rev"))
        # width 19 at the source, matching the oracle's x_c exactly
        # (r10 advice: the sides used to build 18 vs 19)
        .withColumn("x_c", (F.col("day_rev") * 100).cast("decimal(19,0)"))
        .withColumn("__day", F.datediff("order_date", F.lit("1995-01-01")))
    )
    aug = carried_range_buckets(daily, "__day", lookback=27)
    w = W.partitionBy(BUCKET).orderBy("__day").rangeBetween(-27, 0)
    framed = (
        aug.select(
            "order_date",
            CARRIED,
            F.col("day_rev").cast("double").alias("x"),
            "x_c",
            F.sum("x_c").over(w).cast("decimal(19,0)").alias("s_c"),
            # x_c^2 is decimal(38,0) exact; 34 matches the oracle's
            # width (headroom to ~sf2e5 while keeping n*ss_c inside
            # DuckDB's 38-width multiply bound — r10 advice)
            F.sum(F.col("x_c") * F.col("x_c"))
            .over(w)
            .cast("decimal(34,0)")
            .alias("ss_c"),
            F.count("day_rev").over(w).cast("decimal(3,0)").alias("n"),
        )
        .where(~F.col(CARRIED))
        .drop(CARRIED)
    )
    # exact cent-grid variance numerator (n^2-scaled): the positivity
    # branch is an integer comparison — identical across engines,
    # unlike the old double-residue spelling (sf1 sweep: above 2^53
    # the engines' decimal->double casts round a last bit apart,
    # flipping z between NULL and 0.0 on one-day windows)
    vnum = F.col("n") * F.col("ss_c") - (
        F.col("s_c") * F.col("s_c")
    ).cast("decimal(37,0)")
    z = F.when(
        vnum > 0,
        (F.col("n") * F.col("x_c") - F.col("s_c")).cast("double")
        / F.sqrt(vnum.cast("double")),
    )
    return framed.select(
        "order_date",
        F.round("x", 2).alias("day_revenue"),
        F.col("n").cast("long").alias("n_window"),
        F.round(z, 4).alias("zscore"),
        F.coalesce(F.abs(z) > 2, F.lit(False)).alias("is_anomaly"),
    )
