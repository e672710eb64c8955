"""Core analytics queries: the reference's operator inventory (SURVEY.md §2)
re-expressed over the driver's TPC-H-ish testdata, each paired with a DuckDB
oracle.

Reference-parity map (reference file:line → query here):
- db_notebooks/07_gold_metrics_revenue.py:26-65 (revenue mart)      → revenue_by_nation_status
- db_notebooks/04_gold_fact_orders.py:42-91 (pre-agg + join + days) → fact_orders_preagg
- db_notebooks/02_bronze_to_silver.py:34-41 (dedup-keep-latest)     → dedup_latest / dedup_latest_composite
- db_notebooks/02_bronze_to_silver.py:155-184 (centroid + modal)    → segment_consolidation / modal_event_type
- db_notebooks/08_gold_metric_orders.py:48-66 (status pivots, avg)  → status_pivot_by_nation
- db_notebooks/02_bronze_to_silver.py (trim/case/cast/try_cast)     → clean_conform_part
- db_notebooks/02_bronze_to_silver.py:524-531 (try_to_timestamp)    → timestamp_parse_roundtrip
- db_notebooks/02_bronze_to_silver.py:579-601 (domain filters)      → valid_domain_filter
- db_notebooks/03_gold_dimensions.py:142-145 (surrogate keys)       → surrogate_dim_customer
- db_notebooks/09_gold_metrics_customers.py:43-59 (cond. distinct)  → status_pivot_by_nation
Everything below "scale-path extensions" has no reference equivalent —
it's the capability the reference's "real-time analytics" claim implies
(top-k, running totals, rollup, sessionization, as-of / range joins,
event-time windows, JSON props).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import (
    EVENTS_CTE,
    dec_avg,
    dec_sum,
    fan_out,
    register,
    table,
)

# shared agg snippets (same SQL text runs on Spark and DuckDB — exact
# decimal accumulation, so the value is order-independent; see dec_sum)
_SUM_QTY = dec_sum("l_quantity")
_SUM_BASE = dec_sum("l_extendedprice")
_SUM_DISC = dec_sum("l_extendedprice * (1 - l_discount)")
_SUM_CHARGE = dec_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")
_AVG_QTY = dec_avg("l_quantity")
_AVG_PRICE = dec_avg("l_extendedprice")
_AVG_DISC = dec_avg("l_discount")
_SUM_TOTALPRICE = dec_sum("o_totalprice")
_AVG_TOTALPRICE = dec_avg("o_totalprice")

# ---------------------------------------------------------------------------
# Aggregations (A1-A10)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_SUM_QTY}    AS sum_qty,
           {_SUM_BASE}   AS sum_base_price,
           {_SUM_DISC}   AS sum_disc_price,
           {_SUM_CHARGE} AS sum_charge,
           {_AVG_QTY}    AS avg_qty,
           {_AVG_PRICE}  AS avg_price,
           {_AVG_DISC}   AS avg_disc,
           count(*)      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary: multi-agg groupBy (A1-A3, A9).",
    tags=("agg",),
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 8 decimal aggregates rooted on the scan: rebalance if the file's
    # row-group layout would serialize them (fan_out docstring)
    li = fan_out(table(spark, sf_dir, "lineitem"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(_SUM_QTY).alias("sum_qty"),
            F.expr(_SUM_BASE).alias("sum_base_price"),
            F.expr(_SUM_DISC).alias("sum_disc_price"),
            F.expr(_SUM_CHARGE).alias("sum_charge"),
            F.expr(_AVG_QTY).alias("avg_qty"),
            F.expr(_AVG_PRICE).alias("avg_price"),
            F.expr(_AVG_DISC).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "revenue_by_nation_status",
    oracle=f"""
    SELECT CAST(o.o_orderdate AS DATE)  AS order_date,
           n.n_name                     AS nation,
           o.o_orderstatus              AS order_status,
           {_SUM_TOTALPRICE}            AS revenue,
           count(DISTINCT o.o_orderkey) AS order_count
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2, 3
    """,
    doc=(
        "Flagship revenue mart: fact ⋈ dim ⋈ dim, multi-key date/geo/status "
        "group (reference 07_gold_metrics_revenue.py:26-65 — revenue by "
        "(order_date, customer_state, order_status)). nation is broadcast; "
        "orders⋈customer shuffles on the join key once and AQE right-sizes. "
        "Integrity precondition (r11 rewrite, r12 advice): order_count is "
        "count(*) in the engine, equal to the declared count(DISTINCT "
        "o_orderkey) ONLY under dimension-key uniqueness (c_custkey, "
        "n_nationkey are PKs — TPC-H referential integrity, re-checked by "
        "the referential_integrity_audit query and the oracle gate); on "
        "inputs with duplicate dimension keys the two spellings diverge."
    ),
    tags=("join", "agg"),
    bench=True,
)
def revenue_by_nation_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.to_date("o_orderdate").alias("order_date"),
            F.col("n_name").alias("nation"),
            F.col("o_orderstatus").alias("order_status"),
        )
        .agg(
            F.expr(_SUM_TOTALPRICE).alias("revenue"),
            # r11 (guide §2.3 "aggregate before you shuffle" — here:
            # don't plan a distinct at all): o_orderkey is the orders
            # PK and both joins are N:1 onto dimension PKs (c_custkey,
            # n_nationkey), so every orders row survives exactly once
            # and count(DISTINCT o_orderkey) == count(*). The oracle
            # keeps count(DISTINCT) — identical value — while the
            # engine skips the two-level distinct aggregation (one
            # full extra exchange keyed on (group keys, o_orderkey)).
            F.count("*").alias("order_count"),
        )
    )


@register(
    "fact_orders_preagg",
    oracle=f"""
    SELECT o.o_orderkey,
           o.o_orderstatus,
           CAST(o.o_orderdate AS DATE) AS order_date,
           li.item_count,
           li.total_item_value,
           li.total_discount_value,
           CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(li.first_ship_ts AS DATE)) AS INTEGER)
               AS days_to_first_ship
    FROM orders o
    LEFT JOIN (
        SELECT l_orderkey,
               count(*)                                   AS item_count,
               {dec_sum("l_extendedprice")}               AS total_item_value,
               {dec_sum("l_extendedprice * l_discount")}  AS total_discount_value,
               min(l_shipdate)                            AS first_ship_ts
        FROM lineitem
        GROUP BY l_orderkey
    ) li ON o.o_orderkey = li.l_orderkey
    """,
    doc=(
        "fact_orders: pre-aggregate line items per order BEFORE the join "
        "(A10 partial-agg pattern, reference 04_gold_fact_orders.py:42-59) "
        "then derive datediff measures (04:79-86). Pre-agg shrinks the "
        "probe side ~4x before the shuffle join — semantic, not automatic."
    ),
    tags=("join", "agg", "derived"),
    bench=True,
)
def fact_orders_preagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    # r11: fan out by HASH on the aggregation key — one exchange both
    # rebalances the single-row-group scan and feeds the groupBy, so
    # the agg's own exchange disappears (2 exchanges -> 1) and the
    # round-robin's sortBeforeRepartition local sort is skipped
    # (guide §2.4; l_orderkey is high-cardinality so the spread holds)
    li = fan_out(table(spark, sf_dir, "lineitem"), by="l_orderkey")
    items = li.groupBy("l_orderkey").agg(
        F.count("*").alias("item_count"),
        F.expr(dec_sum("l_extendedprice")).alias("total_item_value"),
        F.expr(dec_sum("l_extendedprice * l_discount")).alias("total_discount_value"),
        F.min("l_shipdate").alias("first_ship_ts"),
    )
    return orders.join(items, orders.o_orderkey == items.l_orderkey, "left").select(
        "o_orderkey",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("order_date"),
        "item_count",
        "total_item_value",
        "total_discount_value",
        F.datediff(F.to_date("first_ship_ts"), F.to_date("o_orderdate")).alias(
            "days_to_first_ship"
        ),
    )


@register(
    "status_pivot_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           count(*) AS total_orders,
           CAST(sum(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
           CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_orders,
           CAST(sum(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_orders,
           count(DISTINCT o.o_custkey) AS customers,
           count(DISTINCT CASE WHEN o.o_totalprice > 400000 THEN o.o_custkey END)
               AS big_order_customers,
           {_AVG_TOTALPRICE} AS avg_order_value
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc=(
        "Conditional-count pivots + conditional distinct count (A6/A7, "
        "reference 08_gold_metric_orders.py:48-58, 09_gold_metrics_customers.py:49-59)."
    ),
    tags=("agg",),
)
def status_pivot_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")

    def status_count(s: str):  # noqa: ANN202
        return F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0)).cast("long")

    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("total_orders"),
            status_count("O").alias("open_orders"),
            status_count("F").alias("finished_orders"),
            status_count("P").alias("pending_orders"),
            F.countDistinct("o_custkey").alias("customers"),
            F.countDistinct(
                F.when(F.col("o_totalprice") > 400000, F.col("o_custkey"))
            ).alias("big_order_customers"),
            F.expr(_AVG_TOTALPRICE).alias("avg_order_value"),
        )
    )


@register(
    "segment_consolidation",
    oracle=f"""
    WITH agg AS (
        SELECT c_nationkey,
               {dec_avg("c_acctbal")} AS acctbal_centroid,
               count(*)               AS n_customers
        FROM customer GROUP BY c_nationkey
    ),
    freq AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS n
        FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    modal AS (
        SELECT c_nationkey, c_mktsegment AS modal_segment
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY c_nationkey ORDER BY n DESC, c_mktsegment ASC) AS rn
            FROM freq
        ) WHERE rn = 1
    )
    SELECT agg.c_nationkey, agg.acctbal_centroid, agg.n_customers, modal.modal_segment
    FROM agg LEFT JOIN modal ON agg.c_nationkey = modal.c_nationkey
    """,
    doc=(
        "Centroid + modal-label consolidation: the geolocation pattern "
        "(reference 02_bronze_to_silver.py:155-184 — avg(lat/lng) centroid "
        "joined to most-frequent city/state with row_number tie-break)."
    ),
    tags=("agg", "window", "join"),
)
def segment_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    agg = customer.groupBy("c_nationkey").agg(
        F.expr(dec_avg("c_acctbal")).alias("acctbal_centroid"),
        F.count("*").alias("n_customers"),
    )
    freq = customer.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("n"))
    w = W.partitionBy("c_nationkey").orderBy(F.desc("n"), F.asc("c_mktsegment"))
    modal = (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", F.col("c_mktsegment").alias("modal_segment"))
    )
    return agg.join(modal, "c_nationkey", "left").select(
        "c_nationkey", "acctbal_centroid", "n_customers", "modal_segment"
    )


# ---------------------------------------------------------------------------
# Windows (W1-W4)
# ---------------------------------------------------------------------------


@register(
    "dedup_latest",
    oracle=f"""
    {EVENTS_CTE}
    SELECT user_id, event_id, event_type, ts, value
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev
    ) WHERE rn = 1
    """,
    doc=(
        "Dedup-keep-latest (W1): row_number over (key, version desc) keep "
        "rn=1 — the reference's universal dedup (02_bronze_to_silver.py:34-41). "
        "event_id desc as deterministic tie-break (the reference has none; "
        "SURVEY §7 risk 1)."
    ),
    tags=("window",),
    bench=True,
)
def dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the canonical operator IS the implementation (r5 review: three
    # registered queries hand-spelled the window it owns — a tie-break
    # or null-ordering fix there would not have reached them)
    from real_time_e_commerce_analytics_lakehouse_spark.operators.dedup import (
        dedup_latest as op,
    )

    ev = table(spark, sf_dir, "events")
    return op(ev, keys=["user_id"], version_col="ts",
              tie_breakers=("event_id",)).select(
        "user_id", "event_id", "event_type", "ts", "value"
    )


@register(
    "dedup_latest_composite",
    oracle=f"""
    {EVENTS_CTE}
    SELECT user_id, event_type, event_id, ts, value
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev
    ) WHERE rn = 1
    """,
    doc=(
        "Composite-key dedup-keep-latest (W2, reference "
        "02_bronze_to_silver.py:292-303 on (order_id, order_item_id))."
    ),
    tags=("window",),
)
def dedup_latest_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.dedup import (
        dedup_latest as op,
    )

    ev = table(spark, sf_dir, "events")
    return op(
        ev, keys=["user_id", "event_type"], version_col="ts",
        tie_breakers=("event_id",),
    ).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )


@register(
    "modal_event_type",
    oracle=f"""
    {EVENTS_CTE}
    SELECT user_id, event_type AS modal_event_type, n AS occurrences
    FROM (
        SELECT user_id, event_type, count(*) AS n,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY count(*) DESC, event_type ASC) AS rn
        FROM ev GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
    doc=(
        "Top-1-by-frequency / mode per group (W3+A8, reference "
        "02_bronze_to_silver.py:166-179 modal city per zip)."
    ),
    tags=("window", "agg"),
)
def modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    freq = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = W.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_event_type"),
            F.col("n").alias("occurrences"),
        )
    )


@register(
    "top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rank
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        FROM orders
    ) WHERE rank <= 3
    """,
    doc="Top-K per group (scale-path extension; window + filter, no sort of the full table).",
    tags=("window",),
    bench=True,
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


@register(
    "running_revenue",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               {_SUM_TOTALPRICE} AS revenue
        FROM orders GROUP BY 1
    )
    SELECT order_date, revenue,
           CAST(sum(CAST(revenue AS DECIMAL(18,2))) OVER (
               ORDER BY order_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_revenue
    FROM daily
    """,
    doc=(
        "Running total with an explicit frame (scale-path extension — the "
        "reference has no frame specs, SURVEY §2.5). Decimal accumulation "
        "so the running sum is order-exact across engines; computed as "
        "per-512-day-bucket partitioned cumsums plus broadcast decimal "
        "prefix offsets (operators/bounded_frames.bucketed_prefix_cumsum) "
        "— no single-reducer window, exact at any series length."
    ),
    tags=("window", "agg"),
)
def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.bounded_frames import (
        bucketed_prefix_cumsum,
    )

    orders = table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.expr(_SUM_TOTALPRICE).alias("revenue"))
        .withColumn("__day", F.datediff("order_date", F.lit("1995-01-01")))
        .withColumn("__rev_dec", F.col("revenue").cast("decimal(18,2)"))
    )
    out = bucketed_prefix_cumsum(daily, "__day", "__rev_dec", "__run")
    res = out.select(
        "order_date",
        "revenue",
        F.col("__run").cast("double").alias("running_revenue"),
    )
    res._cached_deps = getattr(out, "_cached_deps", [])
    return res


# ---------------------------------------------------------------------------
# Scalar functions / cleaning (F1-F16)
# ---------------------------------------------------------------------------


@register(
    "clean_conform_part",
    oracle="""
    SELECT p_partkey,
           upper(trim(p_brand))  AS brand_norm,
           lower(trim(p_type))   AS type_norm,
           array_to_string(
               list_transform(regexp_split_to_array(p_name, ' '),
                              x -> upper(x[1]) || lower(x[2:])), ' ') AS name_title,
           CAST(p_size AS BIGINT) AS size_l,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
           TRY_CAST(p_type AS INTEGER) AS type_as_int,
           CAST(round(CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(1.1 AS DECIMAL(3,2)), 2) AS DOUBLE)
               AS uplift_price
    FROM part
    """,
    doc=(
        "Cleaning/conformance function surface: trim/upper/lower/initcap/"
        "cast/try_cast/regexp_extract/arithmetic (reference F1-F6, F13-F15 — "
        "02_bronze_to_silver.py:48-50,142-143,411-438,815). try_cast yields "
        "NULL on failure, never fails the job (reference null policy)."
    ),
    tags=("scalar",),
)
def clean_conform_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.trim("p_brand")).alias("brand_norm"),
        F.lower(F.trim("p_type")).alias("type_norm"),
        F.initcap("p_name").alias("name_title"),
        F.col("p_size").cast("long").alias("size_l"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("long").alias("brand_num"),
        F.expr("try_cast(p_type AS int)").alias("type_as_int"),
        # decimal-exact: retail prices are k/100, so k*1.1 lands on a
        # .xx5 half-way boundary for ~10% of parts, where Spark and
        # DuckDB round() doubles differently (r5 review) — multiply and
        # round in DECIMAL (exact on both engines), cast to double last
        F.round(
            F.col("p_retailprice").cast("decimal(18,2)")
            * F.lit("1.1").cast("decimal(3,2)"),
            2,
        ).cast("double").alias("uplift_price"),
    )


@register(
    "timestamp_parse_roundtrip",
    oracle="""
    SELECT o_orderkey,
           strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                    '%Y-%m-%d %H:%M:%S')                         AS parsed_ts,
           try_strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || 'x',
                        '%Y-%m-%d %H:%M:%S')                     AS bad_ts
    FROM orders
    """,
    doc=(
        "Timestamp parse & corruption tolerance: to_timestamp + "
        "try_to_timestamp with explicit format (reference F7/F8, "
        "02_bronze_to_silver.py:277,524-531 — malformed input becomes NULL, "
        "the job never fails)."
    ),
    tags=("scalar",),
)
def timestamp_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    fmt = "yyyy-MM-dd HH:mm:ss"
    ts_str = F.date_format("o_orderdate", fmt)
    return orders.select(
        "o_orderkey",
        F.to_timestamp(ts_str, fmt).alias("parsed_ts"),
        F.try_to_timestamp(F.concat(ts_str, F.lit("x")), F.lit(fmt)).alias("bad_ts"),
    )


@register(
    "valid_domain_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    WHERE o_orderkey IS NOT NULL
      AND o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 300000
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    """,
    doc=(
        "Predicate surface: not-null, set-membership, range, comparison, "
        "conjunction (P5-P9, reference 02_bronze_to_silver.py:579-601 status "
        "domain + 02:517 score range). All four predicates push down into "
        "the parquet scan (PushedFilters)."
    ),
    tags=("filter",),
)
def valid_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderkey").isNotNull()
        & F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 300000)
        & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.to_date("o_orderdate").alias("order_date"),
    )


@register(
    "surrogate_dim_customer",
    oracle="""
    SELECT row_number() OVER (ORDER BY c.c_custkey) AS customer_sk,
           c.c_custkey, c.c_name, c.c_mktsegment, n.n_name AS nation
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    doc=(
        "Dimension build with surrogate key. The reference uses "
        "monotonically_increasing_id (03_gold_dimensions.py:142-145) which "
        "is nondeterministic across runs (SURVEY §7 risk 1); the engine "
        "uses a deterministic ordering-based key. NOTE at 100 TB a global "
        "row_number is a single-reducer bottleneck — the production path is "
        "xxhash64(business_key) (not oracle-comparable, hash family "
        "differs); this query pins the deterministic variant."
    ),
    tags=("window", "join"),
)
def surrogate_dim_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    from real_time_e_commerce_analytics_lakehouse_spark.operators.bounded_frames import (
        bounded_single_group,
    )

    w = bounded_single_group("c_custkey", F.asc("c_custkey"))
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .select(
            F.row_number().over(w).cast("long").alias("customer_sk"),
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.col("n_name").alias("nation"),
        )
    )


# ---------------------------------------------------------------------------
# Set ops / semi / anti (SURVEY §2.6: absent in reference, free in Spark)
# ---------------------------------------------------------------------------


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Anti join (NOT EXISTS) — left_anti avoids materializing the negation.",
    tags=("join",),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Semi join (EXISTS) — no duplication of the left side, no payload from the right.",
    tags=("join",),
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "rollup_revenue",
    oracle=f"""
    SELECT n.n_name AS nation, o.o_orderstatus AS order_status,
           {_SUM_TOTALPRICE} AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, o.o_orderstatus)
    """,
    doc=(
        "ROLLUP hierarchy totals — the metrics marts (reference 07-09) are "
        "natural rollup candidates (SURVEY §2.4 flags the gap); one pass "
        "produces nation/status, nation, and grand-total rows."
    ),
    tags=("agg",),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("o_orderstatus").alias("order_status"), "o_totalprice")
        .rollup("nation", "order_status")
        .agg(
            F.expr(_SUM_TOTALPRICE).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )
