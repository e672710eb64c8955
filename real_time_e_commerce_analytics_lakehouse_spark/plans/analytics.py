"""Product/BI analytics shapes beyond the reference's three metric marts.

The reference's gold tier stops at grouped sums over star joins
(07_gold_metrics_revenue.py:56-65, 08_gold_metric_orders.py:43-66,
09_gold_metrics_customers.py:43-59). These queries are the next
analytics asks a user of that mart would make — basket affinity,
customer RFM scoring, distribution histograms, regression/correlation —
each expressed as one-or-two-shuffle DataFrame plans with hash-exact
DuckDB oracles.

Cross-engine exactness rules (see plans/registry.py): integer counts
stay BIGINT; float sums accumulate DECIMAL then cast; every double-only
step (ratios, sqrt) is the same IEEE expression tree on identical
inputs, so even derived doubles hash-match without tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import (
    EVENTS_CTE,
    dec_avg,
    dec_sum,
    register,
    table,
)

MIN_COPURCHASE_ORDERS = 2


def _copurchase_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per order: the sorted SET of distinct part keys bought
    together — (l_orderkey, __parts array). ONE shuffle over lineitem
    (groupBy l_orderkey with map-side partial collect_set); every
    consumer below derives from it without touching lineitem again."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("__parts")
    )


def _copurchase_pairs(
    spark: SparkSession,
    sf_dir: str,
    a_name: str,
    b_name: str,
    symmetric: bool = False,
):
    """(baskets, distinct order-part frame, support-thresholded
    co-purchase pairs) — the basket family's shared trunk (ONE copy;
    four verbatim blocks had to be kept in sync, r5 review).
    `symmetric=False` keeps a<b ordered pairs; True keeps every a!=b
    directed pair (association rules).

    r11 (guide §2.3/§2.4 "aggregate before you shuffle" / "remove
    shuffles outright"): the r1-r10 spelling was
    `op = lineitem.distinct()` then `op ⋈ op ON l_orderkey` — a full
    two-key distinct exchange over lineitem PLUS a re-shuffle of both
    join sides on l_orderkey, with the pair fan-out produced by the
    join. Baskets are bounded (7 lines in TPC-H, tens in retail), so
    the same pairs fall out of ONE groupBy(l_orderkey) with map-side
    partial collect_set, followed by a row-local array comprehension
    (posexplode + tail-slice explode — the _blocked_pairs pattern:
    O(k) per-row memory, Θ(pairs) output). Exchange count for the
    pair lineage drops 3 -> 2 and the self-join disappears; `op`
    (still needed by the support counts) is the explode of the basket
    array — same rows as the old distinct, no extra shuffle.
    Result-identical: collect_set == per-order DISTINCT (l_partkey is
    never NULL by TPC-H construction and counts are support counts
    over exact sets either way); sorted arrays make a<b the tail
    slice."""
    baskets = _copurchase_baskets(spark, sf_dir)
    op = baskets.select(
        "l_orderkey", F.explode("__parts").alias("l_partkey")
    )
    if symmetric:
        pairs_raw = baskets.select(
            F.explode("__parts").alias(a_name), "__parts"
        ).select(
            a_name,
            F.explode(
                F.expr(f"filter(__parts, x -> x != {a_name})")
            ).alias(b_name),
        )
    else:
        pairs_raw = baskets.select(
            "__parts", F.posexplode("__parts").alias("__i", a_name)
        ).select(
            a_name,
            F.explode(
                F.expr("slice(__parts, __i + 2, size(__parts))")
            ).alias(b_name),
        )
    pairs = (
        pairs_raw.groupBy(a_name, b_name)
        .agg(F.count("*").alias("n_together"))
        .filter(F.col("n_together") >= MIN_COPURCHASE_ORDERS)
    )
    return baskets, op, pairs


@register(
    "copurchase_part_pairs",
    oracle=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    part_orders AS (
        SELECT l_partkey, count(*) AS part_n FROM op GROUP BY 1
    ),
    total AS (SELECT count(DISTINCT l_orderkey) AS n FROM op),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_together
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_COPURCHASE_ORDERS}
    )
    SELECT p.part_a, p.part_b,
           CAST(p.n_together AS BIGINT) AS n_together,
           CAST(pa.part_n AS BIGINT) AS n_a,
           CAST(pb.part_n AS BIGINT) AS n_b,
           round(CAST(p.n_together AS DOUBLE) * t.n
                 / (CAST(pa.part_n AS DOUBLE) * pb.part_n), 6) AS lift
    FROM pairs p
    JOIN part_orders pa ON pa.l_partkey = p.part_a
    JOIN part_orders pb ON pb.l_partkey = p.part_b
    CROSS JOIN total t
    """,
    doc=(
        "Market-basket affinity: part pairs co-occurring in >= "
        f"{MIN_COPURCHASE_ORDERS} orders, with per-pair lift. The "
        "self-join blocks on l_orderkey (baskets are bounded — 7 lines "
        "in TPC-H, tens in retail — so per-order pair fan-out is "
        "quadratic in a SMALL constant, never in table size); pair "
        "counting and the two support joins shuffle on part keys. Lift "
        "divides exact BIGINT counts in IEEE doubles, so it "
        "hash-matches without tolerance. At 100 TB the same plan holds: "
        "the only growth axis is #distinct pairs, handled by the "
        "HAVING-style support threshold pushed before the support joins."
    ),
    tags=("analytics", "join", "agg"),
    bench=True,
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    baskets, op, pairs = _copurchase_pairs(spark, sf_dir, "part_a", "part_b")
    part_orders = op.groupBy("l_partkey").agg(F.count("*").alias("part_n"))
    # every basket row is one distinct l_orderkey, so count(*) over
    # baskets == countDistinct(l_orderkey) over op with no distinct
    # shuffle (r11, guide §2.4)
    total = baskets.select(
        F.count("*").alias("n")
    )  # 1-row frame, broadcast below
    pa = part_orders.select(
        F.col("l_partkey").alias("part_a"), F.col("part_n").alias("n_a")
    )
    pb = part_orders.select(
        F.col("l_partkey").alias("part_b"), F.col("part_n").alias("n_b")
    )
    return (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "n_together",
            "n_a",
            "n_b",
            F.round(
                F.col("n_together").cast("double")
                * F.col("n")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


def _reg_sql() -> str:
    """Shared CTE text: exact decimal moment sums per l_returnflag, cast
    to double before any division (identical IEEE tree both engines)."""
    return """
    WITH moments AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS sy,
               CAST(sum(CAST(l_quantity * l_extendedprice
                             AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,6)))
                   AS DOUBLE) AS sxx,
               CAST(sum(CAST(l_extendedprice * l_extendedprice
                             AS DECIMAL(24,6))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    """


@register(
    "price_quantity_regression",
    oracle=_reg_sql()
    + """
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_lines,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 4) AS intercept,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS pearson_r
    FROM moments
    """,
    doc=(
        "Per-group OLS (extendedprice on quantity) + Pearson r from the "
        "five moment sums — ONE partial-aggregated shuffle over the fact "
        "table, no ML library, no second pass. Moments accumulate exact "
        "DECIMAL (order-independent), then slope/intercept/r are pure "
        "double arithmetic on identical inputs, so both engines emit "
        "bit-identical statistics. The normal-equations form is the 100 "
        "TB shape for regression: map-side combine does almost all the "
        "work, the reducer sees one row per group."
    ),
    tags=("analytics", "agg"),
)
def price_quantity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .cast("double")
        .alias("sx"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("sy"),
        F.sum(
            (F.col("l_quantity") * F.col("l_extendedprice")).cast(
                "decimal(18,6)"
            )
        )
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(18,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_extendedprice")).cast(
                "decimal(24,6)"
            )
        )
        .cast("double")
        .alias("syy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_lines"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
        F.round(r, 6).alias("pearson_r"),
    )


@register(
    "rfm_customer_segments",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS c_custkey,
               max(CAST(o_orderdate AS DATE)) AS last_order_date,
               count(*) AS n_orders,
               sum(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary_dec
        FROM orders GROUP BY 1
    )
    SELECT c_custkey, last_order_date,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(round(monetary_dec, 2) AS DOUBLE) AS monetary,
           CAST(ntile(4) OVER (ORDER BY last_order_date, c_custkey)
                AS INTEGER) AS r_score,
           CAST(ntile(4) OVER (ORDER BY n_orders, c_custkey)
                AS INTEGER) AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary_dec, c_custkey)
                AS INTEGER) AS m_score
    FROM base
    """,
    doc=(
        "RFM customer scoring: recency/frequency/monetary per customer, "
        "each quartiled with ntile(4) semantics. Orderings carry the "
        "c_custkey tie-break so quartile assignment is total-order "
        "deterministic (registry convention), and monetary quartiles "
        "rank the exact DECIMAL sum, not the rounded double. "
        "Scale shape (VERDICT r3 wrong #2): NO global ntile window — "
        "each score is a range-bucketed distributed rank "
        "(operators/ids.dense_row_ids: per-bucket parallel row_number + "
        "broadcast cumulative bucket offsets) mapped through the exact "
        "ntile size arithmetic (first n%4 tiles get one extra row), so "
        "the output is bit-identical to the oracle's ntile(4) while "
        "every window runs partitioned — no single-reducer stage over "
        "the |customers|-row frame."
    ),
    tags=("analytics", "window", "agg"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.ids import (
        dense_row_ids,
    )

    orders = table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_order_date"),
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias(
            "monetary_dec"
        ),
    )
    # numeric proxy for the date ordering (datediff is monotone in the
    # date, so ranks are identical); dense_row_ids range-buckets on it
    base = base.withColumn(
        "_r_days", F.datediff("last_order_date", F.lit("1970-01-01"))
    ).persist()
    deps = [base]
    try:
        n = base.count()
        ranked = dense_row_ids(
            base, "_r_days", out="_rk_r", tiebreak=("c_custkey",)
        )
        deps += getattr(ranked, "_cached_deps", [])
        ranked = dense_row_ids(
            ranked, "n_orders", out="_rk_f", tiebreak=("c_custkey",)
        )
        deps += getattr(ranked, "_cached_deps", [])
        ranked = dense_row_ids(
            ranked, "monetary_dec", out="_rk_m", tiebreak=("c_custkey",)
        )
        deps += getattr(ranked, "_cached_deps", [])
    except BaseException:
        for d in deps:
            d.unpersist()
        raise

    def ntile4(rk: F.Column) -> F.Column:
        # exact ntile(k) arithmetic: sizes are n//k (+1 for the first
        # n%k tiles) — a pure function of the global rank, so the
        # partitioned rank reproduces ntile bit-for-bit
        base_sz, rem = divmod(n, 4)
        cut = rem * (base_sz + 1)
        return (
            F.when(
                F.lit(cut) > 0,
                F.when(
                    rk <= cut,
                    F.floor((rk - 1) / F.lit(base_sz + 1)) + 1,
                ).otherwise(
                    F.lit(rem)
                    + F.floor((rk - 1 - cut) / F.lit(max(base_sz, 1)))
                    + 1
                ),
            )
            .otherwise(F.floor((rk - 1) / F.lit(max(base_sz, 1))) + 1)
            .cast("int")
        )

    out = ranked.select(
        "c_custkey",
        "last_order_date",
        "n_orders",
        F.round("monetary_dec", 2).cast("double").alias("monetary"),
        ntile4(F.col("_rk_r")).alias("r_score"),
        ntile4(F.col("_rk_f")).alias("f_score"),
        ntile4(F.col("_rk_m")).alias("m_score"),
    )
    # leases (base + the three dense_row_ids inputs) ride the result —
    # the harness/caller releases them after the consuming action
    # (previously the intermediate persists were orphaned, r4 review)
    out._cached_deps = deps
    return out


BUCKET_WIDTH = 25_000


@register(
    "order_value_histogram",
    oracle=f"""
    SELECT CAST(floor(o_totalprice / {BUCKET_WIDTH}) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / {BUCKET_WIDTH}) * {BUCKET_WIDTH}
                AS DOUBLE) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dec_sum('o_totalprice')} AS total_value
    FROM orders
    GROUP BY 1, 2
    """,
    doc=(
        "Equi-width distribution histogram of order values "
        f"(${BUCKET_WIDTH:,} buckets) — the floor-div bucket id is "
        "computed identically in both engines (width_bucket is not "
        "portable), so bucket membership is exact. One partial-agg "
        "shuffle whose reducer cardinality is #buckets, independent of "
        "table size: the canonical 100 TB profile query."
    ),
    tags=("analytics", "agg"),
)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / BUCKET_WIDTH)
    return (
        orders.groupBy(
            bucket.cast("long").alias("bucket"),
            (bucket * BUCKET_WIDTH).cast("double").alias("bucket_lo"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(dec_sum("o_totalprice")).alias("total_value"),
        )
    )


@register(
    "weekday_order_profile",
    oracle=f"""
    SELECT CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS INTEGER)
               AS weekday,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dec_avg('o_totalprice', 4)} AS avg_value,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY 1
    """,
    doc=(
        "Day-of-week seasonality profile. Weekday is pinned to the ISO "
        "convention shifted to 0=Monday on both engines (Spark weekday() "
        "vs DuckDB isodow()-1 — the two engines' default dayofweek "
        "disagree, a classic cross-engine trap). Constant-cardinality "
        "reducer (7 rows) after a partial agg."
    ),
    tags=("analytics", "agg"),
)
def weekday_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.weekday(F.col("o_orderdate")).alias("weekday"))
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(dec_avg("o_totalprice", 4)).alias("avg_value"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank over the co-purchase graph: the iterative-algorithm shape
# (Brin & Page 1998), run for a FIXED number of synchronous iterations so
# the computation is a finite join/agg DAG both engines can evaluate.
# ---------------------------------------------------------------------------

PR_ITERATIONS = 3
PR_DAMPING = 0.85


def _pr_sql() -> str:
    """Chained-CTE PageRank: it0 = uniform, each iteration = one
    edges ⋈ ranks join + per-dst decimal-exact contribution sum.
    Every CTE AS MATERIALIZED (r10): DuckDB re-evaluates plain CTEs
    per reference, and each it_k references it_{k-1} + edges — without
    the fence the quadratic co-purchase join re-runs ~2^iters times
    (the sf1 sweep's chained-CTE finding class, see _bfs_sql)."""
    base = f"""
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS MATERIALIZED (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_COPURCHASE_ORDERS}
    ),
    edges AS MATERIALIZED (
        SELECT src, dst FROM pairs
        UNION ALL
        SELECT dst AS src, src AS dst FROM pairs
    ),
    deg AS MATERIALIZED (
        SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1
    ),
    nn AS MATERIALIZED (SELECT count(*) AS n FROM deg),
    it0 AS MATERIALIZED (
        SELECT node, deg, CAST(1 AS DOUBLE) / nn.n AS r
        FROM deg CROSS JOIN nn
    )"""
    for k in range(1, PR_ITERATIONS + 1):
        base += f""",
    c{k} AS MATERIALIZED (
        SELECT e.dst AS node,
               sum(CAST(p.r / p.deg AS DECIMAL(18,12))) AS contrib
        FROM edges e JOIN it{k - 1} p ON p.node = e.src
        GROUP BY 1
    ),
    it{k} AS MATERIALIZED (
        SELECT d.node, d.deg,
               CAST({1 - PR_DAMPING} AS DOUBLE) / nn.n
               + CAST({PR_DAMPING} AS DOUBLE)
                 * CAST(c{k}.contrib AS DOUBLE) AS r
        FROM deg d
        JOIN c{k} ON c{k}.node = d.node
        CROSS JOIN nn
    )"""
    return base + f"""
    SELECT node AS part_key, CAST(deg AS BIGINT) AS degree,
           round(r, 9) AS pagerank
    FROM it{PR_ITERATIONS}
    """


@register(
    "copurchase_pagerank",
    oracle=_pr_sql(),
    doc=(
        f"PageRank ({PR_ITERATIONS} synchronous iterations, damping "
        f"{PR_DAMPING}) over the undirected co-purchase part graph — "
        "the iterative-algorithm pattern (label propagation, k-means, "
        "embedding refinement) as a fixed join+agg chain. Each "
        "iteration is ONE shuffle: edges ⋈ ranks on src, contributions "
        "re-grouped on dst. Cross-engine exactness for an iterative "
        "double computation: each r/deg contribution is cast to "
        "DECIMAL(18,12) (double->decimal casts agree — doubles are "
        "binary, never half-way in decimal), the per-node sum is exact "
        "and order-independent, and the damping step is the same IEEE "
        "tree on identical inputs — so after three rounds the doubles "
        "are still bit-identical and the result hash-matches. At 100 TB "
        "the ranks frame is |nodes| (<< |edges|); co-partitioning edges "
        "by src across iterations reuses the shuffle, and every node "
        "has degree >= 1 by construction so no dangling-mass term. "
        "NOTE (r12 advice): this builder is EAGER — like the CC/index "
        "builders it runs one bounded 1-row aggregate (the node count, "
        "which doubles as the graph cache fill) at build time, so "
        "plan-only consumers executing the builder pay that job; "
        "callers must follow the release_cached convention."
    ),
    tags=("analytics", "graph", "join", "agg"),
    bench=True,
)
def copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    _baskets, _op, thresholded = _copurchase_pairs(spark, sf_dir, "src", "dst")
    pairs = thresholded.select("src", "dst")
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    # annotate each edge ONCE with its destination's degree, so an
    # iteration is exactly one join + one groupBy (no per-round deg
    # rejoin); the graph is reused 3x -> materialize it.
    # r11 (guide §2.3/§2.4, §5): the graph is now the ONLY persisted
    # frame — the r10 spelling ALSO persisted the raw edge list, but
    # everything downstream (deg for the rank init, the node count,
    # the iterations) derives from the annotated graph, so the edges
    # cache fill was a second materialization of the same rows (the
    # identical pair-groupBy exchange below is reused by Catalyst for
    # deg). The node-count column no longer rides every edge row nor
    # appears as 4 aggregate+broadcast subtrees: it is ONE bounded
    # 1-row driver aggregate over the persisted graph (the simsearch-
    # guard / PQ-codebook bounded-collect precedent; the job doubles
    # as the cache fill) folded into the damping expression as a
    # literal — the identical integer n, so every IEEE double is
    # unchanged. The graph is hash-partitioned by src BEFORE
    # persisting: each iteration's edges ⋈ ranks reuses the cached
    # partitioning and shuffles only the |V|-row rank frame — at
    # 100 TB (where ranks cannot broadcast) the old shape re-shuffled
    # the FULL edge list every iteration; locally AQE broadcasts
    # ranks either way.
    graph = (
        edges.join(
            deg.select(
                F.col("node").alias("dst"), F.col("deg").alias("dst_deg")
            ),
            "dst",
        )
        .repartition("src")
        .persist()
    )
    n_nodes = graph.select(F.countDistinct("dst").alias("n")).collect()[0][
        "n"
    ]
    nn = F.lit(n_nodes)
    # every node appears as a dst (edges are symmetric), and dst_deg
    # is constant per dst — so the rank init is a groupBy over the
    # cached graph instead of a second aggregation of the edge list
    ranks = graph.groupBy(F.col("dst").alias("node")).agg(
        F.max("dst_deg").alias("deg")
    ).select("node", "deg", (F.lit(1.0) / nn).alias("r"))
    for _ in range(PR_ITERATIONS):
        ranks = (
            graph.join(ranks, graph["src"] == ranks["node"])
            .groupBy(F.col("dst").alias("next_node"))
            .agg(
                F.sum(
                    (F.col("r") / F.col("deg")).cast("decimal(18,12)")
                ).alias("contrib"),
                F.max("dst_deg").alias("next_deg"),  # constant per dst
            )
            .select(
                F.col("next_node").alias("node"),
                F.col("next_deg").alias("deg"),
                (
                    F.lit(1 - PR_DAMPING) / nn
                    + F.lit(PR_DAMPING) * F.col("contrib").cast("double")
                ).alias("r"),
            )
        )
    out = ranks.select(
        F.col("node").alias("part_key"),
        F.col("deg").alias("degree"),
        F.round("r", 9).alias("pagerank"),
    )
    # the lease rides the result: the correctness harness (and any
    # caller following the release_cached convention) frees the graph
    # after its action — without this it stays pinned for the session
    out._cached_deps = [graph]
    return out


BLOOM_BRANDS = ("Brand#11", "Brand#23", "Brand#42")


@register(
    "bloom_pruned_brand_revenue",
    oracle=f"""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           {dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN {BLOOM_BRANDS}
    GROUP BY 1
    """,
    doc=(
        "Revenue for three brands via an EXPLICIT bloom runtime filter "
        "(operators/bloomjoin): the filtered part side's keys build an "
        "m-bit bitmap (one bounded aggregate), every lineitem row checks "
        "its k bits with JVM expressions BEFORE the join shuffle, and "
        "the join itself removes the ~0.6% false positives — so the "
        "oracle is the PLAIN join (the bloom changes the plan, never "
        "the answer; no false negatives by construction). At 100 TB "
        "this is sideways information passing: only the ~2% of fact "
        "rows matching the dim filter enter the shuffle. The "
        "pruning-actually-prunes property is pinned in pytest "
        "(test_operators.test_bloom_join)."
    ),
    tags=("analytics", "join", "agg", "scale"),
)
def bloom_pruned_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.bloomjoin import (
        bloom_join,
    )

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*BLOOM_BRANDS)
    )
    joined = bloom_join(li, part, "l_partkey", "p_partkey")
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_lines"),
        F.expr(dec_sum("l_extendedprice * (1 - l_discount)")).alias(
            "revenue"
        ),
    )


HIST_BIN_W = 25_000
HIST_BINS = 24  # values clamp into the last bin


@register(
    "weekly_histogram_percentiles",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               least(CAST(floor(o_totalprice / {HIST_BIN_W}) AS INTEGER),
                     {HIST_BINS - 1}) AS bin,
               count(*) AS cnt
        FROM orders GROUP BY 1, 2
    ),
    weekly AS (
        SELECT CAST(date_trunc('week', day) AS DATE) AS week_start,
               bin, sum(cnt) AS cnt
        FROM daily GROUP BY 1, 2
    ),
    cum AS (
        SELECT week_start, bin, cnt,
               sum(cnt) OVER (PARTITION BY week_start ORDER BY bin) AS cum,
               sum(cnt) OVER (PARTITION BY week_start) AS total
        FROM weekly
    )
    SELECT week_start,
           CAST(max(total) AS BIGINT) AS n_orders,
           CAST((min(CASE WHEN 2 * cum >= total THEN bin END) + 1)
                * {HIST_BIN_W} AS DOUBLE) AS p50_upper,
           CAST((min(CASE WHEN 20 * cum >= 19 * total THEN bin END) + 1)
                * {HIST_BIN_W} AS DOUBLE) AS p95_upper
    FROM cum
    GROUP BY week_start
    """,
    doc=(
        "Mergeable-histogram percentile rollup — the quantile sibling "
        "of weekly_uniques_hll_rollup: per-day equi-width bin counts "
        "(a long-form histogram IS a mergeable sketch: merging = "
        "summing counts per bin) roll up to weekly p50/p95 bounds "
        "without a second pass over the orders — at 100 TB the daily "
        "histograms live in the daily mart and any coarser percentile "
        "is sketch algebra over #bins rows. Percentile selection uses "
        "pure integer comparisons (2*cum >= total, 20*cum >= "
        "19*total), so unlike approx_percentile the result is exactly "
        "reproducible cross-engine — hash-exact, no tolerance."
    ),
    tags=("analytics", "agg", "approx", "window"),
)
def weekly_histogram_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day"),
        F.least(
            F.floor(F.col("o_totalprice") / HIST_BIN_W).cast("int"),
            F.lit(HIST_BINS - 1),
        ).alias("bin"),
    ).agg(F.count("*").alias("cnt"))
    weekly = daily.groupBy(
        F.date_trunc("week", "day").cast("date").alias("week_start"),
        "bin",
    ).agg(F.sum("cnt").alias("cnt"))
    wcum = W.partitionBy("week_start").orderBy("bin")
    wall = W.partitionBy("week_start")
    cum = weekly.select(
        "week_start",
        "bin",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("total"),
    )
    return cum.groupBy("week_start").agg(
        F.max("total").alias("n_orders"),
        (
            (
                F.min(F.when(2 * F.col("cum") >= F.col("total"), F.col("bin")))
                + 1
            )
            * HIST_BIN_W
        )
        .cast("double")
        .alias("p50_upper"),
        (
            (
                F.min(
                    F.when(
                        20 * F.col("cum") >= 19 * F.col("total"), F.col("bin")
                    )
                )
                + 1
            )
            * HIST_BIN_W
        )
        .cast("double")
        .alias("p95_upper"),
    )


@register(
    "repeat_purchase_intervals",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day',
                   lag(CAST(o_orderdate AS DATE)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey),
                   CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
    )
    SELECT o_custkey AS c_custkey,
           CAST(count(gap_days) AS BIGINT) AS n_repeats,
           CAST(min(gap_days) AS BIGINT) AS min_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days,
           CAST(sum(gap_days) AS BIGINT) AS total_gap_days
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY 1
    """,
    doc=(
        "Repeat-purchase behavior: per-customer inter-order gaps via a "
        "lag window (full tie-break on o_orderkey), aggregated to "
        "min/max/total gap days — the reorder-cadence profile behind "
        "replenishment and churn models. One customer-key shuffle "
        "shared by the window and the aggregate (same partitioning); "
        "all-integer day arithmetic, hash-exact."
    ),
    tags=("analytics", "window", "agg"),
)
def repeat_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"),
            F.lag(F.to_date("o_orderdate")).over(w),
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("gap_days").alias("n_repeats"),
        F.min("gap_days").cast("long").alias("min_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
        F.sum("gap_days").cast("long").alias("total_gap_days"),
    )


@register(
    "clv_cohort_revenue",
    oracle=f"""
    WITH firsts AS (
        SELECT o_custkey,
               min(date_trunc('month', CAST(o_orderdate AS DATE)))
                   AS cohort_month
        FROM orders GROUP BY 1
    ),
    facts AS (
        SELECT f.cohort_month,
               date_diff('month', f.cohort_month,
                         date_trunc('month', CAST(o.o_orderdate AS DATE)))
                   AS months_since,
               o.o_totalprice
        FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    )
    SELECT CAST(cohort_month AS DATE) AS cohort_month,
           CAST(months_since AS BIGINT) AS months_since,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dec_sum('o_totalprice')} AS revenue
    FROM facts
    WHERE months_since <= 11
    GROUP BY 1, 2
    """,
    doc=(
        "Customer-lifetime-value decomposition: revenue by acquisition "
        "cohort x months-since-acquisition (first year) — the CLV "
        "triangle that funds acquisition-spend decisions, the revenue "
        "sibling of weekly_cohort_retention. Two customer-key shuffles "
        "(first-order month, then the cohort join — AQE broadcasts the "
        "|customers| side when it fits) + one cohort-cell aggregate; "
        "month arithmetic pinned via date_trunc/months_between floor "
        "identically on both engines."
    ),
    tags=("analytics", "agg", "join"),
)
def clv_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.to_date("o_orderdate"))).alias(
            "cohort_month"
        )
    )
    facts = orders.join(firsts, "o_custkey").select(
        "cohort_month",
        F.floor(
            F.months_between(
                F.date_trunc("month", F.to_date("o_orderdate")),
                F.col("cohort_month"),
            )
        )
        .cast("long")
        .alias("months_since"),
        "o_totalprice",
    )
    return (
        facts.filter(F.col("months_since") <= 11)
        .groupBy(
            F.col("cohort_month").cast("date").alias("cohort_month"),
            "months_since",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(dec_sum("o_totalprice")).alias("revenue"),
        )
    )


BFS_ROUNDS = 3


def _bfs_sql() -> str:
    """Chained-CTE BFS over the co-purchase graph: d_{k+1} = min(d_k,
    1 + d_k of any in-neighbor). Pure integer arithmetic — hash-exact.

    Every CTE is AS MATERIALIZED (r10, found by the sf1 sweep): DuckDB
    re-evaluates plain CTEs per REFERENCE, and here each d_k references
    d_{k-1} twice and `edges` once — without materialization the
    quadratic co-purchase self-join re-runs ~2^rounds times (the exact
    r9 recursive-CTE finding class, in chained form; 25+ min at sf1,
    seconds when pinned)."""
    sql = f"""
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS MATERIALIZED (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_COPURCHASE_ORDERS}
    ),
    edges AS MATERIALIZED (
        SELECT src, dst FROM pairs
        UNION ALL
        SELECT dst AS src, src AS dst FROM pairs
    ),
    d0 AS MATERIALIZED (SELECT min(src) AS node, 0 AS dist FROM edges)"""
    for k in range(1, BFS_ROUNDS + 1):
        sql += f""",
    d{k} AS MATERIALIZED (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM d{k - 1}
            UNION ALL
            SELECT e.dst AS node, d.dist + 1 AS dist
            FROM d{k - 1} d JOIN edges e ON e.src = d.node
        ) frontier GROUP BY node
    )"""
    return sql + f"""
    SELECT node AS part, CAST(dist AS BIGINT) AS hops
    FROM d{BFS_ROUNDS}
    """


@register(
    "copurchase_bfs_distances",
    oracle=_bfs_sql(),
    doc=(
        f"Breadth-first shortest hop distances ({BFS_ROUNDS} synchronous "
        "rounds) from the lowest-id part over the co-purchase graph — "
        "the graph-traversal sibling of copurchase_pagerank (value "
        "iteration) and neardup_clusters (pointer jumping): frontier "
        "expansion as a bounded join/agg chain, the recursive-CTE "
        "workload expressed Spark-native. Each round is ONE shuffle "
        "(frontier ⋈ edges on src, re-min on node); the frontier frame "
        "is <= |reached nodes|, never |edges|, and the edge list is "
        "persisted once and co-partitioned by src across rounds. All "
        "integer arithmetic: hash-exact with no float contract at all."
    ),
    tags=("analytics", "graph", "join", "agg"),
)
def copurchase_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 (the proven pagerank recipe, guide §2.4/§5): the edge list is
    # hash-partitioned by src BEFORE the persist, so every round's
    # frontier ⋈ edges reuses the cached partitioning and shuffles only
    # the frontier (at 100 TB, where the frontier cannot broadcast, the
    # old shape re-shuffled the full edge list every round); the BFS
    # source (min part key) is ONE bounded 1-row driver aggregate whose
    # job doubles as the cache fill, folded in as a literal — the old
    # shape carried the min-aggregate subtree inside every round's
    # frontier lineage (2^k copies by round k under the union+groupBy
    # doubling). Identical integer source -> identical integer hops.
    _baskets, _op, thresholded = _copurchase_pairs(spark, sf_dir, "src", "dst")
    pairs = thresholded.select("src", "dst")
    edges = (
        pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition("src")
        .persist()
    )
    start = edges.agg(F.min("src").alias("node")).collect()[0]["node"]
    dist = spark.range(1).select(
        F.lit(start).cast("long").alias("node"), F.lit(0).alias("dist")
    )
    for _ in range(BFS_ROUNDS):
        hop = (
            edges.join(dist, edges["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(hop).groupBy("node").agg(F.min("dist").alias("dist"))
        )
    out = dist.select(
        F.col("node").alias("part"), F.col("dist").cast("long").alias("hops")
    )
    out._cached_deps = [edges]  # released by the harness/caller post-action
    return out


def _forecast_sql(d: str) -> str:
    """Trend + weekday-seasonality forecast as one SQL template per
    dialect; every sum is decimal-exact and the closed-form arithmetic
    is the same IEEE expression tree, so the 7 forecast doubles are
    bit-identical cross-engine (emitted unrounded)."""
    if d == "spark":
        series = "SELECT explode(sequence(1, 7)) AS step"
        wday = "weekday({x})"
        nextd = "date_add(dmax, step)"
        ddiff = "datediff(d, d0)"
    else:
        series = "SELECT unnest(generate_series(1, 7)) AS step"
        wday = "(isodow({x}) - 1)"
        nextd = "dmax + CAST(step AS INTEGER)"
        ddiff = "(d - d0)"
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders GROUP BY 1
    ),
    bounds AS (SELECT min(d) AS d0, max(d) AS dmax FROM daily),
    idx AS (
        SELECT d, y, {ddiff} AS i, {wday.format(x='d')} AS w
        FROM daily CROSS JOIN bounds
    ),
    g AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(i) AS DOUBLE) AS si,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(i * y) AS DOUBLE) AS siy,
               CAST(sum(CAST(i AS BIGINT) * i) AS DOUBLE) AS sii
        FROM idx
    ),
    fit AS (
        SELECT n, si, sy,
               (n * siy - si * sy) / (n * sii - si * si) AS slope
        FROM g
    ),
    wd AS (
        SELECT w, CAST(sum(y) AS DOUBLE) AS syw,
               CAST(count(*) AS DOUBLE) AS cw
        FROM idx GROUP BY w
    ),
    future AS (
        SELECT step, {nextd} AS fdate
        FROM ({series}) s CROSS JOIN bounds
    )
    SELECT f.fdate AS forecast_date,
           CAST({wday.format(x='f.fdate')} AS INTEGER) AS weekday,
           (fit.sy - fit.slope * fit.si) / fit.n
               + fit.slope * (g2.imax + f.step)
               + (wd.syw / wd.cw - fit.sy / fit.n) AS forecast_revenue
    FROM future f
    CROSS JOIN fit
    CROSS JOIN (SELECT max(i) AS imax FROM idx) g2
    JOIN wd ON wd.w = {wday.format(x='f.fdate')}
    """


@register(
    "forecast_next_week_revenue",
    oracle=_forecast_sql("duck"),
    doc=(
        "In-engine forecasting: next-7-day revenue = closed-form OLS "
        "linear trend over the daily series plus an additive "
        "day-of-week seasonal deviation (weekday mean minus grand "
        "mean) — the decomposition a capacity-planning dashboard runs. "
        "Training is five decimal-exact moment sums + a 7-row weekday "
        "aggregate (two constant-size reducers after partial aggs); "
        "the forecast itself is a 7-row cross join. Weekday pinned to "
        "0=Monday on both engines (Spark weekday() vs DuckDB "
        "isodow()-1). Forecast doubles are bit-identical — exact "
        "decimal moments through one shared IEEE expression tree — "
        "and emitted unrounded."
    ),
    tags=("analytics", "timeseries", "ml", "agg"),
)
def forecast_next_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_forecast_sql("spark"))


@register(
    "revenue_share_within_nation",
    oracle="""
    WITH per AS (
        SELECT c.c_nationkey, o.o_orderstatus,
               sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    )
    SELECT c_nationkey, o_orderstatus,
           round(CAST(rev AS DOUBLE), 2) AS revenue,
           CAST(rev AS DOUBLE)
               / CAST(sum(rev) OVER (PARTITION BY c_nationkey) AS DOUBLE)
               AS share_of_nation
    FROM per
    """,
    doc=(
        "Ratio-to-report window (share-of-parent): each (nation, "
        "status) cell's revenue as a fraction of its nation's total — "
        "the percent-of-total shape every BI layer ships as "
        "RATIO_TO_REPORT. One key shuffle for the cell aggregate; the "
        "window total reuses the same partitioning (no second "
        "exchange). Both numerator and denominator are exact decimal "
        "sums cast once to double, so the single division is "
        "bit-identical cross-engine and emitted unrounded."
    ),
    tags=("analytics", "window", "agg"),
)
def revenue_share_within_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    per = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_nationkey", "o_orderstatus")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.partitionBy("c_nationkey")
    return per.select(
        "c_nationkey",
        "o_orderstatus",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        (
            F.col("rev").cast("double")
            / F.sum("rev").over(w).cast("double")
        ).alias("share_of_nation"),
    )


@register(
    "order_priority_transitions",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_orderpriority AS cur,
               lag(o_orderpriority) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS prev
        FROM orders
    ),
    trans AS (
        SELECT prev, cur, count(*) AS n
        FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur
    )
    SELECT prev AS from_priority, cur AS to_priority,
           CAST(n AS BIGINT) AS n_transitions,
           CAST(n AS DOUBLE)
               / CAST(sum(n) OVER (PARTITION BY prev) AS DOUBLE)
               AS transition_prob
    FROM trans
    """,
    doc=(
        "First-order Markov transition matrix over each customer's "
        "order-priority sequence (the behavioral sequence-model "
        "statistic: what follows what): lag over one customer shuffle, "
        "count per (prev, cur), row-normalize with a ratio-to-report "
        "window on the count aggregate's own partitioning. Integer "
        "counts; probabilities are single divisions of exact integers "
        "— bit-identical, emitted unrounded. 5x5 output regardless of "
        "corpus size (constant reducer after partial aggregation)."
    ),
    tags=("analytics", "window", "agg", "timeseries"),
)
def order_priority_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.col("o_orderpriority").alias("cur"),
        F.lag("o_orderpriority").over(w).alias("prev"),
    ).where(F.col("prev").isNotNull())
    trans = seq.groupBy("prev", "cur").agg(F.count("*").alias("n"))
    wp = Window.partitionBy("prev")
    return trans.select(
        F.col("prev").alias("from_priority"),
        F.col("cur").alias("to_priority"),
        F.col("n").cast("long").alias("n_transitions"),
        (F.col("n").cast("double") / F.sum("n").over(wp).cast("double")).alias(
            "transition_prob"
        ),
    )


@register(
    "repeat_order_conversion_curve",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               min(o_orderdate) AS first_dt
        FROM orders GROUP BY o_custkey
    ),
    second AS (
        SELECT o.o_custkey,
               min(o.o_orderdate) AS second_dt
        FROM orders o JOIN firsts f
          ON o.o_custkey = f.o_custkey AND o.o_orderdate > f.first_dt
        GROUP BY o.o_custkey
    ),
    base AS (SELECT CAST(count(*) AS DOUBLE) AS n_customers FROM firsts),
    gaps AS (
        SELECT f.o_custkey,
               CAST(CAST(s.second_dt AS DATE) - CAST(f.first_dt AS DATE)
                    AS BIGINT) AS gap_days
        FROM firsts f JOIN second s ON f.o_custkey = s.o_custkey
    ),
    weeks AS (SELECT unnest(generate_series(1, 12)) AS week)
    SELECT CAST(week AS INTEGER) AS week,
           CAST((SELECT count(*) FROM gaps
                 WHERE gap_days <= week * 7) AS BIGINT) AS n_converted,
           CAST((SELECT count(*) FROM gaps WHERE gap_days <= week * 7)
                AS DOUBLE) / b.n_customers AS conversion_frac
    FROM weeks CROSS JOIN base b
    """,
    doc=(
        "Repeat-purchase conversion curve (the retention/survival view "
        "marketing runs): for every customer's first order, the "
        "cumulative fraction who placed a SECOND order within w weeks, "
        "w = 1..12. Two customer-keyed aggregates (first date, second "
        "date via a self-join bounded below by the first) and a 12-row "
        "curve — the heavy work is two shuffles on o_custkey sharing "
        "one partitioning. Exact integer day gaps; fractions are "
        "single divisions of exact counts, bit-identical cross-engine."
    ),
    tags=("analytics", "timeseries", "agg"),
)
def repeat_order_conversion_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    firsts = orders.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    second = (
        orders.join(firsts, "o_custkey")
        .where(F.col("o_orderdate") > F.col("first_dt"))
        .groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("second_dt"))
    )
    gaps = firsts.join(second, "o_custkey").select(
        F.datediff(
            F.col("second_dt").cast("date"), F.col("first_dt").cast("date")
        ).cast("long").alias("gap_days")
    )
    base = firsts.agg(F.count("*").cast("double").alias("n_customers"))
    weeks = spark.range(1, 13).select(F.col("id").cast("int").alias("week"))
    counts = (
        weeks.crossJoin(gaps)
        .where(F.col("gap_days") <= F.col("week") * 7)
        .groupBy("week")
        .agg(F.count("*").alias("n_converted"))
    )
    return (
        weeks.join(counts, "week", "left")
        .crossJoin(F.broadcast(base))
        .select(
            "week",
            F.coalesce("n_converted", F.lit(0)).cast("long").alias("n_converted"),
            (
                F.coalesce("n_converted", F.lit(0)).cast("double")
                / F.col("n_customers")
            ).alias("conversion_frac"),
        )
    )


@register(
    "basket_association_rules",
    oracle=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    item_n AS (SELECT l_partkey, count(*) AS n_orders FROM op GROUP BY 1),
    n_baskets AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS nb FROM op),
    pairs AS (
        SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
               count(*) AS n_together
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_COPURCHASE_ORDERS}
    )
    SELECT p.antecedent, p.consequent,
           CAST(p.n_together AS BIGINT) AS n_together,
           CAST(p.n_together AS DOUBLE) / ia.n_orders AS confidence,
           (CAST(p.n_together AS DOUBLE) / nb.nb)
               / ((ia.n_orders / nb.nb) * (ic.n_orders / nb.nb)) AS lift
    FROM pairs p
    JOIN item_n ia ON ia.l_partkey = p.antecedent
    JOIN item_n ic ON ic.l_partkey = p.consequent
    CROSS JOIN n_baskets nb
    """,
    doc=(
        "DIRECTED association rules (A => B) over the basket matrix: "
        "confidence = P(B|A) and lift from exact basket counts — the "
        "asymmetric complement of copurchase_part_pairs' symmetric "
        "affinity. One basket-blocked self-join (pair fan-out bounded "
        "by basket size, never |parts|^2), per-item counts broadcast "
        "back onto the pairs. All ratios divide exact integers in one "
        "shared IEEE expression order — bit-identical, unrounded."
    ),
    tags=("analytics", "join", "agg"),
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    baskets, op, pairs = _copurchase_pairs(
        spark, sf_dir, "antecedent", "consequent", symmetric=True
    )
    item_n = op.groupBy("l_partkey").agg(F.count("*").alias("n_orders"))
    # count(*) over baskets == countDistinct(l_orderkey) over op
    # without a distinct shuffle (r11, guide §2.4)
    nb = baskets.agg(F.count("*").cast("double").alias("nb"))
    ia = item_n.select(
        F.col("l_partkey").alias("antecedent"), F.col("n_orders").alias("n_a")
    )
    ic = item_n.select(
        F.col("l_partkey").alias("consequent"), F.col("n_orders").alias("n_c")
    )
    return (
        pairs.join(ia, "antecedent")
        .join(ic, "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            F.col("n_together").cast("long").alias("n_together"),
            (F.col("n_together").cast("double") / F.col("n_a")).alias(
                "confidence"
            ),
            (
                (F.col("n_together").cast("double") / F.col("nb"))
                / (
                    (F.col("n_a") / F.col("nb"))
                    * (F.col("n_c") / F.col("nb"))
                )
            ).alias("lift"),
        )
    )


@register(
    "duplicate_invoice_screen",
    oracle="""
    SELECT a.o_custkey,
           a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
           round(a.o_totalprice, 2) AS amount_a,
           round(b.o_totalprice, 2) AS amount_b,
           CAST(CAST(b.o_orderdate AS DATE) - CAST(a.o_orderdate AS DATE)
                AS BIGINT) AS days_apart
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND floor(a.o_totalprice / 10000) = floor(b.o_totalprice / 10000)
     AND a.o_orderkey < b.o_orderkey
     AND abs(CAST(b.o_orderdate AS DATE) - CAST(a.o_orderdate AS DATE)) <= 30
    """,
    doc=(
        "Duplicate-transaction screening (the billing/fraud dedup "
        "shape): order pairs from the same customer with SIMILAR "
        "amounts (same 10k-unit bucket) within 30 days — candidates a "
        "review queue would inspect. The equi-join keys (custkey, "
        "amount bucket) are the blocking key; the date-window predicate "
        "is a residual filter on an already-tiny block, so the plan is "
        "one hash join, never a range cross product. floor() of "
        "identical doubles and integer day gaps: hash-exact."
    ),
    tags=("analytics", "join", "dedup"),
)
def duplicate_invoice_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.select(
        "o_custkey",
        F.col("o_orderkey").alias("orderkey_a"),
        F.col("o_totalprice").alias("price_a"),
        F.floor(F.col("o_totalprice") / 10000).alias("bucket_a"),
        F.col("o_orderdate").cast("date").alias("date_a"),
    )
    b = orders.select(
        F.col("o_custkey").alias("ck_b"),
        F.col("o_orderkey").alias("orderkey_b"),
        F.col("o_totalprice").alias("price_b"),
        F.floor(F.col("o_totalprice") / 10000).alias("bucket_b"),
        F.col("o_orderdate").cast("date").alias("date_b"),
    )
    return (
        a.join(
            b,
            (F.col("o_custkey") == F.col("ck_b"))
            & (F.col("bucket_a") == F.col("bucket_b"))
            & (F.col("orderkey_a") < F.col("orderkey_b")),
        )
        .where(F.abs(F.datediff("date_b", "date_a")) <= 30)
        .select(
            "o_custkey",
            "orderkey_a",
            "orderkey_b",
            F.round(F.col("price_a"), 2).alias("amount_a"),
            F.round(F.col("price_b"), 2).alias("amount_b"),
            F.datediff("date_b", "date_a").cast("long").alias("days_apart"),
        )
    )


@register(
    "pareto_revenue_concentration",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT sum(rev) AS total, count(*) AS n_cust FROM per_cust),
    ranked AS (
        SELECT o_custkey, rev,
               sum(rev) OVER (ORDER BY rev DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_rev,
               row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk
        FROM per_cust
    )
    SELECT CAST(min(CASE WHEN cum_rev * 10 >= total * 8 THEN rk END)
                AS BIGINT) AS customers_to_80pct,
           CAST(max(t.n_cust) AS BIGINT) AS n_customers,
           CAST(min(CASE WHEN cum_rev * 10 >= total * 8 THEN rk END)
                AS DOUBLE) / max(t.n_cust) AS top_frac_for_80pct
    FROM ranked CROSS JOIN tot t
    """,
    doc=(
        "Pareto revenue concentration: how many of the highest-revenue "
        "customers account for 80% of total revenue (the 80/20 "
        "diagnostic). Exact decimal cumulative sums over a total-order "
        "window with a full tie-break; the 80% crossing is the INTEGER "
        "comparison cum_rev*10 >= total*8 — exact decimal arithmetic "
        "with no float threshold to straddle. Scale shape (VERDICT r3 "
        "wrong #2): the global ranking is range-bucketed on rev — "
        "per-bucket parallel windows (row_number + decimal cumsum, "
        "ordered rev DESC within bucket) shifted by broadcast "
        "cumulative bucket count/sum offsets collected from a bounded "
        "64-row agg. Equal rev values co-bucket (equal-width value "
        "bucketing), so the custkey tie-break is globally correct and "
        "cum_rev/rk match the oracle's single global window exactly — "
        "with no single-reducer stage over the |customers|-row frame."
    ),
    tags=("analytics", "window", "agg"),
)
def pareto_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from decimal import Decimal

    from pyspark.sql import Window

    N_BUCKETS = 64
    orders = table(spark, sf_dir, "orders")
    # persist: consumed by three-plus actions/branches (min-max probe,
    # per-bucket stats collect, the ranked plan AND the tot cross-join)
    # — the same shape operators/ids.py persists for; without it each
    # consumer re-scans orders and redoes the groupBy shuffle. Lease
    # rides the result (release_cached convention).
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    ).persist()
    tot = per_cust.agg(
        F.sum("rev").alias("total"), F.count("*").alias("n_cust")
    )
    lo, hi = per_cust.agg(F.min("rev"), F.max("rev")).first()
    if lo is None:  # empty input: degenerate global window is fine
        w = Window.orderBy(F.desc("rev"), F.asc("o_custkey"))
        ranked = per_cust.select(
            "rev",
            F.sum("rev")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum_rev"),
            F.row_number().over(w).alias("rk"),
        )
    else:
        span = float(hi) - float(lo) + 1.0
        bucket = F.least(
            F.lit(N_BUCKETS - 1),
            (
                (F.col("rev").cast("double") - F.lit(float(lo)))
                / F.lit(span)
                * F.lit(N_BUCKETS)
            ).cast("long"),
        )
        bucketed = per_cust.withColumn("__bucket", bucket)
        stats = {
            r["__bucket"]: (r["cnt"], r["s"])
            for r in bucketed.groupBy("__bucket")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("rev").alias("s"))
            .collect()
        }
        # descending order: offsets accumulate from the HIGHEST bucket
        rk_off: dict[int, int] = {}
        rev_off: dict[int, Decimal] = {}
        acc_n, acc_s = 0, Decimal(0)
        for i in range(N_BUCKETS - 1, -1, -1):
            rk_off[i] = acc_n
            rev_off[i] = acc_s
            cnt, s = stats.get(i, (0, None))
            acc_n += cnt
            acc_s += s if s is not None else Decimal(0)
        rk_map = F.create_map(
            *[
                x
                for i in range(N_BUCKETS)
                for x in (F.lit(i), F.lit(rk_off[i]))
            ]
        )
        rev_map = F.create_map(
            *[
                x
                for i in range(N_BUCKETS)
                for x in (
                    F.lit(i),
                    F.lit(str(rev_off[i])).cast("decimal(38,2)"),
                )
            ]
        )
        wb = Window.partitionBy("__bucket").orderBy(
            F.desc("rev"), F.asc("o_custkey")
        )
        ranked = bucketed.select(
            "rev",
            (
                F.sum("rev")
                .over(wb.rowsBetween(Window.unboundedPreceding, 0))
                + rev_map[F.col("__bucket")]
            ).alias("cum_rev"),
            (F.row_number().over(wb) + rk_map[F.col("__bucket")]).alias(
                "rk"
            ),
        )
    crossing = F.min(
        F.when(F.col("cum_rev") * 10 >= F.col("total") * 8, F.col("rk"))
    )
    out = (
        ranked.crossJoin(F.broadcast(tot))
        .agg(
            crossing.cast("long").alias("customers_to_80pct"),
            F.max("n_cust").cast("long").alias("n_customers"),
            (crossing.cast("double") / F.max("n_cust")).alias(
                "top_frac_for_80pct"
            ),
        )
    )
    out._cached_deps = [per_cust]
    return out


@register(
    "dau_wau_stickiness",
    oracle=f"""
    {EVENTS_CTE},
    daily AS (
        SELECT CAST(ts AS DATE) AS d,
               count(DISTINCT user_id) AS dau
        FROM ev GROUP BY 1
    ),
    weekly AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
               count(DISTINCT user_id) AS wau
        FROM ev GROUP BY 1
    )
    SELECT d.d AS day, CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           CAST(d.dau AS DOUBLE) / w.wau AS stickiness
    FROM daily d
    JOIN weekly w ON CAST(date_trunc('week', CAST(d.d AS TIMESTAMP)) AS DATE) = w.wk
    """,
    doc=(
        "DAU/WAU stickiness (the product-engagement ratio): daily and "
        "ISO-week distinct active users over the events stream, joined "
        "on the day's week. Two countDistinct shuffles on the "
        "time-bucket keys (each mergeable to HLL sketches at 100 TB — "
        "see weekly_uniques_hll_rollup for exactly that upgrade path); "
        "stickiness divides exact integers, bit-identical unrounded. "
        "date_trunc('week') is ISO-Monday in both engines."
    ),
    tags=("events", "analytics", "agg"),
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("ts", "user_id")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("wk")
    ).agg(F.countDistinct("user_id").alias("wau"))
    return (
        daily.join(
            weekly,
            F.date_trunc("week", F.col("day").cast("timestamp")).cast("date")
            == F.col("wk"),
        )
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


SPATIAL_R2 = 400  # neighbor radius^2 = 20^2 (grid cell = radius, 3x3 covers)


@register(
    "spatial_neighbor_pairs",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST((c_custkey * c_custkey * 13 + c_custkey * 7) % 1000
                    AS BIGINT) AS x,
               CAST((c_custkey * c_custkey * 29 + c_custkey * 3) % 1000
                    AS BIGINT) AS y
        FROM customer
    ),
    cells AS (
        SELECT c_custkey, x, y, x // 20 AS cx, y // 20 AS cy FROM pts
    ),
    shifted AS (
        SELECT c.c_custkey, c.x, c.y,
               c.cx + dx.d AS cx, c.cy + dy.d AS cy
        FROM cells c
        JOIN (VALUES (-1), (0), (1)) dx(d) ON true
        JOIN (VALUES (-1), (0), (1)) dy(d) ON true
    )
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
    FROM shifted a JOIN cells b ON a.cx = b.cx AND a.cy = b.cy
    WHERE a.c_custkey < b.c_custkey
      AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {SPATIAL_R2}
    """,
    doc=(
        "Grid-blocked spatial neighbor join (the geospatial join shape: "
        "geohash/S2-style binning): points land in radius-sized grid "
        "cells, each point probes its 3x3 cell neighborhood (a 9-way "
        "shifted replication of one side), the join runs on the CELL "
        "equi-key, and the exact distance predicate filters residually "
        "— never an all-pairs cross product; cost is density-bounded "
        "per cell exactly like the LSH-band and shingle blocks "
        "elsewhere in the engine. Coordinates derive deterministically "
        "from keys via a quadratic hash (the testdata carries no geo "
        "columns; a linear map would lattice the points apart); "
        "all-integer "
        "squared distances, hash-exact."
    ),
    tags=("analytics", "join", "spatial"),
)
def spatial_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    pts = cust.select(
        "c_custkey",
        (
            (F.col("c_custkey") * F.col("c_custkey") * 13
             + F.col("c_custkey") * 7) % 1000
        ).cast("long").alias("x"),
        (
            (F.col("c_custkey") * F.col("c_custkey") * 29
             + F.col("c_custkey") * 3) % 1000
        ).cast("long").alias("y"),
    ).withColumn("cx", F.floor(F.col("x") / 20)).withColumn(
        "cy", F.floor(F.col("y") / 20)
    )
    d = spark.range(-1, 2).select(F.col("id").alias("d"))
    shifted = (
        pts.crossJoin(F.broadcast(d.select(F.col("d").alias("dx"))))
        .crossJoin(F.broadcast(d.select(F.col("d").alias("dy"))))
        .select(
            F.col("c_custkey").alias("custkey_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("jcx"),
            (F.col("cy") + F.col("dy")).alias("jcy"),
        )
    )
    right = pts.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jcx"),
        F.col("cy").alias("jcy"),
    )
    dist2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        shifted.join(right, ["jcx", "jcy"])
        .where(
            (F.col("custkey_a") < F.col("custkey_b"))
            & (dist2 <= SPATIAL_R2)
        )
        .select(
            "custkey_a", "custkey_b", dist2.cast("long").alias("dist2")
        )
    )


@register(
    "supplier_hhi_by_part",
    oracle="""
    WITH vol AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
        SELECT l_partkey, sum(rev) AS total, count(*) AS n_suppliers
        FROM vol GROUP BY 1
    )
    SELECT v.l_partkey,
           CAST(max(t.n_suppliers) AS BIGINT) AS n_suppliers,
           CAST(sum(CAST(round(
               (CAST(v.rev AS DOUBLE) / CAST(t.total AS DOUBLE))
               * (CAST(v.rev AS DOUBLE) / CAST(t.total AS DOUBLE)), 12)
               AS DECIMAL(18,12))) AS DOUBLE) AS hhi
    FROM vol v JOIN tot t ON v.l_partkey = t.l_partkey
    GROUP BY v.l_partkey
    HAVING count(*) >= 3
    """,
    doc=(
        "Supplier concentration per part: the Herfindahl-Hirschman "
        "index (sum of squared revenue shares) over each part's "
        "suppliers — the supply-chain-risk metric procurement runs "
        "(HHI -> 1 means a single-supplier dependency). Two aggregates "
        "sharing one partkey partitioning plus a same-key join. "
        "Each share is an exact-decimal over exact-decimal double "
        "division (identical both engines); squared shares are rounded "
        "to 12 decimals and decimal-summed, so the HHI is order-"
        "independent and hash-exact. Parts with fewer than 3 suppliers "
        "are dropped as trivially concentrated."
    ),
    tags=("analytics", "agg", "join"),
)
def supplier_hhi_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    vol = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
    )
    tot = vol.groupBy("l_partkey").agg(
        F.sum("rev").alias("total"), F.count("*").alias("n_suppliers")
    )
    share = F.col("rev").cast("double") / F.col("total").cast("double")
    return (
        vol.join(tot, "l_partkey")
        .groupBy("l_partkey")
        .agg(
            F.max("n_suppliers").cast("long").alias("n_suppliers"),
            F.sum(F.round(share * share, 12).cast("decimal(18,12)"))
            .cast("double")
            .alias("hhi"),
            F.count("*").alias("__n"),
        )
        .where(F.col("__n") >= 3)
        .drop("__n")
    )


def _decompose_sql(d: str) -> str:
    """Trend + seasonality + residual decomposition sharing the
    forecast's fitted components (same CTE algebra, per-day output)."""
    if d == "spark":
        wday = "weekday({x})"
        ddiff = "datediff(d, d0)"
    else:
        wday = "(isodow({x}) - 1)"
        ddiff = "(d - d0)"
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders GROUP BY 1
    ),
    bounds AS (SELECT min(d) AS d0 FROM daily),
    idx AS (
        SELECT d, y, {ddiff} AS i, {wday.format(x='d')} AS w
        FROM daily CROSS JOIN bounds
    ),
    g AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(i) AS DOUBLE) AS si,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(i * y) AS DOUBLE) AS siy,
               CAST(sum(CAST(i AS BIGINT) * i) AS DOUBLE) AS sii
        FROM idx
    ),
    fit AS (
        SELECT n, si, sy,
               (n * siy - si * sy) / (n * sii - si * si) AS slope
        FROM g
    ),
    wd AS (
        SELECT w, CAST(sum(y) AS DOUBLE) AS syw,
               CAST(count(*) AS DOUBLE) AS cw
        FROM idx GROUP BY w
    )
    SELECT i.d AS day,
           CAST(i.y AS DOUBLE) AS observed,
           (fit.sy - fit.slope * fit.si) / fit.n + fit.slope * i.i AS trend,
           wd.syw / wd.cw - fit.sy / fit.n AS seasonal,
           CAST(i.y AS DOUBLE)
               - ((fit.sy - fit.slope * fit.si) / fit.n + fit.slope * i.i)
               - (wd.syw / wd.cw - fit.sy / fit.n) AS residual
    FROM idx i CROSS JOIN fit JOIN wd ON wd.w = i.w
    """


@register(
    "daily_revenue_decomposition",
    oracle=_decompose_sql("duck"),
    doc=(
        "Classical time-series decomposition: observed = linear trend "
        "+ weekday seasonal + residual, per day — the anomaly-hunting "
        "view behind forecast_next_week_revenue (a residual spike is a "
        "day the trend+seasonality model cannot explain, a cleaner "
        "signal than the raw z-score in daily_revenue_anomalies). Same "
        "fitted components as the forecast query: five decimal-exact "
        "moment sums + the 7-row weekday aggregate, then one row-local "
        "arithmetic pass over the daily series. Every emitted double "
        "is the same IEEE expression tree on exact inputs — "
        "bit-identical, unrounded."
    ),
    tags=("analytics", "timeseries", "agg"),
)
def daily_revenue_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_decompose_sql("spark"))


@register(
    "fulfillment_latency_percentiles",
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority,
               CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
                    AS BIGINT) AS days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(quantile_cont(days, 0.50), 6) AS p50_days,
           round(quantile_cont(days, 0.90), 6) AS p90_days,
           round(quantile_cont(days, 0.99), 6) AS p99_days
    FROM lat GROUP BY o_orderpriority
    """,
    doc=(
        "Fulfillment-latency SLA percentiles per order priority (order "
        "date -> line ship date): the operational p50/p90/p99 every "
        "logistics dashboard shows. Latencies are exact integer day "
        "gaps; Spark percentile() and DuckDB quantile_cont share the "
        "sort-and-interpolate definition (same contract as "
        "price_percentiles). Five constant groups after a partial agg; "
        "the 100 TB path swaps in approx_percentile's t-digest."
    ),
    tags=("analytics", "agg", "stats"),
)
def fulfillment_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate"
    )
    lat = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.round(F.expr("percentile(days, 0.50)"), 6).alias("p50_days"),
        F.round(F.expr("percentile(days, 0.90)"), 6).alias("p90_days"),
        F.round(F.expr("percentile(days, 0.99)"), 6).alias("p99_days"),
    )


@register(
    "return_rate_by_brand",
    oracle="""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS return_rate
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    doc=(
        "Return-rate KPI per brand (the quality/merchandising metric a "
        "commerce team watches weekly): share of line items with "
        "returnflag 'R'. Broadcast dim join + one brand-keyed "
        "aggregate; the rate divides exact integers — bit-identical, "
        "unrounded."
    ),
    tags=("analytics", "agg", "join"),
)
def return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    returned = F.sum(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            returned.cast("long").alias("n_returned"),
            (returned.cast("double") / F.count("*")).alias("return_rate"),
        )
    )
