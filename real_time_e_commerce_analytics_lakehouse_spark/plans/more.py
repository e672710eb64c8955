"""Final coverage block: explode/lateral, global sort+limit, and the
Arrow/pandas vectorized similarity variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.functions import textexpr as tx
from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import (
    dec_sum,
    register,
    table,
)


@register(
    "token_frequencies_top50",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({tx.tokens('text', 'duck')}) AS token FROM documents
    )
    SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM toks
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 50
    """,
    doc=(
        "Corpus token frequency table: explode (lateral unnest) + "
        "group + global ORDER BY + LIMIT. Spark plans the top-50 as "
        "TakeOrderedAndProject — per-partition heaps, no full sort of the "
        "frequency table."
    ),
    tags=("documents", "text", "sort"),
)
def token_frequencies_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.expr(tx.tokens("text", "spark"))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(50)
    )


@register(
    "top_revenue_days",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           {dec_sum("o_totalprice")} AS revenue,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1
    ORDER BY revenue DESC, order_date ASC
    LIMIT 10
    """,
    doc="Global top-N by aggregate (ORDER BY + LIMIT -> TakeOrderedAndProject).",
    tags=("agg", "sort"),
)
def top_revenue_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.expr(dec_sum("o_totalprice")).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("order_date"))
        .limit(10)
    )


@register(
    "cosine_topk_pandas",
    oracle=None,  # numpy reorders the reduction (SIMD) — float sums differ
    # in the last bits from the sequential fold, so no hash oracle;
    # tests/test_llm_ops.py asserts agreement with the exact variant.
    doc=(
        "Vectorized Arrow/pandas variant of brute-force cosine top-k: the "
        "whole corpus batch is scored against all query vectors with one "
        "numpy matmul per Arrow batch (mapInPandas). This is the shape "
        "that wins when the per-row lambda fold becomes the bottleneck "
        "(wide embeddings, many queries): ~matrix-multiply throughput vs "
        "per-element codegen. Measured honestly: at this testdata's tiny "
        "corpus (500 x 64) the Arrow round-trip dominates and the JVM "
        "fold is ~2x faster — the crossover needs a corpus/query volume "
        "where BLAS amortizes serialization. Kept rows-only because SIMD "
        "reassociates the float reduction."
    ),
    tags=("embeddings", "simsearch", "pandas"),
)
def cosine_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.simsearch import (
        cosine_topk_vectorized,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk_vectorized(emb, queries, k=10)


@register(
    "small_quantity_orders",
    oracle=f"""
    SELECT l.l_partkey,
           {dec_sum("l.l_extendedprice")} AS revenue_small_lots,
           count(*) AS n_small_lots
    FROM lineitem l
    JOIN (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
        FROM lineitem GROUP BY l_partkey
    ) t ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.half_avg_qty
    GROUP BY l.l_partkey
    """,
    doc=(
        "Per-group scalar-aggregate comparison (TPC-H Q17 shape): join "
        "each row against its group's aggregate and filter below half the "
        "group mean. The agg side shares the fact scan; Catalyst reuses "
        "the exchange on l_partkey for both the aggregate and the join."
    ),
    tags=("agg", "join", "subquery"),
)
def small_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    avgs = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        li.join(avgs, li.l_partkey == avgs.p_key)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .groupBy("l_partkey")
        .agg(
            F.expr(dec_sum("l_extendedprice")).alias("revenue_small_lots"),
            F.count("*").alias("n_small_lots"),
        )
    )


@register(
    "customer_order_histogram",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
    doc=(
        "Distribution-of-counts (TPC-H Q13 shape): left join keeps "
        "order-less customers (count 0 bucket), double aggregation — "
        "per-customer then per-count."
    ),
    tags=("agg", "join"),
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))
