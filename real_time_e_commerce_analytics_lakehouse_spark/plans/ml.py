"""In-engine distributed ML training: full-batch gradient descent for a
logistic-regression document-quality model, as a pure join/agg DAG.

No MLlib, no Python — each GD step is ONE partial-aggregated shuffle
(the gradient is a sum over rows, so map-side combine does nearly all
the work; the reducer sees d+1 numbers) plus a 1-row broadcast of the
updated weights. That is exactly how distributed full-batch GD runs at
100 TB, and it composes with the rest of the engine (train on the
CURATED corpus table, featurize with the quality expressions).

Cross-engine exactness for iterative float training: per-row gradient
terms x_j*(y - p) are cast to DECIMAL(18,12) before summation (exact,
order-independent — the one place parallelism could leak into the
result), while sigmoid/exp and the weight update are the same IEEE
expression tree on identical inputs on both engines. After three
rounds the weights are still bit-identical, so the gate comparison is
hash-exact with no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from real_time_e_commerce_analytics_lakehouse_spark.functions import textexpr as tx
from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import register, table

GD_ROUNDS = 3
GD_LR = 1.0


def _features_sql(d: str) -> str:
    """(y, x1, x2, x3) per doc: label = the length-based quality gate,
    features = scaled token count, punctuation ratio, stopword ratio
    (the doc_quality_scores family, recomputed inline)."""
    toks = tx.tokens("text", d)
    n_t = f"{'size' if d == 'spark' else 'len'}(({toks}))"
    punct = tx.punct_count("text", d)
    stop = tx.count_in_set(f"({toks})", tx.STOPWORDS["en"], d)
    return f"""
    SELECT CAST(CASE WHEN {n_t} >= 5 AND length(text) >= 30
                THEN 1 ELSE 0 END AS DOUBLE) AS y,
           CAST({n_t} AS DOUBLE) / 100 AS x1,
           CAST({punct} AS DOUBLE) / length(text) AS x2,
           CAST({stop} AS DOUBLE) / {n_t} AS x3
    FROM documents
    """


def _gd_sql(d: str) -> str:
    feats = _features_sql(d)
    sql = f"""
    WITH feats AS ({feats}),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM feats),
    w0 AS (SELECT CAST(0 AS DOUBLE) AS b, CAST(0 AS DOUBLE) AS w1,
                  CAST(0 AS DOUBLE) AS w2, CAST(0 AS DOUBLE) AS w3)"""
    for k in range(1, GD_ROUNDS + 1):
        prev = f"w{k - 1}"
        # p computed once per row; gradient terms decimal-cast pre-sum
        sql += f""",
    g{k} AS (
        SELECT
            sum(CAST((y - p) AS DECIMAL(18,12))) AS gb,
            sum(CAST(x1 * (y - p) AS DECIMAL(18,12))) AS g1,
            sum(CAST(x2 * (y - p) AS DECIMAL(18,12))) AS g2,
            sum(CAST(x3 * (y - p) AS DECIMAL(18,12))) AS g3
        FROM (
            SELECT y, x1, x2, x3,
                   1 / (1 + exp(-(b + w1 * x1 + w2 * x2 + w3 * x3))) AS p
            FROM feats CROSS JOIN {prev}
        )
    ),
    w{k} AS (
        SELECT b + {GD_LR} * CAST(gb AS DOUBLE) / n.n AS b,
               w1 + {GD_LR} * CAST(g1 AS DOUBLE) / n.n AS w1,
               w2 + {GD_LR} * CAST(g2 AS DOUBLE) / n.n AS w2,
               w3 + {GD_LR} * CAST(g3 AS DOUBLE) / n.n AS w3
        FROM {prev} CROSS JOIN g{k} CROSS JOIN n
    )"""
    finals = "\n    UNION ALL\n    ".join(
        f"SELECT {k} AS round, round(b, 9) AS bias, round(w1, 9) AS w_tokens,"
        f" round(w2, 9) AS w_punct, round(w3, 9) AS w_stopword FROM w{k}"
        for k in range(1, GD_ROUNDS + 1)
    )
    return sql + "\n    " + finals


@register(
    "logreg_quality_gd",
    oracle=_gd_sql("duck"),
    doc=(
        f"Logistic-regression training IN the engine: {GD_ROUNDS} "
        "full-batch gradient-descent steps for a document-quality "
        "model (features: scaled token count, punctuation ratio, "
        "stopword ratio), emitting the weight trajectory per round. "
        "Each step is one partial-aggregated shuffle (the reducer "
        "sees d+1 gradient sums) + a 1-row weight broadcast — the "
        "100 TB distributed-GD shape with zero Python and no ML "
        "library. Gradient terms are decimal-cast before summation so "
        "parallel reduction order cannot perturb the trained weights: "
        "after three rounds both engines hold bit-identical doubles, "
        "and the gate comparison is hash-exact."
    ),
    tags=("documents", "ml", "agg"),
)
def logreg_quality_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_gd_sql("spark"))
