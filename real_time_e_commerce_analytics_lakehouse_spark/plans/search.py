"""Full-text-search primitives over the `documents` table: the inverted
index a search tier builds from the curated corpus, and BM25 ranking
(Robertson & Sparck Jones / Okapi BM25) against a keyword query.

Scale design: both are one-shuffle-on-token plans. The inverted index
is the canonical 100 TB "build a search index with Spark" job — explode
to (token, doc) postings, group on the token blocking key, serialize
bounded posting heads. BM25 scores only the docs containing a query
term (an inner join against a tiny term list — the scan never ranks the
full corpus), with corpus statistics (N, avgdl) reduced once and
broadcast.

Cross-engine exactness: tf/df/dl/N are exact integers; avgdl and every
BM25 factor is the same IEEE double expression tree on identical inputs
(ln() is the one libm call — both engines' logs are correctly rounded
for these magnitudes); per-term scores are recombined in FIXED written
order (one conditional aggregate per query term), never via an
order-dependent float sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.operators.bounded_frames import (
    bounded_single_group,
)
from real_time_e_commerce_analytics_lakehouse_spark.functions import textexpr as tx
from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import (
    fan_out,
    register,
    table,
)

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("window", "merge", "scan")
BM25_TOP_K = 20
POSTINGS_CAP = 50  # serialized posting-list head per token


@register(
    "inverted_index_postings",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({tx.tokens('text', 'duck')}) AS t
        FROM documents
    ),
    tf AS (
        SELECT t, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2
    )
    SELECT t AS token,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           string_agg(CASE WHEN rn <= {POSTINGS_CAP}
                           THEN doc_id || ':' || tf END, ','
                      ORDER BY doc_id) AS postings_head
    FROM (
        SELECT t, doc_id, tf,
               row_number() OVER (PARTITION BY t ORDER BY doc_id) AS rn
        FROM tf
    )
    GROUP BY t
    """,
    doc=(
        "Inverted-index build: token -> document frequency, total term "
        "frequency, and the first "
        f"{POSTINGS_CAP} postings (doc_id:tf, doc-ordered) serialized "
        "to a string — bounded output per token, and the driver's "
        "pandas hash cannot hold list cells anyway (same serialization "
        "stance as customer_order_keys_array). ONE shuffle on the token "
        "blocking key after a row-local explode; at 100 TB this is "
        "exactly the index-build job, with postings written as arrays "
        "instead of capped strings. Posting order carries the doc_id "
        "tie-break so serialization is deterministic."
    ),
    tags=("documents", "text", "search"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.expr(tx.tokens("text", "spark"))).alias("t")
    )
    tf = toks.groupBy("t", "doc_id").agg(F.count("*").alias("tf"))
    per_tok = tf.groupBy(F.col("t").alias("token")).agg(
        F.count("*").alias("n_docs"),
        F.sum("tf").alias("total_tf"),
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "tf"))
                    ),
                    1,
                    POSTINGS_CAP,
                ),
                lambda s: F.concat_ws(":", s.doc_id, s.tf),
            ),
            ",",
        ).alias("postings_head"),
    )
    return per_tok


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    tf_factor = (
        f"(tf * ({BM25_K1} + 1)) / (tf + {BM25_K1} * "
        f"(1 - {BM25_B} + {BM25_B} * dl / avgdl))"
    )
    idf = "ln((n_corpus - df + 0.5) / (df + 0.5) + 1)"
    score_cols = ", ".join(
        f"sum(CASE WHEN t = '{t}' THEN score END) AS s{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    total = " + ".join(f"coalesce(s{i}, 0)" for i in range(len(BM25_TERMS)))
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({tx.tokens('text', 'duck')}) AS t
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_corpus,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
        FROM toks WHERE t IN ({terms}) GROUP BY 1, 2
    ),
    df AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    scored AS (
        SELECT tf.doc_id, tf.t,
               {idf} * {tf_factor} AS score
        FROM tf
        JOIN df ON df.t = tf.t
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats
    ),
    per_doc AS (
        SELECT doc_id, {score_cols} FROM scored GROUP BY doc_id
    )
    SELECT doc_id, rank, round(bm25, 6) AS bm25
    FROM (
        SELECT doc_id, {total} AS bm25,
               row_number() OVER (ORDER BY {total} DESC, doc_id ASC) AS rank
        FROM per_doc
    )
    WHERE rank <= {BM25_TOP_K}
    """


def bm25_term_score(tf, df_, n_corpus, avgdl, dl):
    """THE BM25 per-term score expression (idf * tf_factor over the
    module's K1/B constants) — one copy shared by the scan query below
    and the index-backed scorer (pipelines/search_index.SearchIndex
    .bm25), so the documented index-vs-scan bit parity is the same
    expression tree by construction instead of a copy to keep in sync
    (r5 review). All inputs are Columns; tf is cast to double here."""
    tf = tf.cast("double")
    idf = F.log((n_corpus - df_ + 0.5) / (df_ + 0.5) + 1)
    tf_factor = (tf * (BM25_K1 + 1)) / (
        tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
    )
    return idf * tf_factor


@register(
    "bm25_keyword_search",
    oracle=_bm25_sql(),
    doc=(
        f"Okapi BM25 top-{BM25_TOP_K} for the keyword query "
        f"{BM25_TERMS} (k1={BM25_K1}, b={BM25_B}). Only docs containing "
        "a query term are scored (term filter pushed before the tf "
        "aggregation); corpus stats (N, avgdl) are a 1-row broadcast; "
        "per-term scores recombine as fixed-order conditional "
        "aggregates, so no order-dependent float sum exists anywhere — "
        "the ranking hash-matches exactly. The global top-k window runs "
        "over |matching docs|; at 100 TB swap it for "
        "TakeOrderedAndProject (orderBy+limit) — same contract."
    ),
    tags=("documents", "text", "search"),
    bench=True,
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-aggregation spelling (r4: shaves one wide shuffle + a join
    # off the r3 plan): per-doc stats computed together, and ONE
    # 1-row aggregate over that yields n_corpus/avgdl/df_t together —
    # no per-(doc,term) shuffle, no tf-dl join, everything else a
    # broadcast. Scores are the same doubles as the r3 spelling: each
    # term's idf*tf_factor is one scalar expression per doc (tf=0 gives
    # exactly 0.0, matching the old coalesce), so the oracle — still
    # the canonical 5-CTE BM25 — hash-matches unchanged.
    #
    # r11 (guide §2.4): doc_id is the documents PK, so the r4
    # explode + groupBy(doc_id) — a full shuffle of every token
    # instance, run TWICE because column pruning makes the stats and
    # matches subtrees non-identical (no exchange reuse) — regroups
    # rows that were never apart: dl is size(tokens) and each tf_i is
    # size(filter(tokens, = term)), all row-local JVM expressions.
    # Zero exchanges in the per-doc lineage (was 2x2). The docs the
    # old explode dropped are exactly the NULL-text docs (split of
    # non-NULL text always yields >= 1 element, [''] at minimum), so
    # the equivalent filter is `text IS NOT NULL` — pushed into the
    # parquet scan for free, unlike a size(tokens) predicate, which
    # predicate pushdown would substitute through the projection and
    # park BELOW the fan_out exchange, re-running the whole token
    # chain single-threaded in the pre-repartition scan task (the
    # ngram_jaccard_pairs lesson, measured 40x there). The per-doc
    # stats are emitted through an explode-of-one-struct Generate for
    # the same reason: the `matches` tf-sum filter lands on generator
    # OUTPUT attributes, which cannot be pushed below the Generate,
    # keeping it above the exchange. dl/tf become ints where count(*)
    # was long — every consumer casts to double before arithmetic, so
    # all scores are bit-identical.

    docs = fan_out(
        table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    toks_arr = docs.select(
        "doc_id", F.expr(tx.tokens("text", "spark")).alias("t")
    )
    per_doc = toks_arr.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.size("t").alias("dl"),
                    *[
                        F.size(
                            F.filter(F.col("t"), lambda x: x == F.lit(t))
                        ).alias(f"tf{i}")
                        for i, t in enumerate(BM25_TERMS)
                    ],
                )
            )
        ).alias("__pd"),
    ).select(
        "doc_id",
        F.col("__pd.dl").alias("dl"),
        *[
            F.col(f"__pd.tf{i}").alias(f"tf{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    stats = per_doc.agg(
        F.count("*").cast("double").alias("n_corpus"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf{i}") > 0, 1))
            .cast("double")
            .alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    matches = per_doc.filter(
        sum(F.col(f"tf{i}") for i in range(len(BM25_TERMS))) > 0
    ).crossJoin(F.broadcast(stats))

    def term_score(i: int):
        return bm25_term_score(
            F.col(f"tf{i}"), F.col(f"df{i}"),
            F.col("n_corpus"), F.col("avgdl"), F.col("dl"),
        )

    total = None
    for i in range(len(BM25_TERMS)):
        s = term_score(i)
        total = s if total is None else total + s
    w = bounded_single_group("doc_id", F.desc("bm25"), F.asc("doc_id"))
    return (
        matches.select("doc_id", total.alias("bm25"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("doc_id", "rank", F.round("bm25", 6).alias("bm25"))
    )


TOPK_SKETCH_K = 10


@register(
    "trending_tokens_sketch",
    oracle=f"""
    SELECT CAST(r AS BIGINT) AS rank,
           TRUE AS count_ok, TRUE AS is_heavy
    FROM range(1, {TOPK_SKETCH_K} + 1) t(r)
    """,
    doc=(
        f"Heavy hitters via the approx_top_k frequent-items sketch "
        f"(DataSketches): top-{TOPK_SKETCH_K} corpus tokens with "
        "approximate counts. The sketch is CONSTANT-MEMORY and "
        "mergeable — at 100 TB this replaces the exact two-shuffle "
        "top-k (full token groupBy + global sort) with one pass and a "
        "bounded accumulator per partition. The sketch STATE is "
        "engine-specific, so the gate row checks the frequent-items "
        "GUARANTEE instead (VERDICT r8 next #8), per rank, as exact "
        "booleans: the estimate within εN of the token's exact count "
        "(count_ok) and the returned token genuinely near-top-k "
        "(is_heavy, exact count ≥ k-th count − εN), ε = 0.01 — vastly "
        "looser than the default-capacity sketch's real error. The "
        "exact-count join IS the verification harness (gate scale); "
        "production runs keep the one-pass sketch alone. pytest keeps "
        "the exact-below-capacity equivalence twin."
    ),
    tags=("documents", "text", "search", "approx"),
)
def trending_tokens_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(F.expr(tx.tokens("text", "spark"))).alias("t")
    )
    # selectExpr, not a temp view: registering scratch names on the
    # shared session is a side effect two concurrently-built plans (or
    # a caller's own view) could clobber — identical plan, no catalog
    # mutation (r4 review)
    sketch = (
        toks.selectExpr(f"approx_top_k(t, {TOPK_SKETCH_K}) AS hits")
        .selectExpr("posexplode(hits) AS (rank0, hit)")
        .select(
            (F.col("rank0") + 1).cast("long").alias("rank"),
            F.col("hit.item").alias("token"),
            F.col("hit.count").cast("long").alias("approx_count"),
        )
    )
    exact = toks.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    # two scalar bounds, computed in-plan and broadcast: total token
    # count N and the k-th largest exact count
    bounds = (
        exact.agg(F.sum("exact_count").alias("n_total"))
        .crossJoin(
            exact.orderBy(F.desc("exact_count"))
            .limit(TOPK_SKETCH_K)
            .agg(F.min("exact_count").alias("kth"))
        )
    )
    joined = (
        exact.join(F.broadcast(sketch), exact["t"] == sketch["token"])
        .crossJoin(F.broadcast(bounds))
    )
    eps = 0.01
    return joined.select(
        "rank",
        (
            F.abs(F.col("approx_count") - F.col("exact_count"))
            <= eps * F.col("n_total")
        ).alias("count_ok"),
        (
            F.col("exact_count")
            >= F.col("kth") - eps * F.col("n_total")
        ).alias("is_heavy"),
    )


PHRASE = ("window", "merge")  # the exact-adjacency phrase query


@register(
    "phrase_search_bigram",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {tx.tokens('text', 'duck')} AS a FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(range(1, len(a)),
                i -> a[i] = '{PHRASE[0]}' AND a[i + 1] = '{PHRASE[1]}'))
                AS BIGINT) AS n_occurrences
    FROM toks
    WHERE len(list_filter(range(1, len(a)),
              i -> a[i] = '{PHRASE[0]}' AND a[i + 1] = '{PHRASE[1]}')) > 0
    """,
    doc=(
        f"Exact-phrase search: documents containing the adjacent bigram "
        f"{PHRASE!r} with occurrence counts — the positional-match "
        "semantics a phrase query needs beyond bag-of-words BM25. "
        "Row-local array-lambda scan (position filter over the token "
        "array), zero shuffle; at 100 TB the same predicate runs over "
        "the POSITIONAL posting lists of the two terms (intersect "
        "positions where pos_b = pos_a + 1) so only docs containing "
        "both terms are touched — the plan here is the verify kernel "
        "of that pipeline."
    ),
    tags=("documents", "text", "search"),
)
def phrase_search_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents"))
    occ = (
        f"size(filter(sequence(1, size(a) - 1), "
        f"i -> element_at(a, i) = '{PHRASE[0]}' "
        f"and element_at(a, i + 1) = '{PHRASE[1]}'))"
    )
    toks = docs.select(
        "doc_id", F.expr(tx.tokens("text", "spark")).alias("a")
    ).filter(F.expr("size(a) >= 2"))
    return (
        toks.select("doc_id", F.expr(occ).cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )


RRF_K = 60
RRF_TOP_K = 10


def _hybrid_oracle() -> str:
    """RRF oracle: the shared BM25 CTE prefix with the final SELECT
    swapped for the two-ranking fusion. Built by substring replace on
    _bm25_sql(); FAIL-FAST if the template drifted (a silent no-op
    replace would register plain BM25 as the oracle and surface as a
    confusing column-shape mismatch far from the cause)."""
    base = _bm25_sql()
    out = base.replace(
        f"""
    SELECT doc_id, rank, round(bm25, 6) AS bm25
    FROM (
        SELECT doc_id, {' + '.join(f'coalesce(s{i}, 0)' for i in range(len(BM25_TERMS)))} AS bm25,
               row_number() OVER (ORDER BY {' + '.join(f'coalesce(s{i}, 0)' for i in range(len(BM25_TERMS)))} DESC, doc_id ASC) AS rank
        FROM per_doc
    )
    WHERE rank <= {BM25_TOP_K}
    """,
        f"""
    , ranked AS (
        SELECT p.doc_id,
               row_number() OVER (
                   ORDER BY {' + '.join(f'coalesce(s{i}, 0)' for i in range(len(BM25_TERMS)))} DESC,
                            p.doc_id ASC) AS r_bm25,
               row_number() OVER (
                   ORDER BY dl.dl DESC, p.doc_id ASC) AS r_len
        FROM per_doc p JOIN dl ON dl.doc_id = p.doc_id
    )
    SELECT doc_id, rank,
           CAST(r_bm25 AS BIGINT) AS r_bm25,
           CAST(r_len AS BIGINT) AS r_len,
           round(rrf, 9) AS rrf_score
    FROM (
        SELECT doc_id, r_bm25, r_len,
               1.0 / ({RRF_K} + r_bm25) + 1.0 / ({RRF_K} + r_len) AS rrf,
               row_number() OVER (
                   ORDER BY 1.0 / ({RRF_K} + r_bm25)
                            + 1.0 / ({RRF_K} + r_len) DESC,
                            doc_id ASC) AS rank
        FROM ranked
    )
    WHERE rank <= {RRF_TOP_K}
    """,
    )
    if out == base:
        raise RuntimeError(
            "hybrid_rrf_search oracle template drifted from _bm25_sql"
        )
    return out


@register(
    "hybrid_rrf_search",
    oracle=_hybrid_oracle(),
    doc=(
        "Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. "
        "2009): fuse the BM25 relevance ranking with a second signal's "
        "ranking (document length here; in production, the "
        "embedding-cosine ranking) as sum(1/(k+rank)). Rank fusion is "
        "the standard way to combine lexical + vector retrieval "
        "without score calibration — and because it consumes INTEGER "
        "ranks, the fused score is bit-identical cross-engine even "
        "though the underlying BM25 scores are floats: hash-exact "
        "with no tolerance. Plan shape: the two rankings are windows "
        "over the |matching docs| frame, then one more tiny sort."
    ),
    tags=("documents", "text", "search"),
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:

    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.expr(tx.tokens("text", "spark"))).alias("t")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_corpus"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("t").isin(*BM25_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_ = tf.groupBy("t").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        (F.col("n_corpus") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    tf_factor = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "t", (idf * tf_factor).alias("score"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("t") == t, F.col("score"))).alias(f"s{i}")
            for i, t in enumerate(BM25_TERMS)
        ]
    )
    total = None
    for i in range(len(BM25_TERMS)):
        term = F.coalesce(F.col(f"s{i}"), F.lit(0.0))
        total = term if total is None else total + term
    ranked = (
        per_doc.join(dl, "doc_id")
        .select(
            "doc_id",
            F.row_number()
            .over(bounded_single_group("doc_id", total.desc(), F.asc("doc_id")))
            .cast("long")
            .alias("r_bm25"),
            F.row_number()
            .over(bounded_single_group("doc_id", F.desc("dl"), F.asc("doc_id")))
            .cast("long")
            .alias("r_len"),
        )
    )
    rrf = (
        F.lit(1.0) / (RRF_K + F.col("r_bm25"))
        + F.lit(1.0) / (RRF_K + F.col("r_len"))
    )
    w = bounded_single_group("doc_id", rrf.desc(), F.asc("doc_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= RRF_TOP_K)
        .select(
            "doc_id",
            "rank",
            "r_bm25",
            "r_len",
            F.round(rrf, 9).alias("rrf_score"),
        )
    )


from real_time_e_commerce_analytics_lakehouse_spark.functions import vecexpr as vx
from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import QUERIES as _Q

RERANK_TOP_K = 10

_RERANK_ORACLE = f"""
    WITH hits AS (
        SELECT doc_id, rank AS bm25_rank, bm25
        FROM ({_Q['bm25_keyword_search'].oracle}) h
    ),
    qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    cand AS (
        SELECT h.doc_id, h.bm25_rank, h.bm25,
               {vx.cosine(vx.to_double_array('e.embedding', 'duck'),
                          vx.to_double_array('qv.q_emb', 'duck'), 'duck')}
                   AS sim
        FROM hits h
        JOIN embeddings e ON e.vec_id = h.doc_id
        CROSS JOIN qv
    ),
    ranked AS (
        SELECT doc_id, bm25_rank, bm25, sim,
               row_number() OVER (ORDER BY sim DESC, doc_id) AS final_rank
        FROM cand
    )
    SELECT doc_id, CAST(bm25_rank AS BIGINT) AS bm25_rank, bm25,
           round(sim, 6) AS cosine_sim,
           CAST(final_rank AS BIGINT) AS final_rank
    FROM ranked WHERE final_rank <= {RERANK_TOP_K}
"""


@register(
    "retrieve_then_rerank",
    oracle=_RERANK_ORACLE,
    doc=(
        f"The retrieve-then-rerank cascade every RAG stack runs: BM25 "
        f"retrieves the lexical top-{BM25_TOP_K} (stage reused from "
        "bm25_keyword_search — cheap, inverted-index-friendly), then an "
        "embedding cosine against the query vector reranks ONLY those "
        f"candidates to the final top-{RERANK_TOP_K}. The expensive "
        "vector math runs on |candidates| rows, never the corpus — the "
        "cascade's whole point at 100 TB — and candidates join "
        "embeddings on the id key with the 1-row query vector "
        "broadcast. Complements hybrid_rrf_search (score fusion) with "
        "the sequential-cascade shape; both stages' contracts are "
        "pinned by their own gate queries. Cosines are sequential "
        "folds — bit-identical, ranked on the raw double."
    ),
    tags=("documents", "search", "embeddings", "join"),
)
def retrieve_then_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:

    hits = bm25_keyword_search(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("bm25_rank"), "bm25"
    )
    emb = table(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    sim = F.expr(
        vx.cosine(
            vx.to_double_array("e_emb", "spark"),
            vx.to_double_array("q_emb", "spark"),
            "spark",
        )
    )
    cand = (
        hits.join(emb.select("vec_id", F.col("embedding").alias("e_emb")),
                  hits["doc_id"] == F.col("vec_id"))
        .crossJoin(F.broadcast(qv))
        .select("doc_id", "bm25_rank", "bm25", sim.alias("sim"))
    )
    w = bounded_single_group("doc_id", F.desc("sim"), F.asc("doc_id"))
    return (
        cand.withColumn("final_rank", F.row_number().over(w).cast("long"))
        .where(F.col("final_rank") <= RERANK_TOP_K)
        .select(
            "doc_id",
            F.col("bm25_rank").cast("long").alias("bm25_rank"),
            "bm25",
            F.round("sim", 6).alias("cosine_sim"),
            "final_rank",
        )
    )
