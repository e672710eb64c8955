"""Training-data curation operators beyond dedup/similarity: the
selection, mixing, packing and scrubbing steps a 100 TB corpus pipeline
runs between "raw documents" and "training shards". All deterministic —
sampling uses md5 hash buckets instead of rand(), packing uses a
distributed exact cumsum — so every step is reproducible AND
differential-testable against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.functions import textexpr as tx
from real_time_e_commerce_analytics_lakehouse_spark.operators.ids import (
    distributed_cumsum,
)
from real_time_e_commerce_analytics_lakehouse_spark.operators.topk import (
    top_k_per_group,
)
from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import (
    register,
    table,
)

# per-language keep-rates out of 100 (data mixing: downsample dominant
# languages, keep scarce ones)
MIX_RATES = {"en": 50, "de": 100, "fr": 25, "es": 10}

SHARD_TOKENS = 2000  # token budget per training shard
BENCH_DOCS = 10  # doc_id < BENCH_DOCS form the held-out benchmark set


def _rate_case(lang_expr: str) -> str:
    arms = " ".join(
        f"when {lang_expr} = '{lang}' then {rate}" for lang, rate in MIX_RATES.items()
    )
    return f"(case {arms} else 0 end)"


@register(
    "stratified_sample_documents",
    oracle=f"""
    WITH langs AS (
        SELECT doc_id,
               {tx.langid_case(tx.tokens('text', 'duck'), 'duck')} AS lang,
               {tx.hash_bucket('doc_id', 100, 'duck')} AS bucket
        FROM documents
    )
    SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket
    FROM langs
    WHERE bucket < {_rate_case('lang')}
    """,
    doc=(
        "Deterministic stratified sampling (data mixing): keep-rate per "
        "detected language, membership decided by an md5 hash bucket of "
        "the doc id — reproducible across runs/engines (rand()-based "
        "sampling is neither), row-local, no shuffle. The shape used to "
        "downweight dominant languages/sources when composing a corpus."
    ),
    tags=("documents", "curation"),
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    lang = tx.langid_case(tx.tokens("text", "spark"), "spark")
    bucket = tx.hash_bucket("doc_id", 100, "spark")
    out = docs.select(
        "doc_id",
        F.expr(lang).alias("lang"),
        F.expr(bucket).cast("long").alias("bucket"),
    )
    return out.filter(F.col("bucket") < F.expr(_rate_case("lang")))


@register(
    "pack_documents_into_shards",
    oracle=f"""
    WITH counted AS (
        SELECT doc_id,
               CAST({tx.bpe_token_count('text', 'duck')} AS BIGINT) AS n_tokens
        FROM documents
    ),
    summed AS (
        SELECT doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (
                   ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_tokens
        FROM counted
    )
    SELECT doc_id, n_tokens, cum_tokens,
           CAST(floor((cum_tokens - n_tokens) / {SHARD_TOKENS}) AS BIGINT) AS shard
    FROM summed
    """,
    doc=(
        f"Token-budget shard packing: documents fill ~{SHARD_TOKENS}-token "
        "training shards in doc_id order (shard = cumulative start div "
        "budget). The cumsum is NOT a global-window single reducer: "
        "operators/ids.distributed_cumsum range-buckets the order key, "
        "cumsums per bucket in parallel, and shifts by broadcast bucket "
        "offsets — exact integers, bit-equal to the oracle's global "
        "window."
    ),
    tags=("documents", "curation"),
)
def pack_documents_into_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id",
        F.expr(tx.bpe_token_count("text", "spark")).cast("long").alias("n_tokens"),
    )
    summed = distributed_cumsum(counted, "doc_id", "n_tokens", out="cum_tokens")
    out = summed.select(
        "doc_id",
        "n_tokens",
        "cum_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / SHARD_TOKENS)
        .cast("long")
        .alias("shard"),
    )
    # the select sheds the cumsum's persist lease — re-attach it or the
    # harness's release_cached finds nothing to free (r5 review)
    out._cached_deps = getattr(summed, "_cached_deps", [])
    return out


@register(
    "benchmark_contamination",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {tx.tokens('text', 'duck')} AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest({tx.shingles('toks', 3, 'duck')}) AS shingle
        FROM toks
    ),
    corpus AS (
        SELECT DISTINCT doc_id, shingle FROM sh WHERE doc_id >= {BENCH_DOCS}
    ),
    bench AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id < {BENCH_DOCS}
    ),
    totals AS (
        SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id
    ),
    hits AS (
        SELECT c.doc_id, count(*) AS n_contaminated
        FROM corpus c JOIN bench b ON c.shingle = b.shingle
        GROUP BY c.doc_id
    )
    SELECT t.doc_id, t.n_shingles, h.n_contaminated,
           round(h.n_contaminated / t.n_shingles, 6) AS contamination
    FROM totals t JOIN hits h ON t.doc_id = h.doc_id
    """,
    doc=(
        f"Benchmark decontamination scan: word-3gram overlap between each "
        f"corpus document and the held-out set (doc_id < {BENCH_DOCS}). "
        "The join key is the shingle — candidate generation is a "
        "shuffle-on-key (and the benchmark side is broadcast-small), "
        "never doc x doc. Documents scoring high get dropped before "
        "training; the ratio is exact-integer / exact-integer."
    ),
    tags=("documents", "curation"),
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.expr(tx.tokens("text", "spark")).alias("toks"))
    sh = toks.select(
        "doc_id", F.explode(F.expr(tx.shingles("toks", 3, "spark"))).alias("shingle")
    )
    corpus = sh.filter(F.col("doc_id") >= BENCH_DOCS).dropDuplicates(
        ["doc_id", "shingle"]
    )
    bench = (
        sh.filter(F.col("doc_id") < BENCH_DOCS).select("shingle").distinct()
    )
    totals = corpus.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return totals.join(hits, "doc_id").select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
            "contamination"
        ),
    )


@register(
    "redact_documents",
    oracle=f"""
    SELECT doc_id,
           {tx.redact('text', 'duck')} AS redacted,
           CAST(len(regexp_extract_all(lower(text), '[0-9]{{4,}}')) AS BIGINT)
               AS n_number_runs
    FROM documents
    """,
    doc=(
        "PII-style scrubbing: emails and 4+ digit runs replaced with "
        "typed placeholders, plus a per-doc count of masked number runs. "
        "Pure row-local regexp rewrites (RE2 ∩ Java-regex subset), "
        "zero shuffle — the shape of any at-scale scrub pass."
    ),
    tags=("documents", "curation"),
)
def redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(tx.redact("text", "spark")).alias("redacted"),
        F.expr("size(regexp_extract_all(lower(text), '[0-9]{4,}', 0))")
        .cast("long")
        .alias("n_number_runs"),
    )


SOURCE_CAP = 15  # max docs kept per source (domain capping)
QUALITY_DROP_FRAC = 0.3  # drop the bottom 30% per language


@register(
    "cap_docs_per_source",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               ) AS source_rank
        FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(source_rank AS BIGINT) AS source_rank
    FROM ranked WHERE source_rank <= {SOURCE_CAP}
    """,
    doc=(
        f"Domain capping (RefinedWeb/Dolma pattern): keep at most "
        f"{SOURCE_CAP} docs per source, preferring longer docs, doc_id "
        "tie-break for determinism. operators/topk.top_k_per_group = one "
        "shuffle on source, per-group sort only — never a global sort. "
        "At 100 TB a mega-domain is exactly the skewed hot key the cap "
        "exists for; the window sorts one domain's rows per task, and "
        "pathological domains fall back to operators/skew salting."
    ),
    tags=("documents", "curation"),
)
def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return top_k_per_group(
        docs,
        "source",
        [F.col("n_chars").desc(), F.col("doc_id")],
        SOURCE_CAP,
        rank_alias="source_rank",
    )


@register(
    "quality_quantile_filter",
    oracle=f"""
    WITH scored AS (
        -- COALESCE 0: a zero-token doc divides to NULL, and NULL sorts
        -- FIRST in Spark's default ascending order but LAST in
        -- DuckDB's, shifting every percent_rank — scoring empty docs 0
        -- keeps the engines aligned (both coalesce identically)
        SELECT doc_id, lang,
               COALESCE(round(CAST({tx.count_in_set(tx.tokens('text', 'duck'),
                                           tx.STOPWORDS['en'], 'duck')} AS DOUBLE)
                     / len({tx.tokens('text', 'duck')}), 6), 0) AS score
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, score,
               percent_rank() OVER (
                   PARTITION BY lang ORDER BY score, doc_id
               ) AS pr
        FROM scored
    )
    SELECT doc_id, lang, score, round(pr, 6) AS q_rank
    FROM ranked WHERE pr >= {QUALITY_DROP_FRAC}
    """,
    doc=(
        f"Quality-quantile filtering: score docs (stopword ratio), drop "
        f"the bottom {int(QUALITY_DROP_FRAC * 100)}% per language by "
        "exact percent_rank (unique ordering via doc_id tie-break makes "
        "the quantile deterministic and engine-portable). One shuffle on "
        "lang; the per-language sort is the irreducible cost of an exact "
        "quantile cut — at 100 TB swap in approx_percentile thresholds "
        "(approx_price_percentiles shows that path) and keep this as "
        "the auditable exact variant."
    ),
    tags=("documents", "curation"),
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tx.tokens("text", "spark")
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr(
            f"coalesce(round(cast({tx.count_in_set(toks, tx.STOPWORDS['en'], 'spark')} "
            f"as double) / size({toks}), 6), 0d)"
        ).alias("score"),
    )
    w = W.partitionBy("lang").orderBy("score", "doc_id")
    ranked = docs.withColumn("pr", F.percent_rank().over(w))
    return ranked.filter(F.col("pr") >= QUALITY_DROP_FRAC).select(
        "doc_id", "lang", "score", F.round("pr", 6).alias("q_rank")
    )


_SPAN_SH_SPARK = tx.shingles(tx.tokens("text", "spark"), 8, "spark")
_SPAN_SH_DUCK = tx.shingles(tx.tokens("text", "duck"), 8, "duck")


@register(
    "cross_doc_duplicate_spans",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, unnest({_SPAN_SH_DUCK}) AS shingle
        FROM documents
    ),
    cnt AS (SELECT shingle, count(*) AS n_docs FROM sh GROUP BY shingle)
    SELECT sh.doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN cnt.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           round(CAST(sum(CASE WHEN cnt.n_docs > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS shared_frac
    FROM sh JOIN cnt ON sh.shingle = cnt.shingle
    GROUP BY sh.doc_id
    """,
    doc=(
        "Exact-substring duplication signal (Lee et al. 2022, "
        "'Deduplicating Training Data Makes Language Models Better'): "
        "per document, the fraction of its distinct 8-gram word spans "
        "that also occur in at least one OTHER document. Docs above a "
        "threshold are near-copies assembled from shared boilerplate "
        "even when no single whole-doc hash matches. Plan: explode to "
        "(doc, span), distinct, count docs per span (the one big "
        "shuffle, keyed on the span), join back, per-doc ratio. At "
        "100 TB the span strings are xxhash64-ed to 8-byte keys before "
        "the shuffle (collision-tolerable for a fraction estimate) — "
        "the gate keeps raw strings so both engines group identically; "
        "docs shorter than 8 tokens have no spans and drop out, "
        "mirroring the suffix-array tool's minimum match length."
    ),
    tags=("documents", "text", "dedup"),
)
def cross_doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "doc_id", F.explode(F.expr(_SPAN_SH_SPARK)).alias("shingle")
        )
        .distinct()
    )
    cnt = sh.groupBy("shingle").agg(F.count("*").alias("n_docs"))
    shared = F.when(F.col("n_docs") > 1, 1).otherwise(0)
    return (
        sh.join(cnt, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(shared).cast("long").alias("n_shared"),
            F.round(
                F.sum(shared).cast("double") / F.count("*"), 6
            ).alias("shared_frac"),
        )
    )


@register(
    "temperature_resample_sources",
    oracle=f"""
    WITH sizes AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS source_chars
        FROM documents GROUP BY source
    ),
    floor_size AS (SELECT min(source_chars) AS min_chars FROM sizes),
    rates AS (
        SELECT s.source, s.source_chars,
               CAST(floor(sqrt(CAST(f.min_chars AS DOUBLE)
                               / s.source_chars) * 10000) AS BIGINT)
                   AS keep_threshold
        FROM sizes s CROSS JOIN floor_size f
    )
    SELECT d.doc_id, d.source, r.source_chars, r.keep_threshold,
           CAST({tx.hash_bucket('d.doc_id', 10000, 'duck')} AS BIGINT) AS bucket
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {tx.hash_bucket('d.doc_id', 10000, 'duck')} < r.keep_threshold
    """,
    doc=(
        "Temperature-based source mixing (the alpha-sampling recipe of "
        "multi-source pre-training corpora — Pile/Dolma-style): each "
        "source's keep rate is (min_size/size)^(1-alpha) with alpha=0.5, "
        "so over-represented sources are down-sampled toward the "
        "smallest one instead of dominating the mix; size is character "
        "mass, not doc count (mixing budgets are token budgets). "
        "Membership is the md5 hash bucket of the doc id — the same "
        "deterministic cross-engine device as "
        "stratified_sample_documents, so the sample is reproducible "
        "forever (rand() is neither). Plan: tiny per-source aggregate, "
        "single-row min, broadcast the rates back onto the corpus, "
        "row-local hash filter — one shuffle on source (map-side "
        "combined), then a pure map at any scale."
    ),
    tags=("documents", "curation"),
)
def temperature_resample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sizes = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("source_chars")
    )
    floor_size = sizes.agg(F.min("source_chars").alias("min_chars"))
    rates = sizes.crossJoin(F.broadcast(floor_size)).select(
        "source",
        "source_chars",
        F.floor(
            F.sqrt(F.col("min_chars").cast("double") / F.col("source_chars"))
            * 10000
        )
        .cast("long")
        .alias("keep_threshold"),
    )
    bucket = F.expr(tx.hash_bucket("doc_id", 10000, "spark")).cast("long")
    return (
        docs.join(F.broadcast(rates), "source")
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.col("keep_threshold"))
        .select(
            "doc_id", "source", "source_chars", "keep_threshold", "bucket"
        )
    )


_IMPORTANCE_K = 50  # expected sample size, independent of corpus size


@register(
    "importance_sample_documents",
    oracle=f"""
    WITH tot AS (
        SELECT CAST(sum(n_chars) AS BIGINT) AS tw FROM documents
    )
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d, tot
    WHERE CAST(d.n_chars AS BIGINT) >= 1
      AND {tx.hash_u32('d.doc_id', 'duck')}
          <= ({_IMPORTANCE_K} * CAST(d.n_chars AS BIGINT) * 4294967296 - 1)
             // tot.tw
    """,
    doc=(
        "Weighted (importance) sampling with expected size "
        f"{_IMPORTANCE_K}: inclusion probability ∝ document length "
        "(P = K*w/Σw, capped implicitly at 1), decided by comparing a "
        "deterministic md5-derived 32-bit uniform against the weight "
        "share ENTIRELY IN BIGINT ARITHMETIC — u <= (K*w*2^32 - 1) div "
        "Σw, the exact integer rearrangement of u*Σw < K*w*2^32 that "
        "never forms the u*Σw product (which wraps int64 once the "
        "corpus passes ~2^31 chars; the divided form only bounds the "
        "PER-DOCUMENT weight, w < 2^63/(K*2^32) ≈ 43M chars at K=50) — "
        "so the draw is reproducible across runs AND engines at any "
        "corpus size (a pow/exp-keyed reservoir would hinge on libm "
        "last-ulp agreement; an integer predicate cannot disagree). "
        "The w >= 1 guard keeps trunc-div (Spark) and floor-div "
        "(DuckDB) on the same non-negative numerator. Row-local apart "
        "from one scalar total (broadcast), no shuffle: the shape that "
        "importance-weights a 100 TB corpus by quality/length in a "
        "single pass."
    ),
    tags=("documents", "curation"),
)
def importance_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tot = docs.agg(F.sum("n_chars").cast("long").alias("tw"))
    cond = (
        f"CAST(n_chars AS BIGINT) >= 1 AND "
        f"{tx.hash_u32('doc_id', 'spark')} <= "
        f"({_IMPORTANCE_K}L * CAST(n_chars AS BIGINT) * 4294967296L - 1L) "
        f"div tw"
    )
    return (
        docs.crossJoin(F.broadcast(tot))
        .filter(F.expr(cond))
        .select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))
    )
