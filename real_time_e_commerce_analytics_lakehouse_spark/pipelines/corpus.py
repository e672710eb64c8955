"""Corpus curation pipeline: the LLM-training-data pass, end to end.

Composes the document operators into the standard curation sequence a
100 TB text corpus goes through before training:

  1. quality gate      (cheap row-local filters first — cut volume early)
  2. exact dedup       (hash-groupBy on normalized fingerprint)
  3. near-dup removal  (MinHash-LSH candidates -> exact Jaccard verify ->
                        drop the higher doc_id of each confirmed pair; or,
                        with cluster_resolve=True, fold pairs into
                        transitive clusters via distributed connected
                        components and keep each cluster's minimum —
                        pairwise drop misses A~B, B~C star shapes)
  4. decontamination   (optional: word-3gram overlap vs a held-out
                        benchmark set — shingle-keyed join, benchmark
                        side broadcast)
  5. scrub             (optional: email/number-run redaction, row-local)
  6. annotate          (token counts, language id — row-local)
  7. shard packing     (optional: token-budget shard ids via the
                        distributed exact cumsum — no global reducer)

Order matters at scale: each stage shrinks the input of the next, and
the only shuffles are the dedup groupBy, the LSH band join, and the
decontamination shingle join. Returns the curated DataFrame plus a
per-stage audit of row counts (the "data lineage card" a training run
wants recorded).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.functions import textexpr as tx
from real_time_e_commerce_analytics_lakehouse_spark.operators.ids import (
    distributed_cumsum,
)


@dataclass
class CurationReport:
    input_docs: int
    after_quality: int
    after_exact_dedup: int
    after_neardup: int
    after_semantic: int | None = None
    after_decontamination: int | None = None

    def as_dict(self) -> dict[str, int | None]:
        return self.__dict__.copy()


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    min_chars: int = 30,
    jaccard_threshold: float = 0.6,
    cluster_resolve: bool = False,
    embeddings: DataFrame | None = None,
    semantic_tau: float = 0.3,
    semantic_planes: list[list[float]] | None = None,
    benchmark: DataFrame | None = None,
    contamination_threshold: float = 0.5,
    scrub: bool = False,
    shard_tokens: int | None = None,
    with_report: bool = True,
) -> tuple[DataFrame, CurationReport | None]:
    """Run the full curation pass. Deterministic survivor policy: the
    smallest id in a duplicate group/pair survives."""
    toks = docs.withColumn("t", F.expr(tx.tokens(text_col, "spark")))
    cached_deps = []  # leases ride on the returned frame (see below)

    # 1. quality gate (row-local; pushes ahead of every shuffle)
    quality = toks.filter(
        (F.expr("size(t)") >= min_tokens) & (F.length(text_col) >= min_chars)
    )
    if with_report:
        # the report's after_quality count would otherwise re-tokenize
        # the corpus as an independent job (r5 review)
        quality = quality.persist()
        cached_deps.append(quality)

    # 2. exact dedup on normalized fingerprint, keep min id. Persisted:
    # THREE consumers re-ran the tokenize+fingerprint+keepers lineage
    # from scratch (minhash signatures, the shingle sets of the Jaccard
    # verify, and the final anti-join — plus the report counts)
    fp = quality.withColumn("__fp", F.expr(tx.fingerprint(text_col, "spark")))
    keepers = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    exact = fp.join(keepers, id_col, "left_semi").drop("__fp").persist()
    cached_deps.append(exact)

    # 3. near-dup removal: LSH candidates, Jaccard-verified
    sh = tx.shingles("t", 3, "spark")
    digs = exact.withColumn(
        "__hx", F.expr(tx.minhash_digests("(" + sh + ")", "spark"))
    )
    sig = digs.select(
        id_col,
        *[
            F.expr(tx.minhash_component("__hx", j, "spark")).alias(f"mh_{j}")
            for j in range(8)
        ],
    ).persist()
    cached_deps.append(sig)
    bands = None
    for b in range(4):
        part = sig.select(
            id_col,
            F.lit(b).alias("band"),
            F.md5(F.concat(f"mh_{2 * b}", f"mh_{2 * b + 1}")).alias("h"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a, bb = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    shingle_sets = exact.select(
        id_col, F.array_distinct(F.expr(sh)).alias("__sh")
    )
    sa = shingle_sets.select(F.col(id_col).alias("doc_a"), F.col("__sh").alias("sh_a"))
    sb = shingle_sets.select(F.col(id_col).alias("doc_b"), F.col("__sh").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "__jac",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("__jac") >= jaccard_threshold)
    )
    if cluster_resolve:
        # transitive closure: keep each duplicate cluster's min doc_id
        from real_time_e_commerce_analytics_lakehouse_spark.operators.graph import (
            connected_components,
        )

        comps = connected_components(
            verified.select("doc_a", "doc_b"), src="doc_a", dst="doc_b"
        )
        to_drop = comps.filter(F.col("vertex") != F.col("component")).select(
            F.col("vertex").alias(id_col)
        )
    else:
        to_drop = verified.select(F.col("doc_b").alias(id_col)).distinct()
    deduped = exact.join(to_drop, id_col, "left_anti")

    # 3b. semantic dedup (optional, SemDeDup): embeddings keyed by the
    # SAME id space as the docs; a doc whose vector has a lower-id
    # within-cell neighbor at cosine >= semantic_tau is dropped. Runs
    # AFTER lexical dedup — near-identical texts are already gone, this
    # removes paraphrase-level redundancy the shingle pass cannot see.
    if embeddings is not None:
        from real_time_e_commerce_analytics_lakehouse_spark.operators.simsearch import (
            semantic_dedup_flags,
            semantic_dedup_flags_lsh,
        )

        # bind id/vector columns BY NAME when the conventional names are
        # present (positional binding mis-pairs frames with reordered or
        # extra columns — r4 review); fall back to first-two positions
        # for schema-free callers.
        if {"vec_id", "embedding"} <= set(embeddings.columns):
            emb_cols = ["vec_id", "embedding"]
        else:
            emb_cols = embeddings.columns[:2]
        # score only docs that SURVIVED stages 1-3: flags over the full
        # frame could drop a survivor because its lower-id neighbor was
        # already removed for a different reason — losing every
        # representative of that content (r4 review)
        embeddings = embeddings.join(
            deduped.select(F.col(id_col).alias(emb_cols[0])),
            emb_cols[0],
            "left_semi",
        )
        if semantic_planes is not None:
            # LSH tier: adaptive cell count, linear pair work — the
            # production default once the corpus outgrows fixed cells
            flags = semantic_dedup_flags_lsh(
                embeddings, semantic_planes,
                id_col=emb_cols[0], vec_col=emb_cols[1], tau=semantic_tau,
            )
        else:
            flags = semantic_dedup_flags(
                embeddings, id_col=emb_cols[0], vec_col=emb_cols[1],
                tau=semantic_tau,
            )
        sem_drop = flags.filter(F.col("kept") == 0).select(
            F.col(emb_cols[0]).alias(id_col)
        )
        deduped = deduped.join(sem_drop, id_col, "left_anti")
        cached_deps.extend(getattr(flags, "_cached_deps", []))
    after_semantic = (
        deduped.count() if with_report and embeddings is not None else None
    )

    # 4. decontamination vs a held-out benchmark (optional): drop docs
    # whose distinct word-3gram overlap ratio reaches the threshold.
    # Shingle-keyed join; the benchmark shingle set is broadcast-small.
    after_decon = None
    if benchmark is not None:
        doc_sh = deduped.select(
            id_col, F.explode(F.array_distinct(F.expr(sh))).alias("__s")
        )
        bench_sh = (
            benchmark.withColumn("t", F.expr(tx.tokens(text_col, "spark")))
            .select(F.explode(F.expr(sh)).alias("__s"))
            .distinct()
        )
        totals = doc_sh.groupBy(id_col).agg(F.count("*").alias("__n"))
        hits = (
            doc_sh.join(F.broadcast(bench_sh), "__s")
            .groupBy(id_col)
            .agg(F.count("*").alias("__h"))
        )
        contaminated = (
            totals.join(hits, id_col)
            .filter(F.col("__h") / F.col("__n") >= contamination_threshold)
            .select(id_col)
        )
        deduped = deduped.join(contaminated, id_col, "left_anti")
        after_decon = deduped.count() if with_report else None

    # 5. scrub (optional, row-local)
    if scrub:
        deduped = deduped.withColumn(
            text_col, F.expr(tx.redact(text_col, "spark"))
        ).withColumn("t", F.expr(tx.tokens(text_col, "spark")))

    # 6. annotate (row-local)
    curated = deduped.select(
        *docs.columns,
        F.expr("size(t)").cast("long").alias("n_tokens"),
        F.expr(tx.bpe_token_count(text_col, "spark")).cast("long").alias("n_bpe_tokens"),
        F.expr(tx.langid_case("t", "spark")).alias("predicted_lang"),
    )

    # 7. shard packing (optional): token-budget bins in id order,
    # exact distributed cumsum (no global-window reducer)
    if shard_tokens:
        curated = distributed_cumsum(
            curated, id_col, "n_bpe_tokens", out="__cum"
        )
        # withColumn/drop shed the cumsum's persist lease — collect it
        # into the pipeline's lease list BEFORE rebuilding the frame,
        # or release_cached(curated) leaks one cached frame per call
        # (r5 review; the exact regression class of VERDICT r3 #4)
        cached_deps.extend(getattr(curated, "_cached_deps", []))
        curated = curated.withColumn(
            "shard",
            F.floor((F.col("__cum") - F.col("n_bpe_tokens")) / shard_tokens)
            .cast("long"),
        ).drop("__cum")

    report = None
    if with_report:
        report = CurationReport(
            input_docs=docs.count(),
            after_quality=quality.count(),
            after_exact_dedup=exact.count(),
            after_neardup=exact.join(to_drop, id_col, "left_anti").count(),
            after_semantic=after_semantic,
            after_decontamination=after_decon,
        )
    # propagate cache leases (minhash signatures + any semantic-dedup
    # frame) to the returned frame so the caller can
    # operators.simsearch.release_cached(curated) after its action —
    # no cached frames left behind in a long-lived session
    curated._cached_deps = cached_deps
    return curated, report


def prepare_training_assets(
    spark,
    docs: DataFrame,
    root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **curate_kwargs,
):
    """The full LLM-data turn, curation through training-ready assets:

      curate() -> curated-docs LakeTable (versioned, vacuumable)
               -> BPE merge table trained on the CURATED corpus
                  (training the tokenizer on pre-dedup text overweights
                  boilerplate — the curated corpus is the right input)
               -> full-text search index over the curated docs
                  (contamination forensics / data exploration)

    Returns (curated LakeTable, merges DataFrame, SearchIndex, report).
    All three assets derive from ONE curated frame; at 100 TB each is
    an independent downstream job over the written curated table.
    """
    import os

    from real_time_e_commerce_analytics_lakehouse_spark.pipelines.search_index import (
        SearchIndex,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.plans.bpe import (
        learn_bpe_merges,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable

    from real_time_e_commerce_analytics_lakehouse_spark.operators.simsearch import (
        release_cached,
    )

    curated_df, report = curate(
        docs, text_col=text_col, id_col=id_col, **curate_kwargs
    )
    curated = LakeTable(spark, os.path.join(root, "curated"))
    curated.overwrite(curated_df)
    release_cached(curated_df)  # the write was the consuming action
    base = curated.read()
    merges = learn_bpe_merges(base, text_col=text_col)
    index = SearchIndex(spark, os.path.join(root, "index"))
    index.ingest(base, id_col=id_col, text_col=text_col)
    return curated, merges, index, report
