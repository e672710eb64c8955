"""Incrementally-maintained full-text search index on the table layer.

Ties the search primitives (plans/search.py) to the LakeTable
incremental story: the inverted index is a TABLE the engine maintains
batch-by-batch, not a one-shot job —

- `postings` LakeTable: (token, doc_id, tf), merged per ingest batch on
  the composite key (re-ingesting a doc replaces its postings —
  idempotent under replay, the same contract as the silver tier);
- `doclen` LakeTable: (doc_id, dl), merged the same way; corpus stats
  (N, avgdl) derive from it with a metadata-cheap aggregate.

`bm25_from_index` then answers keyword queries from the INDEX alone —
the documents table is never rescanned at query time, which is the
point of an index at 100 TB: query cost is |matching postings|, while
ingest cost is |batch|. Exactness: scoring reuses the BM25 expression
contract of plans/search.py (integer tf/df/dl, fixed-order per-term
recombination), so index-served scores equal corpus-scan scores
bit-for-bit — pinned in tests/test_search_index.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.operators.bounded_frames import (
    bounded_single_group,
)
from real_time_e_commerce_analytics_lakehouse_spark.functions import textexpr as tx
from real_time_e_commerce_analytics_lakehouse_spark.plans.search import (
    bm25_term_score,
    BM25_B,
    BM25_K1,
)
from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable


class SearchIndex:
    """Inverted index + document-length table, incrementally merged."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.postings = LakeTable(spark, os.path.join(root, "postings"))
        self.doclen = LakeTable(spark, os.path.join(root, "doclen"))

    def ingest(self, docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> None:
        """Tokenize a batch and merge its postings. Upsert on
        (doc_id, token) + delete-unmatched scoped to the batch's docs
        would be the full re-ingest story; the driver corpus is
        append-only, so composite-key upsert suffices and replays are
        no-ops (merge guard contract).

        ONE ROW PER DOC within the batch first (r5 review): a doc
        landing twice in one micro-batch (two file drops draining in a
        single availableNow trigger) would otherwise SUM its versions'
        tf/dl into the index — permanently wrong scores. With no
        version column in the landing data the survivor is the
        lexicographically greatest text — deterministic across replays;
        versions arriving in separate batches keep the documented
        last-write-wins merge semantics."""
        one = (
            docs.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")
            )
            .groupBy("doc_id")
            .agg(F.max("__t").alias("__t"))
        )
        toks = one.select(
            "doc_id",
            F.explode(F.expr(tx.tokens("__t", "spark"))).alias("token"),
        )
        tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
        dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
        # merge_upsert creates the table on first write, so no separate
        # exists/overwrite branch (it also opened a crash window where
        # postings existed but doclen did not)
        self.postings.merge_upsert(tf, keys=["doc_id", "token"])
        self.doclen.merge_upsert(dl, keys=["doc_id"])

    def bm25(self, terms: tuple[str, ...], top_k: int = 20) -> DataFrame:
        """BM25 top-k from the index tables only (no corpus scan)."""
        if not terms:
            raise ValueError("bm25 needs at least one query term")
        tf = self.postings.read().filter(F.col("token").isin(*terms))
        dl = self.doclen.read()
        stats = dl.agg(
            F.count("*").cast("double").alias("n_corpus"),
            (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        )
        df_ = tf.groupBy("token").agg(
            F.count("*").cast("double").alias("df")
        )
        score = bm25_term_score(
            F.col("tf"), F.col("df"),
            F.col("n_corpus"), F.col("avgdl"), F.col("dl"),
        )
        scored = (
            tf.join(F.broadcast(df_), "token")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select("doc_id", "token", score.alias("score"))
        )
        per_doc = scored.groupBy("doc_id").agg(
            *[
                F.sum(F.when(F.col("token") == t, F.col("score"))).alias(
                    f"s{i}"
                )
                for i, t in enumerate(terms)
            ]
        )
        total = None
        for i in range(len(terms)):
            term = F.coalesce(F.col(f"s{i}"), F.lit(0.0))
            total = term if total is None else total + term
        w = bounded_single_group("doc_id", F.desc("bm25"), F.asc("doc_id"))
        return (
            per_doc.select("doc_id", total.alias("bm25"))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= top_k)
            .select("doc_id", "rank", F.round("bm25", 6).alias("bm25"))
        )


def run_indexing_stream(
    spark: SparkSession,
    landing_dir: str,
    index_root: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
) -> SearchIndex:
    """Continuously index a landing zone of JSONL document drops: a
    Structured Streaming file source drains availableNow into
    SearchIndex.ingest per micro-batch. The checkpoint tracks file
    offsets (a restart never re-reads consumed files) AND the ingest
    merge is idempotent on (doc_id, token), so a batch replayed after
    a mid-commit crash cannot double-count — the same
    effectively-exactly-once layering as the bronze tier. At 100 TB
    this is the standing index-maintenance job: cost per trigger is
    |new docs|, never |corpus|."""
    from real_time_e_commerce_analytics_lakehouse_spark.streaming.pipeline import (
        run_available_now,
    )

    index = SearchIndex(spark, index_root)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.jsonl")
        .json(landing_dir)
    )
    run_available_now(
        stream,
        checkpoint_dir,
        lambda batch, _epoch: index.ingest(batch),
    )
    return index
