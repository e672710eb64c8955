"""Incremental MinHash-LSH dedup for a GROWING corpus.

The gate query `lsh_candidate_pairs` recomputes the full band self-join
each run — the right shape for a one-shot batch, the wrong one for
production ingest, where each new batch must be deduped against
everything already accepted WITHOUT re-pairing the existing corpus with
itself. This operator persists the LSH band table as a LakeTable index
and makes each ingest's cost proportional to the BATCH:

- index layout: (doc_id, band, h) PARTITIONED BY band and
  liquid-clustered on the band hash `h` (per-file [min,max] on `h` in
  the manifest), so the candidate probe prunes at two levels before
  any row is read.
- ``ingest_batch``: band the new docs (row-local minhash, same md5
  family as the oracle-verified gate queries), probe the index for
  (band, h) collisions against EXISTING docs, self-pair the batch,
  then append the new bands to the index — one atomic commit, so a
  replayed batch can be guarded by the caller with the table's
  idempotency primitives.

Equivalence contract (tests/test_llm_ops.py): ingesting a corpus in
any batch split yields exactly the same candidate-pair set as the
one-shot `lsh_candidate_pairs` gate query over the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.functions import textexpr as tx
from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable


def band_table(docs: DataFrame) -> DataFrame:
    """(doc_id, band, h) LSH band rows for a document frame — row-local
    minhash signatures (2 md5 digests per shingle, sliced into the
    signature components) then one banded hash per band. Import-time
    constants shared with the gate queries in plans/documents."""
    from real_time_e_commerce_analytics_lakehouse_spark.plans.documents import (
        N_BANDS,
        N_MINHASH,
        _digests,
    )

    toks = docs.select(
        "doc_id", F.expr(tx.tokens("text", "spark")).alias("t")
    )
    digs = toks.select("doc_id", F.expr(_digests("spark")).alias("hx"))
    sig = digs.select(
        "doc_id",
        *[
            F.expr(tx.minhash_component("hx", j, "spark")).alias(f"mh_{j}")
            for j in range(N_MINHASH)
        ],
    ).persist()
    # persist BEFORE the band fan-out: the union has N_BANDS branches
    # over sig, and without the cache each branch re-runs the md5-heavy
    # tokenize+digest+minhash pipeline (the exact re-evaluation
    # plans/documents.lsh_candidate_pairs measured at ~8x). The lease
    # rides the returned frame (release_cached convention).
    bands = []
    for b in range(N_BANDS):
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.expr(f"md5(concat(mh_{2 * b}, mh_{2 * b + 1}))").alias("h"),
            )
        )
    out = bands[0]
    for frame in bands[1:]:
        out = out.unionByName(frame)
    out._cached_deps = [sig]
    return out


def create_dedup_index(spark: SparkSession, path: str) -> LakeTable:
    """The persisted band index: partitioned by band, clustered on the
    band hash so probes skip files whose [min,max] h-range cannot
    collide with the batch."""
    return LakeTable(
        spark, path, partition_by=["band"], cluster_by=["h"]
    )


def ingest_batch(
    spark: SparkSession,
    index: LakeTable,
    batch: DataFrame,
    batch_id: int | None = None,
    txn_app: str = "incdedup",
) -> DataFrame:
    """Dedup-candidate pairs contributed by `batch` (new-vs-existing
    and new-vs-new), then append the batch's bands to the index.

    Returns (doc_a, doc_b) with doc_a < doc_b, distinct. Cost: banding
    is row-local over the batch; the probe joins the batch's bands
    (small side, broadcast by AQE) against the index scan; the
    self-pair is a batch-sized join. The existing corpus is never
    self-paired again.

    Idempotency (r5 review): the pair RESULT is materialized BEFORE the
    index append, so a failure leaves the index without the batch (the
    natural retry re-ingests cleanly); and passing `batch_id` routes the
    append through the table's txn ledger (append_once) so replaying an
    already-ingested batch — the foreachBatch at-least-once case —
    appends nothing (the returned pairs are recomputed, which is
    harmless: they are deterministic). Without `batch_id` the caller
    owns replay protection."""
    nb = band_table(batch)
    # referenced three times (probe, self-pair both sides, append)
    nb = nb.persist()
    try:
        a = nb.alias("a")
        within = (
            a.join(
                nb.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.h") == F.col("b.h"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
        )
        exists = index.exists()
        if exists:
            ex = index.read().alias("x")
            vs_existing = (
                a.join(
                    ex,
                    (F.col("a.band") == F.col("x.band"))
                    & (F.col("a.h") == F.col("x.h"))
                    & (F.col("a.doc_id") != F.col("x.doc_id")),
                )
                .select(
                    F.least("a.doc_id", "x.doc_id").alias("doc_a"),
                    F.greatest("a.doc_id", "x.doc_id").alias("doc_b"),
                )
            )
            pairs = within.unionByName(vs_existing)
        else:
            pairs = within
        # materialize the RESULT first: if this fails, the index has not
        # advanced and the retry re-ingests without duplicate bands
        out = pairs.distinct().persist()
        out.count()
        if batch_id is not None:
            index.append_once(nb, txn_app=txn_app, txn_version=batch_id)
        elif exists:
            index.append(nb)
        else:
            index.overwrite(nb)
    finally:
        nb.unpersist()
        for dep in getattr(nb, "_cached_deps", []):
            dep.unpersist()
    # the caller releases the result's own cache when done
    # (operators.simsearch.release_cached) — previously it leaked one
    # cached pair frame per ingest in a long-lived session
    out._cached_deps = [out]
    return out
