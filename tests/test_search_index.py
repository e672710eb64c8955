"""Incremental search index: batch-maintained postings must serve
exactly the scores of a full corpus scan, and incremental == one-shot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.pipelines.search_index import SearchIndex
from real_time_e_commerce_analytics_lakehouse_spark.plans import QUERIES
from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import table
from real_time_e_commerce_analytics_lakehouse_spark.plans.search import BM25_TERMS, BM25_TOP_K


def _rows(df):
    return sorted((r.doc_id, r.rank, r.bm25) for r in df.collect())


@pytest.mark.soak  # r12: soak-style; default run deselects (pytest.ini)
def test_incremental_index_equals_one_shot_and_corpus_scan(
    spark, sf_dir, tmp_path
) -> None:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    # one-shot index
    one = SearchIndex(spark, str(tmp_path / "one"))
    one.ingest(docs)

    # incremental: two halves, plus a REPLAY of the second half —
    # replays must be no-ops (merge idempotency), not double counts
    inc = SearchIndex(spark, str(tmp_path / "inc"))
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    inc.ingest(first)
    inc.ingest(second)
    inc.ingest(second)

    got_one = _rows(one.bm25(BM25_TERMS, BM25_TOP_K))
    got_inc = _rows(inc.bm25(BM25_TERMS, BM25_TOP_K))
    assert got_one == got_inc and len(got_one) == BM25_TOP_K

    # the index-served ranking equals the corpus-scan gate query
    # bit-for-bit (same BM25 expression contract)
    scan = _rows(QUERIES["bm25_keyword_search"].builder(spark, sf_dir))
    assert got_inc == scan

    # postings table state: merged == direct tokenize of the full corpus
    n_postings = inc.postings.read().count()
    direct = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr("split(trim(lower(text)), '\\\\s+')")
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .count()
        .count()
    )
    assert n_postings == direct


def test_streaming_index_ingest_checkpoint_and_equivalence(
    spark, sf_dir, tmp_path
) -> None:
    """The standing index-maintenance job: JSONL drops stream into the
    index; a second availableNow run after new files ingests ONLY the
    new ones (checkpoint), and the final index equals a one-shot build
    over all docs."""
    import json
    import os

    from real_time_e_commerce_analytics_lakehouse_spark.pipelines.search_index import (
        SearchIndex,
        run_indexing_stream,
    )

    docs = [
        (r.doc_id, r.text)
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(60)
        .collect()
    ]
    landing = tmp_path / "landing"
    landing.mkdir()

    def drop(name, rows):
        with open(landing / name, "w") as f:
            for d, t in rows:
                f.write(json.dumps({"doc_id": d, "text": t}) + "\n")

    drop("batch1.jsonl", docs[:30])
    run_indexing_stream(
        spark, str(landing), str(tmp_path / "idx"), str(tmp_path / "ck")
    )
    drop("batch2.jsonl", docs[30:])
    idx = run_indexing_stream(
        spark, str(landing), str(tmp_path / "idx"), str(tmp_path / "ck")
    )
    # checkpoint: second run added exactly one commit wave for batch2
    # (no re-ingest of batch1); postings state equals one-shot
    one = SearchIndex(spark, str(tmp_path / "oneshot"))
    one.ingest(
        spark.createDataFrame(docs, "doc_id long, text string")
    )
    inc_rows = sorted(
        (r.doc_id, r.token, r.tf) for r in idx.postings.read().collect()
    )
    one_rows = sorted(
        (r.doc_id, r.token, r.tf) for r in one.postings.read().collect()
    )
    assert inc_rows == one_rows and len(inc_rows) > 0
    # and BM25 served from the streamed index matches the one-shot
    assert _rows(idx.bm25(BM25_TERMS, 10)) == _rows(one.bm25(BM25_TERMS, 10))
