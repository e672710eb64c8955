"""Round-7 advisor fixes (ADVICE r6), each pinned by the failure it
names:

1. Snapshot replay reconciles a commit's file actions as a SET — a
   foreign DV-delete commit serializing add(path, new DV) BEFORE
   remove(path, old DV) must not drop the file (silent row loss).
2. importance_sample_documents decides inclusion without forming the
   u * Σw product, which wraps int64 once the corpus passes ~2^31
   chars (Spark wrapped silently; the DuckDB oracle raised).
3. dv_payload storageType='p' accepts the spec's absolute path as a
   file: URI (foreign writers commonly serialize it that way).
4. read_delta_log partition pruning canonicalizes Python booleans to
   Delta's 'true'/'false' (str(True) pruned every file) and rejects
   writer-sensitive types loudly.
5. bench.py refuses a stale AB_PAIRED.json (commits from a previous
   round) instead of letting it clear current-round regressions.
"""

from __future__ import annotations

import json
import os

import pytest

from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
    read_delta_log,
)

_SCHEMA_ID = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}}
        ],
    }
)


def _write_commit(path: str, version: int, actions: list[dict]) -> None:
    with open(
        os.path.join(path, "_delta_log", f"{version:020d}.json"), "w"
    ) as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _bootstrap_actions() -> list[dict]:
    return [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "r7-advice-test",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _SCHEMA_ID,
                "partitionColumns": [],
                "configuration": {},
            }
        },
    ]


def _inline_dv(ids: list[int]) -> dict:
    from real_time_e_commerce_analytics_lakehouse_spark.sources.roaring import (
        serialize_rba,
        z85_encode,
    )

    payload = serialize_rba(ids)
    pad = (-len(payload)) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(payload + b"\x00" * pad),
        "sizeInBytes": len(payload),
        "cardinality": len(ids),
    }


def _add(path: str, dv: dict | None = None) -> dict:
    a = {
        "path": path,
        "partitionValues": {},
        "size": 1,
        "modificationTime": 0,
        "dataChange": True,
    }
    if dv is not None:
        a["deletionVector"] = dv
    return {"add": a}


def test_add_before_remove_same_commit_keeps_file(spark, tmp_path):
    """ADVICE r6 #1: a DV-delete commit emitting the add line before the
    remove line of the SAME path must replay to 'file live with the new
    DV', not 'file gone' — the spec keys logical files by (path, dvId),
    so the remove targets the OLD logical file only."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "foreign")
    os.makedirs(os.path.join(path, "_delta_log"))
    pq.write_table(
        pa.table({"id": list(range(10))}),
        os.path.join(path, "part-0.parquet"),
    )
    _write_commit(
        path, 0, _bootstrap_actions() + [_add("part-0.parquet", _inline_dv([2]))]
    )
    # foreign writer deepens the DV: ADD (new DV {2,5}) serialized
    # BEFORE the REMOVE (old DV {2}) — line-order replay dropped part-0
    _write_commit(
        path,
        1,
        [
            _add("part-0.parquet", _inline_dv([2, 5])),
            {
                "remove": {
                    "path": "part-0.parquet",
                    "dataChange": True,
                    "deletionVector": _inline_dv([2]),
                }
            },
        ],
    )
    got = sorted(r.id for r in read_delta_log(spark, path).collect())
    assert got == sorted(set(range(10)) - {2, 5})
    # the reverse order (remove first, add second) must agree
    _write_commit(
        path,
        2,
        [
            {
                "remove": {
                    "path": "part-0.parquet",
                    "dataChange": True,
                    "deletionVector": _inline_dv([2, 5]),
                }
            },
            _add("part-0.parquet", _inline_dv([2, 5, 7])),
        ],
    )
    got2 = sorted(r.id for r in read_delta_log(spark, path).collect())
    assert got2 == sorted(set(range(10)) - {2, 5, 7})
    # a plain remove (no re-add in the commit) still removes
    _write_commit(
        path, 3, [{"remove": {"path": "part-0.parquet", "dataChange": True}}]
    )
    assert read_delta_log(spark, path).count() == 0


def test_dv_storage_p_accepts_file_uri(spark, tmp_path):
    """ADVICE r6 #3: storageType='p' pathOrInlineDv as a file:/// URI
    resolves like add/remove paths do (plain absolute path still works —
    covered by test_reader_applies_inline_and_path_dv_storage)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_e_commerce_analytics_lakehouse_spark.sources.roaring import (
        serialize_rba,
        write_dv_file,
    )

    path = str(tmp_path / "foreign")
    os.makedirs(os.path.join(path, "_delta_log"))
    pq.write_table(
        pa.table({"id": list(range(10))}),
        os.path.join(path, "part-0.parquet"),
    )
    payload = serialize_rba([1, 8])
    img, offs = write_dv_file([payload])
    dv_file = str(tmp_path / "external_dv.bin")
    with open(dv_file, "wb") as f:
        f.write(img)
    desc = {
        "storageType": "p",
        "pathOrInlineDv": "file://" + dv_file,
        "offset": offs[0],
        "sizeInBytes": len(payload),
        "cardinality": 2,
    }
    _write_commit(
        path, 0, _bootstrap_actions() + [_add("part-0.parquet", desc)]
    )
    got = sorted(r.id for r in read_delta_log(spark, path).collect())
    assert got == sorted(set(range(10)) - {1, 8})


def test_partition_pruning_canonicalizes_bools(spark, tmp_path):
    """ADVICE r6 #4: partitions={'flag': [True]} must match the stored
    canonical 'true' (str(True) == 'True' pruned every file), and a
    writer-sensitive type (float) is rejected loudly."""
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        export_delta_log,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"), partition_by=["flag"])
    t.overwrite(
        spark.createDataFrame(
            [(i, i % 2 == 0) for i in range(10)], "id long, flag boolean"
        )
    )
    export_delta_log(t)
    got = read_delta_log(spark, t.path, partitions={"flag": [True]})
    assert sorted(r.id for r in got.collect()) == [0, 2, 4, 6, 8]
    # int filters canonicalize too (str(int) is already canonical)
    t2 = LakeTable(spark, str(tmp_path / "t2"), partition_by=["k"])
    t2.overwrite(
        spark.createDataFrame([(i, i % 3) for i in range(9)], "id long, k int")
    )
    export_delta_log(t2)
    got2 = read_delta_log(spark, t2.path, partitions={"k": [1]})
    assert sorted(r.id for r in got2.collect()) == [1, 4, 7]
    with pytest.raises(TypeError, match="canonical Delta string"):
        read_delta_log(spark, t.path, partitions={"flag": [1.5]})


def test_importance_sample_bigint_safe_at_huge_corpus(spark, tmp_path):
    """ADVICE r6 #2: with Σ n_chars past 2^31 the old u*Σw predicate
    wrapped int64 (Spark) / raised (DuckDB). The div-rearranged
    predicate must match an exact Python big-int evaluation of
    u*Σw < K*w*2^32, and the oracle must run clean in DuckDB."""
    import duckdb

    from real_time_e_commerce_analytics_lakehouse_spark.plans import QUERIES

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    # 4,000 docs of 2^20 chars each: Σw = 2^32 > 2^31 (old overflow
    # regime) while staying tiny to scan
    docs = spark.createDataFrame(
        [(f"doc-{i:05d}", "en", 1 << 20) for i in range(4096)],
        "doc_id string, lang string, n_chars long",
    )
    docs.coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    q = QUERIES["importance_sample_documents"]
    got = {r.doc_id for r in q.builder(spark, sf_dir).collect()}

    # exact big-int reference of the ORIGINAL predicate
    import hashlib

    def hash_u32(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")

    tw = 4096 * (1 << 20)
    expect = {
        f"doc-{i:05d}"
        for i in range(4096)
        if hash_u32(f"doc-{i:05d}") * tw < 50 * (1 << 20) * (1 << 32)
    }
    assert got == expect and got  # non-degenerate draw

    con = duckdb.connect()
    glob = os.path.join(sf_dir, "documents.parquet", "*.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')"
    )
    oracle = {r[0] for r in con.execute(q.oracle).fetchall()}
    assert oracle == expect


def test_bench_refuses_stale_ab_paired():
    """ADVICE r6 #5: AB_PAIRED.json only clears regression flags when
    its B tree is a this-round commit (strict descendant of the newest
    driver round-boundary commit) and its A tree predates the boundary."""
    import subprocess
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    def run(*args):
        return subprocess.run(
            ["git", *args],
            cwd=Path(bench.__file__).parent,
            capture_output=True,
            text=True,
        )

    def git(*args):
        return run(*args).stdout.strip()

    boundary = git(
        "log", "--grep", "^round [0-9]*:", "-E", "--format=%h", "-n", "1"
    )
    if not boundary:
        pytest.skip("no round-boundary commit in this checkout")
    head = git("rev-parse", "--short", "HEAD")
    # stale: B tree IS (or predates) the boundary
    assert bench._ab_staleness(boundary + "^", boundary) is not None
    assert bench._ab_staleness(boundary, boundary) is not None
    # unverifiable inputs are stale, not trusted
    assert bench._ab_staleness(None, head) is not None
    assert bench._ab_staleness("definitely-not-a-sha", head) is not None
    # fresh: A predates the boundary, B is a this-round commit (HEAD
    # qualifies whenever this test runs after any round-7+ commit)
    if (
        head != boundary
        and run("merge-base", "--is-ancestor", boundary, head).returncode == 0
    ):
        assert bench._ab_staleness(boundary + "^", head) is None


def test_pair_fanout_block_budget_enforced(spark, tmp_path, monkeypatch):
    """VERDICT r6 weak #2: a pathological block (many docs sharing one
    shingle / band bucket) must fail the job loudly at the cap instead
    of fanning out ~n^2 pairs inside one key; normal corpora are
    untouched (driver-gate hashes pin that)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_e_commerce_analytics_lakehouse_spark.plans import documents as docmod
    from real_time_e_commerce_analytics_lakehouse_spark.plans import QUERIES

    sf_dir = str(tmp_path / "sf")
    os.makedirs(os.path.join(sf_dir, "documents.parquet"))
    # 60 documents with IDENTICAL text: every shingle block and every
    # LSH band bucket has 60 members
    text = "the quick brown fox jumps over the lazy dog again and again"
    pq.write_table(
        pa.table(
            {
                "doc_id": [f"d{i:03d}" for i in range(60)],
                "lang": ["en"] * 60,
                "text": [text] * 60,
                "n_chars": [len(text)] * 60,
            }
        ),
        os.path.join(sf_dir, "documents.parquet", "part-0.parquet"),
    )

    monkeypatch.setattr(docmod, "PAIR_BLOCK_CAP", 50)
    for name in ("ngram_jaccard_pairs", "lsh_candidate_pairs"):
        with pytest.raises(Exception, match="PAIR_BLOCK_CAP|candidate pairs"):
            QUERIES[name].builder(spark, sf_dir).collect()

    # within budget: both run and agree with the duplicate structure
    monkeypatch.setattr(docmod, "PAIR_BLOCK_CAP", 10_000)
    pairs = QUERIES["lsh_candidate_pairs"].builder(spark, sf_dir)
    assert pairs.count() == 60 * 59 // 2
