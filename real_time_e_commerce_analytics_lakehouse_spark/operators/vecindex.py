"""Persistent IVF vector index: train once, query many times.

The gate query `ivf_kmeans_topk` trains its quantizer inline on every
run — correct for a differential oracle, wasteful for production where
the same corpus serves many query batches. This operator splits the
lifecycle the way a real system does (FAISS/Milvus, Spark-style):

- ``train_spherical_kmeans``: deterministic Lloyd rounds over the
  corpus. Spherical trick: centroids are componentwise SUMS of member
  vectors folded in id order (cosine is scale-invariant, so no
  division) — the same cross-engine-exact recipe the gate oracle uses.
- ``build_ivf_index``: persists the trained centroids AND the corpus
  cell assignments as two LakeTables. Index build cost (train +
  assign: the only full-corpus passes) is paid once; the assignment
  table is partitioned by cell, so a query's candidate fetch reads
  only its probed cells' units — at 100 TB that is the difference
  between an index lookup and a table scan.
- ``ivf_index_topk``: answer a query batch from the persisted index —
  broadcast the (tiny) centroid table, probe ``n_probe`` cells per
  query, candidate-join against the cell-partitioned assignment
  table, exact cosine rerank. No training work on the query path.

Equivalence-tested against the inline gate query
(tests/test_llm_ops.py::test_ivf_index_matches_inline_training).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.functions import vecexpr as vx
from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable

_COS = vx.cosine("emb", "c_emb", "spark")


def assign_cells(
    vecs: DataFrame, cents: DataFrame, id_out: str, keep: int
) -> DataFrame:
    """Nearest-`keep` centroid ids per vector (cosine, deterministic
    tie-break on cell_id). `cents` is broadcast — it is n_cells rows.

    keep=1 (the train/assign hot path, n x n_cells scored rows) is an
    argmax, spelled ``max_by`` so partial aggregation collapses each
    map partition's n_local x n_cells rows to n_local BEFORE the
    shuffle — the row_number window spelling shuffled and sorted the
    full fan-out (measured: the sqrt(n)-cell index build on the sf1
    soak corpus pinned one core for >15 min; max_by builds it in
    seconds). Identical output: max (sim, -cell_id) == order by sim
    desc, cell_id asc."""
    sims = vecs.crossJoin(F.broadcast(cents)).withColumn("__sim", F.expr(_COS))
    if keep == 1:
        return sims.groupBy(id_out).agg(
            F.expr("max_by(cell_id, struct(__sim, -cell_id))").alias(
                "cell_id"
            )
        )
    w = W.partitionBy(id_out).orderBy(F.desc("__sim"), F.asc("cell_id"))
    return (
        sims.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .select(id_out, "cell_id")
    )


def train_spherical_kmeans(
    spark: SparkSession,
    e: DataFrame,
    n_cells: int,
    rounds: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic spherical k-means: seeds = first `n_cells` ids;
    each round = one broadcast-assign + one recombine (centroid =
    componentwise sum of members, folded in id order). Returns the
    materialized (cell_id, c_emb) frame — n_cells rows, the same
    bounded driver roundtrip MLlib's KMeans does per iteration."""
    e = e.select(F.col(id_col).alias("vec_id"), "emb")
    # seeds = the n_cells SMALLEST ids (sort-limit), not ids with value
    # < n_cells: the latter silently yields an empty seed set — and an
    # empty index — for any non-dense id space (offset, sharded,
    # identity-assigned). Identical on dense 0-based ids.
    cents = (
        e.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell_id"), F.col("emb").alias("c_emb"))
    )
    for _ in range(rounds):
        assigned = assign_cells(e, cents, "vec_id", 1)
        comp = assigned.join(e, "vec_id").select(
            "cell_id", "vec_id", F.posexplode("emb").alias("pos", "x")
        )
        per_pos = comp.groupBy("cell_id", "pos").agg(
            F.expr(
                "aggregate(transform(sort_array(collect_list(struct(vec_id, x))),"
                " s -> s.x), cast(0 as double), (a, v) -> a + v)"
            ).alias("sx")
        )
        updated = per_pos.groupBy("cell_id").agg(
            F.expr(
                "transform(sort_array(collect_list(struct(pos, sx))), s -> s.sx)"
            ).alias("c_emb")
        )
        rows = [(r["cell_id"], list(r["c_emb"])) for r in updated.collect()]
        cents = spark.createDataFrame(rows, "cell_id long, c_emb array<double>")
    return cents


def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    index_path: str,
    n_cells: int | None = None,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[LakeTable, LakeTable]:
    """Train + persist an IVF index: `<path>/centroids` (n_cells rows)
    and `<path>/assignments` (one row per corpus vector, PARTITIONED BY
    cell_id so a probe reads only its cells' units).

    ``n_cells=None`` (default) sizes the codebook corpus-adaptively as
    ~sqrt(n), clamped to [16, 65536] — the standard IVF balance point:
    probe cost ∝ n/n_cells per probed cell and centroid-scan cost ∝
    n_cells are equal at sqrt(n), so a FIXED cell count degrades toward
    brute force as the corpus grows (the sf3 soak measured exactly
    that: the fixed-16-cell gate query's exponent rose to 0.94 at 30x
    data). The clamp ceiling keeps the centroid frame broadcastable."""
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.expr(f"cast({vec_col} as array<double>)").alias("emb"),
    )
    # train/assign cost is O(n * n_cells), far above scan cost — a
    # corpus stored as a few small files plans a few input partitions
    # and the whole build runs on that many cores. Spread it: at 100 TB
    # maxPartitionBytes splits naturally; this only rescues the
    # small-file / local case.
    par = spark.sparkContext.defaultParallelism
    if e.rdd.getNumPartitions() < par:
        e = e.repartition(par)
    if n_cells is None:
        import math

        n = e.count()
        n_cells = max(16, min(65536, 1 << math.isqrt(max(n, 1)).bit_length()))
    cents = train_spherical_kmeans(spark, e, n_cells, rounds)
    ct = LakeTable(spark, os.path.join(index_path, "centroids"))
    ct.overwrite(cents)
    at = LakeTable(
        spark, os.path.join(index_path, "assignments"),
        partition_by=["cell_id"],
    )
    at.overwrite(assign_cells(e, cents, "vec_id", 1))
    return ct, at


def ivf_index_topk(
    spark: SparkSession,
    emb: DataFrame,
    index_path: str,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k neighbors for a query batch from the persisted index.
    Query-path cost: broadcast-assign the batch to probe cells, fetch
    ONLY those cells' assignment partitions, exact-rerank candidates
    against the corpus vectors (join on vec_id). Zero training work.

    `exclude_self=True` drops candidates whose vec_id equals the
    query_id — ONLY correct when the queries ARE corpus rows sharing
    the id space (the gate query's shape). For an external query batch
    it must stay False: an unrelated corpus vector that merely shares
    the integer id would silently vanish from the top-k (r5 review)."""
    cents = LakeTable(spark, os.path.join(index_path, "centroids")).read()
    at = LakeTable(
        spark, os.path.join(index_path, "assignments"),
        partition_by=["cell_id"],
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"cast({vec_col} as array<double>)").alias("emb"),
    )
    # resolved once: the probe plan (broadcast crossJoin + rank window)
    # feeds BOTH the probe-cell collect and the candidate join — without
    # the persist it executed twice (r5 review)
    probes = assign_cells(
        q.withColumnRenamed("query_id", "vec_id"), cents, "vec_id", n_probe
    ).withColumnRenamed("vec_id", "query_id").persist()
    probe_cells = [r.cell_id for r in probes.select("cell_id").distinct().collect()]
    assigned = at.read(partitions={"cell_id": probe_cells})
    cand = probes.join(assigned, "cell_id")
    if exclude_self:
        cand = cand.filter(F.col("vec_id") != F.col("query_id"))
    cand = cand.select("query_id", "vec_id")
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.expr(f"cast({vec_col} as array<double>)").alias("v_emb"),
    )
    qv = q.select(F.col("query_id"), F.col("emb").alias("q_emb"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(e, "vec_id")
        .select(
            "query_id", "vec_id",
            F.expr(vx.cosine("q_emb", "v_emb", "spark")).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "rank", F.round("sim", 6).alias("cosine_sim")
        )
    )
    out._cached_deps = [probes]  # released by the caller post-action
    return out
