"""Round-11 optimization pins: operator internals that changed for
performance must compute exactly what the old spelling computed.

- _copurchase_pairs: basket-array pair generation (one groupBy + array
  comprehension) replaced the distinct + self-join spelling (guide
  §2.3/§2.4). Pinned against a literal re-implementation of the old
  self-join over a frame with duplicate lines, singleton baskets, and
  a wide basket.
- connected_components_star: the per-round double-distinct fold (ONE
  dedup of already-canonical small-star outputs) must preserve the
  fixpoint — exercised here on a graph that needs several rounds plus
  duplicate/reversed multi-edges (test_graph.py pins the rest).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _old_pairs(op, a_name, b_name, symmetric, min_support):
    """The r1-r10 distinct + self-join spelling, verbatim."""
    a = op.select("l_orderkey", F.col("l_partkey").alias(a_name))
    b = op.select("l_orderkey", F.col("l_partkey").alias(b_name))
    pred = (
        F.col(a_name) != F.col(b_name)
        if symmetric
        else F.col(a_name) < F.col(b_name)
    )
    return (
        a.join(b, "l_orderkey")
        .filter(pred)
        .groupBy(a_name, b_name)
        .agg(F.count("*").alias("n_together"))
        .filter(F.col("n_together") >= min_support)
    )


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_basket_pairs_match_old_selfjoin_spelling(spark, tmp_path):
    from real_time_e_commerce_analytics_lakehouse_spark.plans.analytics import (
        MIN_COPURCHASE_ORDERS,
        _copurchase_pairs,
    )

    # duplicate (order, part) lines, singleton basket (order 4), a wide
    # basket (order 1), and a repeated pair across orders 1/2/3
    rows = [
        (1, 10), (1, 20), (1, 30), (1, 40), (1, 10),  # dup line
        (2, 10), (2, 20),
        (3, 10), (3, 20), (3, 30),
        (4, 99),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf_dir = str(tmp_path / "sf")
    import os

    os.makedirs(sf_dir, exist_ok=True)
    li.write.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    op_old = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    for symmetric in (False, True):
        baskets, op_new, pairs_new = _copurchase_pairs(
            spark, sf_dir, "pa", "pb", symmetric=symmetric
        )
        pairs_old = _old_pairs(
            op_old, "pa", "pb", symmetric, MIN_COPURCHASE_ORDERS
        )
        assert _rowset(pairs_new) == _rowset(pairs_old)
        # op (support frame) must be the same distinct (order, part) set
        assert _rowset(op_new) == _rowset(op_old)
        # one basket row per distinct order
        assert baskets.count() == 4


@pytest.mark.soak  # r12: soak-style; default run deselects (pytest.ini)
def test_star_cc_multiround_with_multiedges(spark):
    from real_time_e_commerce_analytics_lakehouse_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    # two long chains with shuffled ids (forces >1 star round) plus
    # duplicate + reversed edges and a self-loop singleton
    import random

    rnd = random.Random(7)
    ids = list(range(1, 81))
    rnd.shuffle(ids)
    chain1 = [(ids[i], ids[i + 1]) for i in range(0, 39)]
    chain2 = [(ids[i], ids[i + 1]) for i in range(40, 79)]
    edges = chain1 + chain2 + [(b, a) for a, b in chain1[:10]] + chain1[:5]
    edges += [(999, 999)]  # self-loop-only vertex -> singleton
    df = spark.createDataFrame(edges, "src long, dst long")

    star = {
        (r["vertex"], r["component"])
        for r in connected_components_star(df).collect()
    }
    jump = {
        (r["vertex"], r["component"])
        for r in connected_components(df, algorithm="jump").collect()
    }
    assert star == jump
    # the two chains are distinct components; 999 is its own singleton
    comps = {}
    for v, c in star:
        comps.setdefault(c, set()).add(v)
    assert (999,) in {tuple(sorted(s)) for s in comps.values()}
    assert len(comps) == 3
