"""Connected components / duplicate-cluster resolution vs a union-find
model, plus the transitive-cluster case pairwise drop misses."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_e_commerce_analytics_lakehouse_spark.operators.graph import (
    connected_components,
    resolve_duplicate_clusters,
)


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min vertex id per component
    comp_min: dict[int, int] = {}
    for v in parent:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in parent}


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.vertex: r.component
        for r in connected_components(df, max_rounds=12).collect()
    }


def test_connected_components_chain_and_star(spark):
    # chain 1-2-3 (transitive), star 10<-11,12, singleton pair (20,21)
    edges = [(1, 2), (2, 3), (11, 10), (12, 10), (20, 21)]
    assert _cc(spark, edges) == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
    }


def test_connected_components_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).collect() == []


def test_connected_components_long_path_pointer_jumping(spark):
    # a 14-vertex path has diameter 13; pointer jumping must converge
    # well inside max_rounds=12 (one-hop propagation alone would not)
    edges = [(i, i + 1) for i in range(13)]
    got = _cc(spark, edges)
    assert got == {v: 0 for v in range(14)}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=15,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.soak  # r12: soak-style; default run deselects (pytest.ini)
def test_connected_components_model(spark, edges):
    assert _cc(spark, edges) == _union_find_components(edges)


def test_resolve_duplicate_clusters_is_transitive(spark):
    # star cluster {1,2,3} linked only through 3: pairs (1,3), (2,3).
    # Pairwise drop-the-larger keeps BOTH 1 and 2; transitive resolution
    # keeps only the cluster minimum, 1.
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(1, 6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 3), (2, 3)], "doc_a long, doc_b long")
    kept = sorted(
        r.doc_id for r in resolve_duplicate_clusters(pairs, docs).collect()
    )
    assert kept == [1, 4, 5]  # 2 and 3 fold into cluster 1; singletons survive


def test_connected_components_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=2, algorithm="jump")


def test_nonconvergence_raise_unpersists_everything(spark):
    """r9 advice: the non-convergence raise paths used to leak cached
    frames (star left the last edge set persisted; jump left the last
    labels), pinning executor storage until session GC. Both paths must
    leave the DataFrame cache manager exactly as empty as before."""
    from real_time_e_commerce_analytics_lakehouse_spark.operators.graph import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "src long, dst long"
    )
    spark.catalog.clearCache()
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    for run in (
        lambda: connected_components(df, max_rounds=2, algorithm="jump"),
        lambda: connected_components_star(df, max_rounds=1),
    ):
        with pytest.raises(RuntimeError, match="did not converge"):
            run()
        assert cache_mgr.isEmpty(), "cached frame leaked on raise path"


@pytest.mark.soak  # r12: soak-style; default run deselects (pytest.ini)
def test_star_and_jump_agree(spark):
    """r9: connected_components dispatches to the large-star/small-star
    edge-rewiring algorithm by default (published O(log^2 n) bound,
    measured 5x faster on the sf0.1 name graph); the jump spelling is
    retained as the equivalence witness. Both must emit the identical
    fixpoint on every structure class, including the contract edges:
    self-loop-only vertices are singletons, permuted ids, duplicate
    and reversed edges."""
    import random

    rnd = random.Random(13)
    perm = list(range(1, 120))
    rnd.shuffle(perm)
    cases = {
        "permuted_chain": [
            (perm[i], perm[i + 1]) for i in range(110) if i % 17 != 0
        ],
        "self_loops": [(5, 5), (1, 2), (2, 1), (9, 9)],
        "random_multi": [
            (rnd.randrange(1, 60), rnd.randrange(1, 60)) for _ in range(80)
        ],
    }
    for name, edges in cases.items():
        df = spark.createDataFrame(edges, "src long, dst long")
        star = {
            (r.vertex, r.component)
            for r in connected_components(df, algorithm="star").collect()
        }
        jump = {
            (r.vertex, r.component)
            for r in connected_components(df, algorithm="jump").collect()
        }
        assert star == jump, name
        model = _union_find_components(edges)
        assert {v: c for v, c in star} == model, name
