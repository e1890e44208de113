"""connected_components (operators/graph.py) unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connected_data_lake_spark.operators.graph import connected_components


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a bigint, id_b bigint")


def test_chain_and_island_components(spark):
    # chain 1-2-3 plus island 7-9; node 3 only reaches 1 transitively
    cc = connected_components(_pairs(spark, [(1, 2), (2, 3), (7, 9)]))
    got = {r["node"]: r["component"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}
    cc.unpersist()


def test_direction_and_duplicate_edges_are_irrelevant(spark):
    cc = connected_components(_pairs(spark, [(5, 4), (4, 5), (4, 5), (6, 5)]))
    got = {r["node"]: r["component"] for r in cc.collect()}
    assert got == {4: 4, 5: 4, 6: 4}
    cc.unpersist()


def test_long_chain_converges_within_diameter_rounds(spark):
    # propagation needs diameter rounds; a 9-edge path must converge < 25
    edges = [(i, i + 1) for i in range(10)]
    cc = connected_components(_pairs(spark, edges))
    assert {r["component"] for r in cc.collect()} == {0}
    cc.unpersist()


def test_nonconvergence_raises_not_silently_wrong(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, [(i, i + 1) for i in range(6)]), max_iter=1)


def test_cluster_assign_query_sizes_are_consistent(spark, sf_dir):
    from connected_data_lake_spark.plans import spec_of

    df = spec_of("dedup_cluster_assign").spark(spark, sf_dir)
    rows = df.collect()
    assert rows, "fixtures plant near-duplicates; clusters must exist"
    # every cluster id is a member of its own cluster, and sizes agree
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)
        assert all(
            r["cluster_size"] == len(members) for r in rows if r["cluster_id"] == cid
        )


def test_components_match_union_find_on_random_graphs(spark):
    """Property: on arbitrary small graphs the distributed min-label
    fixpoint equals a sequential union-find (hypothesis-driven)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=0, max_value=30),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(edges):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            parent.setdefault(u, u), parent.setdefault(v, v)
            parent[find(u)] = find(v)
        expected = {}
        roots: dict[int, int] = {}
        for n in parent:
            r = find(n)
            roots.setdefault(r, n)
            roots[r] = min(roots[r], n)
        for n in parent:
            expected[n] = roots[find(n)]

        cc = connected_components(_pairs(spark, edges))
        got = {r["node"]: r["component"] for r in cc.collect()}
        cc.unpersist()
        assert got == expected

    check()
