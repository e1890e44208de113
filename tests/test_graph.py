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
    # local_finish_edges=0 forces the DISTRIBUTED rounds (a 6-edge graph
    # would otherwise finish driver-side and never hit the round cap)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _pairs(spark, [(i, i + 1) for i in range(6)]),
            max_iter=1,
            local_finish_edges=0,
        )


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


# --- large-star/small-star variant (round 8) ---------------------------------


def test_star_matches_label_on_small_graphs(spark):
    cases = [
        [(1, 2), (2, 3), (7, 9)],
        [(5, 4), (4, 5), (4, 5), (6, 5)],
        [(10, 20), (20, 30), (40, 50), (30, 40)],
    ]
    for edges in cases:
        label = connected_components(_pairs(spark, edges))
        star = connected_components(_pairs(spark, edges), algorithm="star")
        assert {(r.node, r.component) for r in label.collect()} == {
            (r.node, r.component) for r in star.collect()
        }
        label.unpersist()


def test_star_converges_logarithmically_on_10k_path(spark):
    """The adversarial case for label propagation: a 10k-node path has
    diameter 10k, but large-star/small-star must converge in O(log n)
    alternations — well under the default 25-round cap that would make
    propagation bail with RuntimeError."""
    edges = [(i, i + 1) for i in range(9_999)]
    cc = connected_components(_pairs(spark, edges), algorithm="star")
    from connected_data_lake_spark.operators.graph import last_cc_diagnostics

    diag = last_cc_diagnostics()
    assert diag.algorithm == "star" and not diag.local_finish
    assert diag.rounds < 25
    rows = cc.collect()
    assert len(rows) == 10_000
    assert {r.component for r in rows} == {0}


def test_star_matches_union_find_on_random_graph(spark):
    import random

    rng = random.Random(5)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(u, v) for u, v in edges if u != v]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u), parent.setdefault(v, v)
        parent[find(u)] = find(v)
    roots: dict[int, int] = {}
    for n in parent:
        r = find(n)
        roots[r] = min(roots.get(r, n), n)
    expected = {n: roots[find(n)] for n in parent}

    cc = connected_components(_pairs(spark, edges), algorithm="star")
    got = {r.node: r.component for r in cc.collect()}
    assert got == expected


def test_star_rejects_unknown_algorithm(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="algorithm"):
        connected_components(_pairs(spark, [(1, 2)]), algorithm="bogus")


def test_pagerank_matches_power_iteration(spark):
    import numpy as np

    from connected_data_lake_spark.operators.graph import pagerank

    # 4 nodes; node 3 is dangling (appears only as a destination)
    edges = [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT, w DOUBLE")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, weight="w", damping=0.85, n_iter=5).collect()
    }

    d, n = 0.85, 4
    p = np.zeros((n, n))
    for s, t, w in edges:
        p[s, t] = w
    out = p.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        contrib = np.zeros(n)
        for s in range(n):
            if out[s] > 0:
                contrib += r[s] * p[s] / out[s]
        dang = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dang / n)
    assert sorted(got) == [0, 1, 2, 3]
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-12, (i, got[i], r[i])


def test_pagerank_uniform_on_symmetric_cycle(spark):
    from connected_data_lake_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src BIGINT, dst BIGINT"
    )
    got = [r["rank"] for r in pagerank(df, n_iter=3).collect()]
    assert all(abs(x - 1.0 / 3) < 1e-12 for x in got)


def test_local_finish_matches_distributed_rounds(spark):
    """Hybrid contraction cut: on the same random graph, the driver-side
    union-find finish (edge count under LOCAL_FINISH_EDGES) must label
    every node identically to both distributed kernels forced past it."""
    import random

    rng = random.Random(17)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    local = connected_components(_pairs(spark, edges))
    from connected_data_lake_spark.operators.graph import last_cc_diagnostics

    assert last_cc_diagnostics().local_finish  # took the driver-side finish
    assert last_cc_diagnostics().rounds == 0
    expect = {(r.node, r.component) for r in local.collect()}
    for algo in ("label", "star"):
        dist = connected_components(
            _pairs(spark, edges), algorithm=algo, local_finish_edges=0
        )
        assert {(r.node, r.component) for r in dist.collect()} == expect
        dist.unpersist()
