"""Unit tests for operators/clustering.py (distributed Lloyd k-means)."""

from __future__ import annotations

from pyspark.sql import functions as F

from connected_data_lake_spark.operators.clustering import kmeans


def _blob_df(spark):
    # two well-separated 3-d blobs: ids 0-4 near (0,0,0), ids 5-9 near
    # (10,10,10); offsets are deterministic and too small to cross over
    rows = [
        (i, [0.1 * i, 0.2 * i, 0.1]) for i in range(5)
    ] + [
        (i, [10.0 + 0.1 * i, 10.0 - 0.1 * i, 10.0]) for i in range(5, 10)
    ]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def test_kmeans_separates_blobs(spark):
    df = _blob_df(spark)
    assign, cent = kmeans(df, k=2, n_iter=3)
    got = {r["vec_id"]: r["cluster_id"] for r in assign.collect()}
    # every input row assigned exactly once, to a cluster in [0, k)
    assert sorted(got) == list(range(10))
    assert set(got.values()) <= {0, 1}
    # the two blobs land in two distinct pure clusters
    low = {got[i] for i in range(5)}
    high = {got[i] for i in range(5, 10)}
    assert len(low) == 1 and len(high) == 1 and low != high


def test_kmeans_centroids_are_blob_means(spark):
    df = _blob_df(spark)
    _, cent = kmeans(df, k=2, n_iter=3)
    # centroid of the low blob: mean over ids 0-4 per dimension
    by_cluster = {}
    for r in cent.collect():
        by_cluster.setdefault(r["cluster_id"], {})[r["pos"]] = r["cval"]
    assert len(by_cluster) == 2
    low_cid = min(
        by_cluster, key=lambda c: sum(by_cluster[c].values())
    )
    low = by_cluster[low_cid]
    assert abs(low[1] - 0.2) < 1e-9  # mean of 0.1*i, i=0..4
    assert abs(low[2] - 0.4) < 1e-9
    assert abs(low[3] - 0.1) < 1e-9


def test_kmeans_assignment_is_nearest_final_centroid(spark):
    df = _blob_df(spark)
    assign, cent = kmeans(df, k=3, n_iter=2)
    cents = {}
    for r in cent.collect():
        cents.setdefault(r["cluster_id"], {})[r["pos"]] = r["cval"]
    vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
    got = {r["vec_id"]: r["cluster_id"] for r in assign.collect()}
    for vid, v in vecs.items():
        d = {
            cid: sum((v[p - 1] - c[p]) ** 2 for p in c)
            for cid, c in cents.items()
        }
        best = min(d, key=lambda cid: (d[cid], cid))
        assert got[vid] == best, (vid, d, got[vid])


def test_kmeans_local_finish_matches_distributed(spark):
    """The hybrid local finish (sub-cut corpora collect and iterate
    driver-side) must be value-identical to the distributed loop — same
    seeds, same per-round round_dp rounding, same argmin tie-break, so
    the only difference is float summation order, which the rounding
    absorbs on these inputs."""
    df = _blob_df(spark)
    a_loc, c_loc = kmeans(df, k=3, n_iter=3)          # 10 rows → local
    a_dst, c_dst = kmeans(df, k=3, n_iter=3, local_finish_vectors=0)
    assert sorted(map(tuple, a_loc.collect())) == sorted(
        map(tuple, a_dst.collect())
    )
    assert sorted(map(tuple, c_loc.collect())) == sorted(
        map(tuple, c_dst.collect())
    )


def test_kmeans_local_finish_matches_distributed_on_corpus(spark):
    """Same parity on the real embeddings table (64-dim, non-separable
    clusters — exercises emptied-cluster drop-out and interior ties the
    blob fixture can't)."""
    from connected_data_lake_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a_loc, c_loc = kmeans(emb, k=8, n_iter=3)
    a_dst, c_dst = kmeans(emb, k=8, n_iter=3, local_finish_vectors=0)
    assert sorted(map(tuple, a_loc.collect())) == sorted(
        map(tuple, a_dst.collect())
    )
    assert sorted(map(tuple, c_loc.collect())) == sorted(
        map(tuple, c_dst.collect())
    )


def test_kmeans_null_vector_rows_skip_both_paths(spark):
    rows = [(0, [0.0, 0.0]), (1, None), (2, [10.0, 10.0]), (3, [10.1, 9.9])]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    for cut in (4096, 0):
        assign, _ = kmeans(df, k=2, n_iter=2, local_finish_vectors=cut)
        got = {r["vec_id"] for r in assign.collect()}
        assert got == {0, 2, 3}, cut
