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
