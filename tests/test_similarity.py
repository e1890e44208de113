"""Similarity-search operators: exact brute force is correct on a
hand-checkable case; LSH achieves usable recall vs the exact baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connected_data_lake_spark.operators import similarity as SIM
from connected_data_lake_spark.sources.tables import load_table


def test_knn_brute_force_hand_case(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),  # closest to 0
            (2, [0.0, 1.0]),  # orthogonal to 0
            (3, [-1.0, 0.0]),  # opposite
        ],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") == 0)
    got = SIM.knn_brute_force(df, q, k=3).orderBy("rank").collect()
    assert [r.neighbor_id for r in got] == [1, 2, 3]
    assert got[0].cos > 0.99 and abs(got[1].cos) < 1e-6 and got[2].cos == -1.0


def test_knn_excludes_self(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    got = SIM.knn_brute_force(emb, q, k=5).collect()
    assert all(r.neighbor_id != 0 for r in got)
    assert len(got) == 5


def test_sketch_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 5)
    exact = SIM.knn_brute_force(emb, q, k=10)
    approx = SIM.knn_sketch(emb, q, k=10, n_bits=256, candidates_per_query=100)
    r = SIM.recall_at_k(exact, approx, k=10)
    # measured 0.94 on this corpus; isotropic data is the worst case
    assert r >= 0.8, f"recall@10 {r}"


def test_sketch_cos_values_match_exact_for_shared_pairs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 1)
    exact = SIM.knn_brute_force(emb, q, k=10).select("query_id", "neighbor_id", "cos")
    approx = SIM.knn_sketch(emb, q, k=10).select("query_id", "neighbor_id", "cos")
    diff = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .filter(exact["cos"] != approx["cos"])
        .count()
    )
    assert diff == 0


def test_sketch_hamming_zero_for_identical(spark):
    df = spark.createDataFrame([(0, [0.5, -1.0, 2.0])], "vec_id long, embedding array<double>")
    planes = SIM.make_planes(3, 64, seed=1)
    sk = df.select(SIM.hyperplane_sketch("embedding", planes).alias("s"))
    row = sk.select(SIM.sketch_hamming("s", "s").alias("h")).first()
    assert row.h == 0


def test_ivf_recall_improves_with_nprobe(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 5)
    idx, cents = SIM.ivf_index(emb, n_cells=16)
    idx = idx.cache()
    exact = SIM.knn_brute_force(emb, q, k=10).cache()
    r4 = SIM.recall_at_k(exact, SIM.knn_ivf(idx, cents, q, k=10, nprobe=4), 10)
    r8 = SIM.recall_at_k(exact, SIM.knn_ivf(idx, cents, q, k=10, nprobe=8), 10)
    assert r4 >= 0.3  # quarter of the cells probed
    assert r8 >= r4 - 0.05  # monotone-ish (ties aside)
    assert r8 >= 0.6


def test_ivf_probing_all_cells_equals_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 3)
    idx, cents = SIM.ivf_index(emb, n_cells=8)
    exact = SIM.knn_brute_force(emb, q, k=10)
    full = SIM.knn_ivf(idx, cents, q, k=10, nprobe=8)
    assert SIM.recall_at_k(exact, full, 10) == 1.0


def test_ivf_index_partitions_whole_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    idx, cents = SIM.ivf_index(emb, n_cells=8)
    assert idx.count() == emb.count()  # every row lands in exactly one cell
    assert idx.select("cell").distinct().count() <= 8
    assert len(cents) == 8


def test_quantize_int8_codes_and_error_bounds(spark, sf_dir):
    from connected_data_lake_spark.plans import spec_of

    df = spec_of("embedding_quantize_int8").spark(spark, sf_dir)
    rows = df.collect()
    assert rows
    import math

    for r in rows:
        assert r["scale"] > 0
        # mean residual per code is <= 0.5^2 per dim; 128 dims -> <= 32,
        # and in practice ~dims/12. q_sum bounded by 127*dims.
        assert 0 <= r["sq_err_codes"] <= 32.0
        assert abs(r["q_sum"]) <= 127 * 128
        assert not math.isnan(r["sq_err_codes"])


def test_pq_recall_and_code_shape(spark, sf_dir):
    from connected_data_lake_spark.operators.similarity import (
        knn_brute_force,
        knn_pq,
        pq_encode,
        pq_train,
        recall_at_k,
    )
    from connected_data_lake_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb)
    assert books.shape == (16, 256, 4)
    codes = emb.select(pq_encode("embedding", books).alias("c")).collect()
    assert all(len(r.c) == 16 and all(0 <= v < 256 for v in r.c) for r in codes)
    q = emb.filter(F.col("vec_id").isin(0, 1, 2))
    exact = knn_brute_force(emb, q, k=10)
    approx = knn_pq(emb, q, books, k=10)
    assert recall_at_k(exact, approx, 10) >= 0.8


def test_pq_adc_orders_planted_neighbor_first(spark):
    # a vector equal to a corpus point must get ADC distance ~0 to it and
    # rank it first after re-rank
    import random as _r

    rng = _r.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from connected_data_lake_spark.operators.similarity import knn_pq, pq_train

    books = pq_train(df, sample_n=300)
    probe = spark.createDataFrame([(9999, rows[7][1])], "vec_id long, embedding array<double>")
    got = knn_pq(df, probe, books, k=1).collect()
    assert got[0].neighbor_id == 7 and got[0].cos == 1.0


def test_pq_prebuilt_codes_path_matches_inline_path(spark, sf_dir):
    # ADC over a codes-only index + base-table re-rank join must return
    # exactly what the inline (emb-carried) path returns
    from connected_data_lake_spark.operators.similarity import knn_pq, pq_encode, pq_train

    emb = load_table(spark, sf_dir, "embeddings").cache()
    q = emb.filter(F.col("vec_id").isin(0, 1))
    books = pq_train(emb)
    codes = emb.select("vec_id", pq_encode("embedding", books).alias("codes")).cache()
    inline = {(r.query_id, r.rank): (r.neighbor_id, r.cos) for r in knn_pq(emb, q, books, k=10).collect()}
    viacodes = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos)
        for r in knn_pq(emb, q, books, k=10, codes=codes).collect()
    }
    assert inline == viacodes


def test_pca_train_project_properties(spark, sf_dir):
    """PCA basis: orthonormal rows, deterministic signs, projection =
    centered matmul, variance non-increasing across components."""
    import numpy as np

    from connected_data_lake_spark.operators import similarity as SIM
    from connected_data_lake_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    mu, comps = SIM.pca_train(emb, k=8)
    assert comps.shape[0] == 8 and comps.shape[1] == len(mu)
    # orthonormal basis
    assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-8)
    # deterministic sign convention: largest-|coord| positive
    for row in comps:
        assert row[np.abs(row).argmax()] > 0
    rows = SIM.pca_project(emb, mu, comps).select("vec_id", "embedding", "pca").collect()
    X = np.asarray([r.embedding for r in rows], dtype=np.float64)
    P = np.asarray([r.pca for r in rows])
    assert np.allclose(P, (X - mu) @ comps.T, atol=1e-8)
    v = P.var(axis=0)
    assert all(v[i] >= v[i + 1] - 1e-9 for i in range(len(v) - 1))
