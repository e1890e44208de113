"""Distributed k-means (Lloyd) over an embedding column.

Beyond the reference's SQL surface (build mandate: training-data pipeline
operators are first-class): corpus clustering is the backbone of semantic
dedup and diversity sampling in an LLM data pipeline — cluster the
embedding space, then sample/cap per cluster. The reference ships vectors
only as opaque payloads (cdl-fs lib.rs:772-792); the clustering semantics
here are public Lloyd's algorithm.

Spark-first shape (the same long-form broadcast pattern as the green
``knn_centroid_classify`` query):

- vectors live as ``(id, pos, val)`` rows — ``posexplode`` once, persist
  for the iteration loop;
- every assignment step is a **broadcast** join against the k*dim centroid
  relation with a map-side partial ``SUM`` collapsing ``n*dim*k`` rows to
  ``n*k`` before the shuffle, and the argmin as a per-id window
  (ties → smaller cluster id);
- the update step is one ``(cluster, pos)`` aggregate.

Centroids (k*dim doubles) are collected to the driver between rounds —
planning-sized metadata, the same documented pattern as IVF routing
(``operators/similarity.py``) — which also truncates the iterative
lineage so round N's plan does not replay rounds 1..N-1.

Determinism / oracle parity: centroid coordinates are rounded to
``round_dp`` decimals after init and after every update on BOTH the Spark
side and the DuckDB oracle, so the iterations are reproducible as long as
the two engines' ``AVG`` agree to well under 10^-round_dp (they agree to
~1e-12 relative on doubles); distance ties break on cluster id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def long_form(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """``(id, pos, val)`` long form of an array column; pos is 1-based to
    match DuckDB's ``generate_subscripts``."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(vec_col).alias("_pos0", "_valf"),
    ).select(
        "_id",
        (F.col("_pos0") + 1).alias("_pos"),
        F.col("_valf").cast("double").alias("_val"),
    )


def _assign(u: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: ``(_id, _cid)`` — broadcast join on
    ``_pos``, partial-agg squared L2, argmin as a MIN over (d2, cid)
    structs. Struct ordering is lexicographic, so MIN reproduces the
    window form's ``ORDER BY _d2, _cid`` tie-break exactly while
    combining map-side — the window variant added a sort exchange per
    round (a few percent locally where job latency dominates; at cluster
    scale the removed n*k-row sort is the difference that matters)."""
    d2 = (
        u.join(F.broadcast(cent), "_pos")
        .groupBy("_id", "_cid")
        .agg(
            F.sum(
                (F.col("_val") - F.col("_cval"))
                * (F.col("_val") - F.col("_cval"))
            ).alias("_d2")
        )
    )
    return d2.groupBy("_id").agg(
        F.min(F.struct("_d2", "_cid"))["_cid"].alias("_cid")
    )


def kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    round_dp: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Lloyd k-means; returns ``(assignments, centroids)``.

    - ``assignments``: ``(id_col, cluster_id)`` — one row per input row,
      nearest final centroid.
    - ``centroids``: ``(cluster_id, pos, cval)`` long form of the final
      (post-update, rounded) centroids. A cluster that loses every member
      during an update simply drops out, exactly as in the SQL mirror.

    Init: the k rows with the smallest ``id_col`` values, cluster ids
    assigned by id rank (0-based). All numeric state is rounded to
    ``round_dp`` decimals between rounds (see module docstring).
    """
    spark = df.sparkSession
    # deliberately NOT spread(): at cluster scale the embedding table
    # arrives in many splits and the long form inherits that width; at
    # local fixture size an A/B showed the spread shuffle COSTS more than
    # the single narrow task (3.3 s -> 5.4 s median — the per-row work is
    # trivial arithmetic, unlike the pandas-UDF dedup passes spread() is
    # for)
    u = long_form(df, id_col, vec_col).persist()
    try:
        seed_ids = [
            r[0]
            for r in df.select(id_col).orderBy(id_col).limit(k).collect()
        ]
        id_to_cid = {v: i for i, v in enumerate(seed_ids)}
        init_rows = [
            (id_to_cid[r["_id"]], r["_pos"], round(r["_val"], round_dp))
            for r in u.filter(F.col("_id").isin(seed_ids)).collect()
        ]
        cent_rows = init_rows
        for _ in range(n_iter):
            cent = spark.createDataFrame(
                cent_rows, "_cid INT, _pos INT, _cval DOUBLE"
            )
            assign = _assign(u, cent)
            cent_rows = [
                (r["_cid"], r["_pos"], round(r["_cval"], round_dp))
                for r in (
                    # assign joins un-hinted: it is n rows (one per vector),
                    # so AQE broadcasts it at test scale but correctly falls
                    # back to a shuffle join when n is cluster-sized
                    u.join(assign, "_id")
                    .groupBy("_cid", "_pos")
                    .agg(F.avg("_val").alias("_cval"))
                ).collect()
            ]
        final_cent = spark.createDataFrame(
            cent_rows, "_cid INT, _pos INT, _cval DOUBLE"
        )
    finally:
        u.unpersist()
    # the returned assignment plan re-derives the long form from the source
    # relation (NOT the just-unpersisted `u`), so it stays valid — and
    # distributed: no O(n) rows ever visit the driver, only k*dim centroids
    final_assign = _assign(long_form(df, id_col, vec_col), final_cent).select(
        F.col("_id").alias(id_col), F.col("_cid").alias("cluster_id")
    )
    centroids = final_cent.select(
        F.col("_cid").alias("cluster_id"),
        F.col("_pos").alias("pos"),
        F.col("_cval").alias("cval"),
    )
    return final_assign, centroids
