"""Append-time schema evolution over the manifest table format.

The manifest records the table schema per snapshot (Delta/Iceberg/Lance
all do); appends merge their shape into it — new nullable columns evolve
the table, same-name type conflicts fail BEFORE any data lands — and every
read resolves the schema recorded at the version it reads, so time travel
shows each version's own shape and pre-evolution files fill NULL for
later columns. Copy-on-write maintenance reads candidates under the
recorded schema, so a rewrite of a mixed-schema file subset can never
silently drop an evolved column (the classic inferred-read data-loss bug).
"""

from __future__ import annotations

import os

import pytest

from connected_data_lake_spark.sources import maintenance as M
from connected_data_lake_spark.sources import rootfs as R
from connected_data_lake_spark.sources.manifest import (
    LocalFsStore,
    latest_snapshot,
    merge_schemas,
    snapshot_schema,
)


def _store(uri):
    return LocalFsStore(os.path.join(uri, R._LOG_DIR))


def _v1(spark, uri):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    R.write_table(df.coalesce(1), uri, mode="overwrite")
    return df


def test_append_adds_nullable_column(spark, tmp_path):
    uri = str(tmp_path / "t")
    _v1(spark, uri)
    v2 = spark.createDataFrame([(3, "c", 0.5)], "id long, tag string, score double")
    R.write_table(v2.coalesce(1), uri, mode="append")

    out = R.read_table(spark, uri)
    assert set(out.columns) == {"id", "tag", "score"}
    rows = {r["id"]: r["score"] for r in out.collect()}
    assert rows == {1: None, 2: None, 3: 0.5}  # old files fill NULL
    # recorded schema marks the evolved column nullable
    sch = snapshot_schema(_store(uri))
    assert sch["score"].nullable


def test_append_missing_column_fills_null(spark, tmp_path):
    uri = str(tmp_path / "t")
    _v1(spark, uri)
    narrow = spark.createDataFrame([(9,)], "id long")
    R.write_table(narrow.coalesce(1), uri, mode="append")
    rows = {r["id"]: r["tag"] for r in R.read_table(spark, uri).collect()}
    assert rows == {1: "a", 2: "b", 9: None}


def test_type_conflict_rejected_before_write(spark, tmp_path):
    uri = str(tmp_path / "t")
    _v1(spark, uri)
    _, files_before, _ = latest_snapshot(_store(uri))
    bad = spark.createDataFrame([("x", "y")], "id string, tag string")
    with pytest.raises(ValueError, match="schema evolution conflict on 'id'"):
        R.write_table(bad, uri, mode="append")
    # nothing landed: same files, no orphan txn dirs
    _, files_after, _ = latest_snapshot(_store(uri))
    assert files_after == files_before
    assert R.vacuum_table(uri) == 0


def test_time_travel_reads_each_versions_shape(spark, tmp_path):
    uri = str(tmp_path / "t")
    _v1(spark, uri)  # version 0 (overwrite)
    wide = spark.createDataFrame([(3, "c", 7)], "id long, tag string, n long")
    R.write_table(wide.coalesce(1), uri, mode="append")  # version 1
    v0 = R.read_table(spark, uri, version=0)
    assert set(v0.columns) == {"id", "tag"} and v0.count() == 2
    v1 = R.read_table(spark, uri, version=1)
    assert set(v1.columns) == {"id", "tag", "n"} and v1.count() == 3


def test_overwrite_replaces_schema(spark, tmp_path):
    uri = str(tmp_path / "t")
    _v1(spark, uri)
    fresh = spark.createDataFrame([(1.5,)], "x double")
    R.write_table(fresh.coalesce(1), uri, mode="overwrite")
    assert R.read_table(spark, uri).columns == ["x"]


def test_rewrite_preserves_evolved_column(spark, tmp_path):
    """DELETE planned over a mixed-schema subset keeps evolved values."""
    uri = str(tmp_path / "t")
    _v1(spark, uri)
    wide = spark.createDataFrame([(3, "c", 0.5), (4, "d", 0.9)], "id long, tag string, score double")
    R.write_table(wide.coalesce(1), uri, mode="append")
    out = M.delete_where(spark, uri, [("tag", "=", "a")])
    assert out["version"] is not None
    rows = {r["id"]: r["score"] for r in R.read_table(spark, uri).collect()}
    assert rows == {2: None, 3: 0.5, 4: 0.9}
    # schema survives the rewrite commit (carried forward, not re-merged)
    assert snapshot_schema(_store(uri))["score"].dataType.typeName() == "double"
    # and a whole-table z-order over the evolved column works too
    M.zorder_table(spark, uri, ["id", "score"])
    rows = {r["id"]: r["score"] for r in R.read_table(spark, uri).collect()}
    assert rows == {2: None, 3: 0.5, 4: 0.9}


def test_merge_schemas_unit():
    from pyspark.sql import types as T

    old = T.StructType([T.StructField("a", T.LongType(), False)])
    new = T.StructType(
        [T.StructField("a", T.LongType(), False), T.StructField("b", T.StringType(), False)]
    )
    merged = merge_schemas(old, new)
    assert [f.name for f in merged.fields] == ["a", "b"]
    assert merged["b"].nullable  # evolved columns must admit NULL
    assert merge_schemas(None, new) is new
    with pytest.raises(ValueError, match="conflict"):
        merge_schemas(old, T.StructType([T.StructField("a", T.StringType(), True)]))
