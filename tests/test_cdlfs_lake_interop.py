"""CdlFS ↔ open-lake-format interop: the facade's egress
(`to_delta_table` / `to_iceberg_table`) and ingress (`load_from_delta`
/ `load_from_iceberg` / `load_from_hudi`) round-trip a rootfs dataset —
timestamp_ntz + binary columns included (Delta needs the timestampNtz
TABLE FEATURE at protocol (3,7); the writer must emit it and the
reader must accept it back)."""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture()
def src_tree(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "empty.txt").write_bytes(b"")
    (src / "a.bin").write_bytes(os.urandom(9000))
    (src / "sub").mkdir()
    (src / "sub" / "b.txt").write_text("hello world")
    return str(src)


@pytest.fixture()
def fs(spark, src_tree):
    from connected_data_lake_spark.filesystem import Cdl

    fs = Cdl(spark).open(f"local://{src_tree}")
    fs.load(max_chunk_size=4096)
    return fs


def test_delta_roundtrip_via_facade(fs, tmp_path):
    from connected_data_lake_spark.sources.delta import read_delta

    tbl = str(tmp_path / "delta_tbl")
    version = fs.to_delta_table(tbl)
    assert version == 0
    # protocol carries the timestampNtz feature (rootfs has NTZ columns)
    commit = open(os.path.join(tbl, "_delta_log", f"{0:020d}.json")).read()
    proto = next(
        json.loads(l)["protocol"] for l in commit.splitlines() if '"protocol"' in l
    )
    assert proto["minReaderVersion"] == 3
    assert "timestampNtz" in proto["readerFeatures"]
    back = read_delta(fs.spark, tbl)
    orig = fs.table()
    assert back.count() == orig.count()
    # byte-exact data column survives
    a = {r["name"]: r["data"] for r in orig.collect()}
    b = {r["name"]: r["data"] for r in back.collect()}
    assert a == b
    # ingress: a fresh dataset loaded FROM the exported table answers SQL
    fs2 = fs.cdl.open(f"local://{tmp_path / 'ds2'}")
    fs2.load_from_delta(tbl)
    assert (
        fs2.sql("SELECT COUNT(*) AS n FROM rootfs").first()["n"]
        == orig.count()
    )


def test_iceberg_roundtrip_via_facade(fs, tmp_path):
    from connected_data_lake_spark.sources.iceberg import read_iceberg

    tbl = str(tmp_path / "ice_tbl")
    snap = fs.to_iceberg_table(tbl)
    assert snap == 1
    back = read_iceberg(fs.spark, tbl)
    orig = fs.table()
    assert back.count() == orig.count()
    a = {(r["name"], r["chunk_id"]): r["data"] for r in orig.collect()}
    b = {(r["name"], r["chunk_id"]): r["data"] for r in back.collect()}
    assert a == b
    fs2 = fs.cdl.open(f"local://{tmp_path / 'ds2'}")
    fs2.load_from_iceberg(tbl)
    assert (
        fs2.sql("SELECT COUNT(*) AS n FROM rootfs").first()["n"]
        == orig.count()
    )


def test_load_from_delta_refuses_non_rootfs(fs, tmp_path):
    from pyspark.sql import functions as F

    from connected_data_lake_spark.sources.delta_write import write_delta

    tbl = str(tmp_path / "not_rootfs")
    write_delta(fs.spark.range(0, 5).select(F.col("id").alias("k")), tbl)
    with pytest.raises(ValueError, match="missing columns"):
        fs.cdl.open(f"local://{tmp_path / 'ds3'}").load_from_delta(tbl)


def test_hudi_roundtrip_via_facade_cow_and_mor(fs, tmp_path):
    """to_hudi_table → read back; MERGE_ON_READ export + log-block DML →
    load_from_hudi dispatches to the MoR merge reader by table type."""
    from connected_data_lake_spark.sources.hudi import (
        delete_from_hudi_mor,
        read_hudi,
    )

    # COW export/ingress
    cow = str(tmp_path / "hudi_cow")
    # binary/NTZ columns are not Avro-log encodable, but COW base files
    # carry them fine
    fs.to_hudi_table(cow, record_key="name", stmt="SELECT * FROM rootfs")
    back = read_hudi(fs.spark, cow)
    assert back.count() == fs.table().count()
    fs2 = fs.cdl.open(f"local://{tmp_path / 'ds_cow'}")
    fs2.load_from_hudi(cow)
    assert (
        fs2.sql("SELECT COUNT(*) AS n FROM rootfs").first()["n"]
        == fs.table().count()
    )

    # MoR export with primitive columns only, then log-block DELETE;
    # load_from_hudi must read the MERGED snapshot (deleted row gone)
    mor = str(tmp_path / "hudi_mor")
    # record keys must be UNIQUE per row (chunked files repeat `name`,
    # and the MoR merge would newest-wins them into one row per key) —
    # export one aggregated row per file
    fs.to_hudi_table(
        mor,
        record_key="name",
        stmt=(
            "SELECT name, SUM(length(data)) AS n_bytes "
            "FROM rootfs GROUP BY name"
        ),
        table_type="MERGE_ON_READ",
    )
    n_files = fs.sql("SELECT COUNT(DISTINCT name) AS n FROM rootfs").first()["n"]
    delete_from_hudi_mor(fs.spark, mor, "n_bytes = 0")
    from connected_data_lake_spark.sources.hudi import read_hudi_mor

    merged = read_hudi_mor(fs.spark, mor)
    assert merged.count() == n_files - 1  # the empty file row deleted
    assert merged.filter("n_bytes = 0").count() == 0
