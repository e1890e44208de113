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
