"""Hudi COPY_ON_WRITE write path (sources/hudi.py::write_hudi):
timeline + file-slice layout this repo's own reader replays, with the
meta columns real Hudi readers expect."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from connected_data_lake_spark.sources.hudi import (
    hudi_timeline,
    read_hudi,
    write_hudi,
)


def _df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
        (F.col("id") * 1.5).alias("v"),
    )


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "hudi")


def test_insert_roundtrip_and_meta_columns(spark, tbl):
    t1 = write_hudi(_df(spark, 0, 50), tbl, record_key="k")
    back = read_hudi(spark, tbl)
    assert back.count() == 50
    assert not [c for c in back.columns if c.startswith("_hoodie_")]
    raw = spark.read.parquet(*glob.glob(os.path.join(tbl, "*.parquet")))
    assert "_hoodie_record_key" in raw.columns
    assert raw.select("_hoodie_commit_time").distinct().first()[0] == t1
    assert hudi_timeline(tbl) == [{"instant": t1, "action": "commit"}]


def test_insert_append_second_commit(spark, tbl):
    t1 = write_hudi(_df(spark, 0, 30), tbl, record_key="k")
    t2 = write_hudi(_df(spark, 30, 60), tbl, record_key="k", mode="insert")
    assert int(t2) == int(t1) + 1
    assert read_hudi(spark, tbl).count() == 60
    assert read_hudi(spark, tbl, as_of_instant=t1).count() == 30


def test_upsert_rewrites_hit_file_groups(spark, tbl):
    write_hudi(_df(spark, 0, 30).coalesce(1), tbl, record_key="k")
    upd = spark.range(0, 3).select(
        (F.col("id") * 10).alias("k"),
        F.lit("x").alias("p"),
        F.lit(-1.0).alias("v"),
    )
    t2 = write_hudi(upd, tbl, record_key="k", mode="upsert")
    back = read_hudi(spark, tbl)
    assert back.count() == 30
    got = {r["k"]: r["v"] for r in back.collect()}
    assert got[0] == -1.0 and got[10] == -1.0 and got[20] == -1.0
    assert got[1] == 1.5
    # pre-upsert snapshot intact (new SLICE of the same file group)
    old = {r["k"]: r["v"] for r in read_hudi(
        spark, tbl, as_of_instant=str(int(t2) - 1)
    ).collect()}
    assert old[0] == 0.0


def test_upsert_inserts_unseen_keys(spark, tbl):
    write_hudi(_df(spark, 0, 10).coalesce(1), tbl, record_key="k")
    mixed = spark.createDataFrame(
        [(5, "x", -5.0), (100, "y", 100.0)], "k long, p string, v double"
    )
    write_hudi(mixed, tbl, record_key="k", mode="upsert")
    back = {r["k"]: r["v"] for r in read_hudi(spark, tbl).collect()}
    assert len(back) == 11
    assert back[5] == -5.0 and back[100] == 100.0 and back[6] == 9.0


def test_overwrite_is_replacecommit(spark, tbl):
    write_hudi(_df(spark, 0, 50), tbl, record_key="k")
    t2 = write_hudi(_df(spark, 0, 5), tbl, record_key="k", mode="overwrite")
    assert read_hudi(spark, tbl).count() == 5
    tl = hudi_timeline(tbl)
    assert tl[-1] == {"instant": t2, "action": "replacecommit"}
    # pre-overwrite snapshot intact
    assert read_hudi(spark, tbl, as_of_instant=str(int(t2) - 1)).count() == 50


def test_partitioned_insert_layout(spark, tbl):
    write_hudi(_df(spark, 0, 90), tbl, record_key="k", partition_by=["p"])
    back = read_hudi(spark, tbl)
    assert back.count() == 90
    assert back.filter("p = '1'").count() == 30
    # hive-style partition dirs with per-group files
    assert glob.glob(os.path.join(tbl, "1", "*.parquet"))
    commit = json.load(
        open(glob.glob(os.path.join(tbl, ".hoodie", "*.commit"))[0])
    )
    assert set(commit["partitionToWriteStats"]) == {"0", "1", "2"}


def test_record_key_mismatch_refused(spark, tbl):
    write_hudi(_df(spark, 0, 10), tbl, record_key="k")
    with pytest.raises(ValueError, match="record_key"):
        write_hudi(_df(spark, 10, 20), tbl, record_key="p")
