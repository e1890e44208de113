"""Transactional table commits (SURVEY §2.1 S4 + reference commit-handler
semantics, crates/cdl-fs/src/lib.rs:822-853): manifest protocol, concurrent
appends, time travel, vacuum."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pytest

from connected_data_lake_spark.sources import rootfs as R


def _rows(spark, tag: str, n: int = 10):
    return spark.createDataFrame(
        [
            (f"{tag}-{i}.txt", "/", None, None, None, 0o644, 3, 0, 0, 3, bytearray(b"abc"))
            for i in range(n)
        ],
        R.ROOTFS_SCHEMA,
    )


def test_append_overwrite_roundtrip(spark, tmp_path):
    uri = str(tmp_path / "tbl")
    R.write_table(_rows(spark, "a"), uri, mode="overwrite")
    R.write_table(_rows(spark, "b"), uri, mode="append")
    assert R.read_table(spark, uri).count() == 20
    assert R.table_version(uri) == 1
    # overwrite replaces the snapshot, older versions stay readable
    R.write_table(_rows(spark, "c", 5), uri, mode="overwrite")
    assert R.read_table(spark, uri).count() == 5
    assert R.read_table(spark, uri, version=1).count() == 20


def test_concurrent_appends_all_land(spark, tmp_path):
    """Four racing appenders: the conditional put serializes them — every
    commit lands, none is lost, and the final snapshot is their union."""
    uri = str(tmp_path / "tbl")
    R.write_table(_rows(spark, "base", 1), uri, mode="overwrite")

    def _append(i: int) -> None:
        R.write_table(_rows(spark, f"w{i}", 10), uri, mode="append")

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(_append, range(4)))

    assert R.read_table(spark, uri).count() == 1 + 4 * 10
    assert R.table_version(uri) == 4  # versions dense: no lost update
    names = {r["name"] for r in R.read_table(spark, uri).select("name").collect()}
    for i in range(4):
        assert f"w{i}-0.txt" in names


def test_readers_never_see_partial_writes(spark, tmp_path):
    """A txn dir without a published manifest is invisible to readers."""
    uri = str(tmp_path / "tbl")
    R.write_table(_rows(spark, "a"), uri, mode="overwrite")
    # simulate a crashed writer: data files exist, manifest never published
    crashed = os.path.join(uri, "txn-deadbeef")
    _rows(spark, "crash").write.format("parquet").mode("overwrite").save(crashed)
    assert R.read_table(spark, uri).count() == 10  # crash rows invisible
    # default retention shields the young orphan (it may be an in-flight
    # writer's staged dir); retention 0 (exclusive access) reclaims it
    assert R.vacuum_table(uri) == 0
    removed = R.vacuum_table(uri, retention_hours=0)
    assert removed > 0
    assert not os.path.isdir(crashed)
    assert R.read_table(spark, uri).count() == 10


def test_vacuum_keeps_current_snapshot(spark, tmp_path):
    uri = str(tmp_path / "tbl")
    R.write_table(_rows(spark, "a"), uri, mode="overwrite")
    R.write_table(_rows(spark, "b"), uri, mode="overwrite")  # supersedes a
    assert R.vacuum_table(uri, retention_hours=0) > 0  # a's files collected
    assert R.read_table(spark, uri).count() == 10
    with pytest.raises(Exception):
        # time travel to a vacuumed version now fails on missing files
        R.read_table(spark, uri, version=0).count()


def test_legacy_table_migrates_on_append(spark, tmp_path):
    """Plain-parquet tables written before the manifest protocol gain a
    version-0 snapshot on first transactional append."""
    uri = str(tmp_path / "tbl")
    _rows(spark, "old").write.format("parquet").mode("overwrite").save(uri)
    R.write_table(_rows(spark, "new"), uri, mode="append")
    assert R.read_table(spark, uri).count() == 20
    assert R.table_version(uri) == 1


def test_read_appends_incremental_consumption(spark, tmp_path):
    """A checkpointing consumer reads exactly the rows appended since its
    last-seen version — never the whole table."""
    uri = str(tmp_path / "tbl")
    R.write_table(_rows(spark, "a", 5), uri, mode="overwrite")
    v0 = R.table_version(uri)
    R.write_table(_rows(spark, "b", 7), uri, mode="append")
    R.write_table(_rows(spark, "c", 3), uri, mode="append")
    inc = R.read_appends(spark, uri, from_version=v0)
    assert inc.count() == 10
    names = {r["name"] for r in inc.select("name").collect()}
    assert all(n.startswith(("b-", "c-")) for n in names)
    # bounded range: only the first append
    only_b = R.read_appends(spark, uri, from_version=v0, to_version=v0 + 1)
    assert only_b.count() == 7
    # from_version=-1 (no checkpoint yet) yields everything
    assert R.read_appends(spark, uri, from_version=-1).count() == 15
    # caught-up consumer gets an empty frame with the snapshot schema
    v2 = R.table_version(uri)
    empty = R.read_appends(spark, uri, from_version=v2)
    assert empty.count() == 0
    snap = R.read_table(spark, uri).schema
    assert [(f.name, f.dataType) for f in empty.schema] == [
        (f.name, f.dataType) for f in snap
    ]


def test_read_appends_detects_rewrite(spark, tmp_path):
    """A copy-on-write rewrite in the range must raise, not double-count."""
    uri = str(tmp_path / "tbl")
    R.write_table(_rows(spark, "a", 5), uri, mode="overwrite")
    v0 = R.table_version(uri)
    R.write_table(_rows(spark, "b", 5), uri, mode="append")
    from connected_data_lake_spark.sources.maintenance import delete_where

    delete_where(spark, uri, [("name", "=", "a-0.txt")])
    with pytest.raises(R.RewriteInRange):
        R.read_appends(spark, uri, from_version=v0)
    # a range that stops before the rewrite still reads cleanly
    assert R.read_appends(spark, uri, from_version=v0, to_version=v0 + 1).count() == 5
