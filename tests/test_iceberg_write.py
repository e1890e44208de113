"""Iceberg WRITE path (sources/iceberg_write.py): v2 metadata this
repo's own reader — and any external Iceberg engine — can replay.

Covers create/append/overwrite snapshots, manifest-list carry-forward,
identity-partitioned fanout with typed partition records + summaries,
field-id-stamped parquet footers, per-file column bounds, static
pruning on written tables, time travel, and the loud writer gates
(nested types, non-identity specs, schema drift, unsupported partition
types)."""

from __future__ import annotations

import glob
import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from connected_data_lake_spark.sources.avro_ocf import read_ocf
from connected_data_lake_spark.sources.iceberg import (
    IcebergProtocolError,
    read_iceberg,
)
from connected_data_lake_spark.sources.iceberg_write import write_iceberg


def _df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
        (F.col("id") * 1.5).alias("v"),
    )


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "tbl")


def test_create_append_roundtrip_and_time_travel(spark, tbl):
    assert write_iceberg(_df(spark, 0, 50), tbl) == 1
    assert write_iceberg(_df(spark, 50, 100), tbl, mode="append") == 2
    back = read_iceberg(spark, tbl)
    assert back.count() == 100
    assert back.agg(F.sum("k")).first()[0] == sum(range(100))
    assert read_iceberg(spark, tbl, snapshot_id=1).count() == 50


def test_overwrite_keeps_history(spark, tbl):
    write_iceberg(_df(spark, 0, 100), tbl)
    write_iceberg(_df(spark, 0, 10), tbl, mode="overwrite")
    assert read_iceberg(spark, tbl).count() == 10
    assert read_iceberg(spark, tbl, snapshot_id=1).count() == 100


def test_mode_error_and_ignore(spark, tbl):
    write_iceberg(_df(spark, 0, 10), tbl)
    with pytest.raises(FileExistsError):
        write_iceberg(_df(spark, 0, 10), tbl, mode="error")
    assert write_iceberg(_df(spark, 0, 99), tbl, mode="ignore") == 1
    assert read_iceberg(spark, tbl).count() == 10


def test_footer_field_ids_stamped(spark, tbl):
    import pyarrow.parquet as pq

    write_iceberg(_df(spark, 0, 10), tbl)
    f = glob.glob(os.path.join(tbl, "data", "*.parquet"))[0]
    got = {
        fld.name: (fld.metadata or {}).get(b"PARQUET:field_id")
        for fld in pq.ParquetFile(f).schema_arrow
    }
    assert got == {"k": b"1", "p": b"2", "v": b"3"}


def test_partitioned_files_keep_all_columns(spark, tbl):
    import pyarrow.parquet as pq

    write_iceberg(_df(spark, 0, 90), tbl, partition_by=["p"])
    for f in glob.glob(os.path.join(tbl, "data", "*.parquet")):
        names = [fld.name for fld in pq.ParquetFile(f).schema_arrow]
        # identity source columns are STORED in Iceberg data files (the
        # staging fanout aliases must not leak, and p must not be dropped)
        assert names == ["k", "p", "v"]
    back = read_iceberg(spark, tbl)
    assert back.count() == 90
    assert back.filter(F.col("p") == "1").count() == 30


def test_manifest_partition_records_and_bounds(spark, tbl):
    write_iceberg(
        _df(spark, 0, 90).repartition(1), tbl, partition_by=["p"]
    )
    mpaths = [
        p
        for p in glob.glob(os.path.join(tbl, "metadata", "m-*.avro"))
    ]
    assert len(mpaths) == 1
    _schema, entries = read_ocf(open(mpaths[0], "rb").read())
    assert {e["data_file"]["partition"]["p"] for e in entries} == {"0", "1", "2"}
    for e in entries:
        assert e["status"] == 1
        assert e["data_file"]["record_count"] == 30
        lower = {kv["key"]: kv["value"] for kv in e["data_file"]["lower_bounds"]}
        upper = {kv["key"]: kv["value"] for kv in e["data_file"]["upper_bounds"]}
        pv = int(e["data_file"]["partition"]["p"])
        # field id 1 = k; per-partition k values are pv, pv+3, ..., <90
        assert struct.unpack("<q", lower[1])[0] == pv
        assert struct.unpack("<q", upper[1])[0] == (87 + pv)


def test_static_pruning_on_written_table(spark, tbl):
    write_iceberg(_df(spark, 0, 90), tbl, partition_by=["p"])
    pruned = read_iceberg(spark, tbl, filters=[("p", "=", "1")])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # manifest pruning cut the scan to the single partition's file(s)
    n_all = len(glob.glob(os.path.join(tbl, "data", "*.parquet")))
    assert n_all >= 3
    import re

    m = re.search(r"number of files read: (\d+)", plan)
    if m:  # plan-stat formatting is version-dependent; fall back to rows
        assert int(m.group(1)) <= n_all // 3
    assert pruned.count() == 30


def test_manifest_list_carry_forward_sequence_numbers(spark, tbl):
    write_iceberg(_df(spark, 0, 30), tbl)
    write_iceberg(_df(spark, 30, 60), tbl, mode="append")
    meta = json.load(open(os.path.join(tbl, "metadata", "v2.metadata.json")))
    snap2 = next(s for s in meta["snapshots"] if s["snapshot-id"] == 2)
    _schema, recs = read_ocf(
        open(snap2["manifest-list"].replace(f"{tbl}/", f"{tbl}/", 1), "rb").read()
        if os.path.isabs(snap2["manifest-list"]) is False
        else open(snap2["manifest-list"], "rb").read()
    )
    assert len(recs) == 2
    by_snap = {r["added_snapshot_id"]: r for r in recs}
    # the carried manifest keeps snapshot 1's ORIGINAL sequence number
    assert by_snap[1]["sequence_number"] == 1
    assert by_snap[2]["sequence_number"] == 2
    assert meta["last-sequence-number"] == 2


def test_schema_drift_refused(spark, tbl):
    write_iceberg(_df(spark, 0, 10), tbl)
    other = spark.range(0, 5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg(other, tbl, mode="append")


def test_partition_mismatch_refused(spark, tbl):
    write_iceberg(_df(spark, 0, 10), tbl, partition_by=["p"])
    with pytest.raises(ValueError, match="partition_by"):
        write_iceberg(_df(spark, 10, 20), tbl, mode="append")


def test_nested_type_gate(spark, tbl):
    df = spark.range(0, 5).select(
        F.col("id").alias("k"), F.array(F.col("id")).alias("arr")
    )
    with pytest.raises(IcebergProtocolError, match="flat primitive"):
        write_iceberg(df, tbl)


def test_unsupported_partition_type_gate(spark, tbl):
    df = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
    )
    with pytest.raises(IcebergProtocolError, match="identity partition"):
        write_iceberg(df, tbl, partition_by=["v"])


def test_version_hint_and_metadata_versions(spark, tbl):
    write_iceberg(_df(spark, 0, 10), tbl)
    write_iceberg(_df(spark, 10, 20), tbl, mode="append")
    hint = open(os.path.join(tbl, "metadata", "version-hint.text")).read()
    assert hint.strip() == "2"
    assert os.path.isfile(os.path.join(tbl, "metadata", "v1.metadata.json"))
    assert os.path.isfile(os.path.join(tbl, "metadata", "v2.metadata.json"))


def test_no_staging_left_behind(spark, tbl):
    write_iceberg(_df(spark, 0, 30), tbl, partition_by=["p"])
    leftovers = [
        os.path.relpath(n, tbl)
        for n in glob.glob(os.path.join(tbl, "**"), recursive=True)
        if "_staging_" in os.path.relpath(n, tbl)
        or "__ipart_" in os.path.relpath(n, tbl)
        or ".tmp-" in os.path.relpath(n, tbl)
    ]
    assert leftovers == []


def test_compact_iceberg_bin_packs_as_replace_snapshot(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import compact_iceberg

    for lo in range(0, 100, 20):  # 5 append snapshots → ≥5 files
        write_iceberg(_df(spark, lo, lo + 20), tbl, mode="append")
    n_before = len(glob.glob(os.path.join(tbl, "data", "*.parquet")))
    assert n_before >= 5
    snap = compact_iceberg(spark, tbl, target_file_rows=1_000_000)
    back = read_iceberg(spark, tbl)
    assert back.count() == 100 and back.agg(F.sum("k")).first()[0] == 4950
    assert len(back.inputFiles()) == 1  # one live file after bin-pack
    meta = json.load(
        open(os.path.join(tbl, "metadata", "v6.metadata.json"))
    )
    s = next(x for x in meta["snapshots"] if x["snapshot-id"] == snap)
    assert s["summary"]["operation"] == "replace"
    # pre-compaction snapshots still time-travel
    assert read_iceberg(spark, tbl, snapshot_id=2).count() == 40


def test_expire_snapshots_reclaims_unreferenced(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        compact_iceberg,
        expire_iceberg_snapshots,
    )

    write_iceberg(_df(spark, 0, 50), tbl)
    write_iceberg(_df(spark, 50, 100), tbl, mode="append")
    compact_iceberg(spark, tbl, target_file_rows=1_000_000)
    doomed = expire_iceberg_snapshots(tbl, keep_last=1, dry_run=True)
    assert any(d.startswith("data/") for d in doomed)
    assert any(d.startswith("metadata/") for d in doomed)
    expire_iceberg_snapshots(tbl, keep_last=1)
    back = read_iceberg(spark, tbl)
    assert back.count() == 100
    # expired snapshot ids are gone from metadata
    meta = json.load(
        open(os.path.join(tbl, "metadata", "v4.metadata.json"))
    )
    assert len(meta["snapshots"]) == 1
    with pytest.raises(Exception):
        read_iceberg(spark, tbl, snapshot_id=1).count()
    # second expiry is a no-op
    assert expire_iceberg_snapshots(tbl, keep_last=1, dry_run=True) == []


def test_delete_from_iceberg_cow(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        delete_from_iceberg,
    )

    write_iceberg(_df(spark, 0, 90), tbl, partition_by=["p"])
    write_iceberg(_df(spark, 90, 120), tbl, mode="append", partition_by=["p"])
    snap = delete_from_iceberg(spark, tbl, "p = '1' AND k < 30")
    assert snap == 3
    back = read_iceberg(spark, tbl)
    assert back.count() == 120 - 10
    assert back.filter("p = '1'").count() == 30
    # pre-delete snapshot still reads
    assert read_iceberg(spark, tbl, snapshot_id=2).count() == 120
    # untouched partitions' ORIGINAL files still serve the new snapshot
    files = {os.path.basename(f) for f in back.inputFiles()}
    meta = json.load(open(os.path.join(tbl, "metadata", "v2.metadata.json")))
    assert meta["current-snapshot-id"] == 2


def test_update_iceberg_cow(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import update_iceberg

    write_iceberg(_df(spark, 0, 90), tbl, partition_by=["p"])
    snap = update_iceberg(spark, tbl, "p = '0' AND k >= 60", {"v": "v + 1000"})
    back = read_iceberg(spark, tbl)
    assert back.count() == 90
    got = {r["k"]: r["v"] for r in back.filter("p = '0'").collect()}
    assert got[60] == 60 * 1.5 + 1000 and got[57] == 57 * 1.5


def test_iceberg_dml_no_match_noop(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        delete_from_iceberg,
    )

    write_iceberg(_df(spark, 0, 30), tbl)
    assert delete_from_iceberg(spark, tbl, "k > 999") == 1  # unchanged snap
    assert read_iceberg(spark, tbl).count() == 30
    # no new metadata version was committed
    assert not os.path.isfile(os.path.join(tbl, "metadata", "v2.metadata.json"))


def test_merge_into_iceberg_upsert(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        merge_into_iceberg,
    )

    write_iceberg(_df(spark, 0, 90), tbl, partition_by=["p"])
    source = spark.range(0, 5).select(
        (F.col("id") * 30).alias("k"),  # 0,30,60 exist; 90,120 new
        (F.col("id") % 3).cast("string").alias("p"),
        F.lit(-1.0).alias("v"),
    )
    snap = merge_into_iceberg(
        spark, tbl, source, on=["k"], when_matched_update={"v": "src.v"}
    )
    assert snap == 2
    back = read_iceberg(spark, tbl)
    assert back.count() == 92
    got = {r["k"]: r["v"] for r in back.filter(F.col("k") % 30 == 0).collect()}
    assert got[0] == -1.0 and got[60] == -1.0
    assert got[90] == -1.0 and got[120] == -1.0
    assert read_iceberg(spark, tbl, snapshot_id=1).count() == 90


def test_merge_into_iceberg_noop(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        merge_into_iceberg,
    )

    write_iceberg(_df(spark, 0, 10), tbl)
    snap = merge_into_iceberg(
        spark, tbl, _df(spark, 100, 105), on=["k"],
        when_matched_update={"v": "src.v"}, when_not_matched_insert=False,
    )
    assert snap == 1
    assert not os.path.isfile(os.path.join(tbl, "metadata", "v2.metadata.json"))


def test_schema_merge_evolves_with_new_field_ids(spark, tbl):
    write_iceberg(_df(spark, 0, 10), tbl)
    wider = _df(spark, 10, 20).withColumn("extra", F.col("k") * 10)
    with pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg(wider, tbl, mode="append")
    snap = write_iceberg(wider, tbl, mode="append", schema_mode="merge")
    assert snap == 2
    meta = json.load(open(os.path.join(tbl, "metadata", "v2.metadata.json")))
    assert meta["current-schema-id"] == 1
    assert len(meta["schemas"]) == 2  # prior schema retained
    new_field = next(
        f
        for f in meta["schemas"][1]["fields"]
        if f["name"] == "extra"
    )
    assert new_field["id"] == 4 and new_field["required"] is False
    assert meta["last-column-id"] == 4
    back = read_iceberg(spark, tbl)
    assert back.count() == 20 and "extra" in back.columns
    got = {r["k"]: r["extra"] for r in back.collect()}
    assert got[15] == 150 and got[5] is None  # old files read null by id
    # snapshot 1 still reads with ITS OWN (narrower) schema
    assert "extra" not in read_iceberg(spark, tbl, snapshot_id=1).columns
    # narrower appends fine under merge, schema unchanged (id 1 reused)
    write_iceberg(_df(spark, 20, 30), tbl, mode="append", schema_mode="merge")
    meta3 = json.load(open(os.path.join(tbl, "metadata", "v3.metadata.json")))
    assert meta3["current-schema-id"] == 1 and len(meta3["schemas"]) == 2
    assert read_iceberg(spark, tbl).filter("extra IS NULL").count() == 20


def test_iceberg_schema_merge_refuses_type_change(spark, tbl):
    write_iceberg(_df(spark, 0, 10), tbl)
    changed = _df(spark, 10, 20).withColumn("v", F.col("v").cast("string"))
    with pytest.raises(ValueError, match="cannot change column types"):
        write_iceberg(changed, tbl, mode="append", schema_mode="merge")


# ---------------------------------------------------------------------------
# merge-on-read DML: position-delete writes (mode="mor")
# ---------------------------------------------------------------------------


def _manifest_recs(tbl):
    """Manifest-list records of the current snapshot."""
    from connected_data_lake_spark.sources.iceberg import IcebergStore
    from connected_data_lake_spark.sources.iceberg_write import _current_meta

    meta, _v = _current_meta(tbl)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    store = IcebergStore(tbl)
    _s, recs = read_ocf(store.read_uri(snap["manifest-list"]))
    return recs


def test_mor_delete_writes_position_deletes_not_rewrites(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import delete_from_iceberg

    write_iceberg(_df(spark, 0, 90).coalesce(1), tbl, partition_by=["p"])
    data0 = sorted(glob.glob(os.path.join(tbl, "data", "*.parquet")))
    mtimes0 = {f: os.path.getmtime(f) for f in data0}
    snap = delete_from_iceberg(spark, tbl, "k % 10 = 5", mode="mor")
    back = read_iceberg(spark, tbl)
    assert back.count() == 81
    assert back.filter("k % 10 = 5").count() == 0
    # original data files untouched; the only new parquet is a delete file
    data1 = sorted(glob.glob(os.path.join(tbl, "data", "*.parquet")))
    assert set(data0) <= set(data1)
    assert {f: os.path.getmtime(f) for f in data0} == mtimes0
    new = set(data1) - set(data0)
    assert new and all("-del-" in f for f in new)
    # the manifest list carries a content=1 delete manifest at the new seq
    recs = _manifest_recs(tbl)
    del_recs = [r for r in recs if r.get("content") == 1]
    assert len(del_recs) == 1
    assert del_recs[0]["added_rows_count"] == 9
    assert del_recs[0]["sequence_number"] == 2
    # prior snapshot still reads in full
    from connected_data_lake_spark.sources.iceberg_write import _current_meta

    meta, _v = _current_meta(tbl)
    prev = min(s["snapshot-id"] for s in meta["snapshots"])
    assert read_iceberg(spark, tbl, snapshot_id=prev).count() == 90
    assert snap == meta["current-snapshot-id"]


def test_mor_delete_file_is_sorted_with_spec_field_ids(spark, tbl):
    import pyarrow.parquet as pq

    from connected_data_lake_spark.sources.iceberg_write import delete_from_iceberg

    write_iceberg(_df(spark, 0, 100).coalesce(1), tbl)
    delete_from_iceberg(spark, tbl, "k % 3 = 1", mode="mor")
    del_files = [
        f
        for f in glob.glob(os.path.join(tbl, "data", "*.parquet"))
        if "-del-" in f
    ]
    assert len(del_files) == 1
    pf = pq.ParquetFile(del_files[0])
    schema = pf.schema_arrow
    assert [f.name for f in schema] == ["file_path", "pos"]
    # spec reserved field ids for position-delete columns
    assert schema.field("file_path").metadata[b"PARQUET:field_id"] == b"2147483546"
    assert schema.field("pos").metadata[b"PARQUET:field_id"] == b"2147483545"
    t = pf.read()
    rows = list(zip(t.column("file_path").to_pylist(), t.column("pos").to_pylist()))
    assert rows == sorted(rows)
    # file_path values are the EXACT manifest-declared data-file paths
    recs = _manifest_recs(tbl)
    data_manifest = next(r for r in recs if r.get("content", 0) == 0)
    from connected_data_lake_spark.sources.iceberg import IcebergStore

    _es, entries = read_ocf(
        IcebergStore(tbl).read_uri(data_manifest["manifest_path"])
    )
    declared = {e["data_file"]["file_path"] for e in entries}
    assert {fp for fp, _p in rows} <= declared


def test_mor_redelete_applies_cumulatively(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import delete_from_iceberg

    write_iceberg(_df(spark, 0, 100).coalesce(1), tbl)
    s1 = delete_from_iceberg(spark, tbl, "k % 10 = 5", mode="mor")
    delete_from_iceberg(spark, tbl, "k % 10 = 6", mode="mor")
    back = read_iceberg(spark, tbl)
    assert back.count() == 80
    assert back.filter("k % 10 IN (5, 6)").count() == 0
    assert read_iceberg(spark, tbl, snapshot_id=s1).count() == 90


def test_mor_update_writes_only_updated_rows(spark, tbl):
    import pyarrow.parquet as pq

    from connected_data_lake_spark.sources.iceberg_write import update_iceberg

    write_iceberg(_df(spark, 0, 90).coalesce(1), tbl, partition_by=["p"])
    data0 = set(glob.glob(os.path.join(tbl, "data", "*.parquet")))
    update_iceberg(spark, tbl, "k % 30 = 7", {"v": "-v"}, mode="mor")
    back = read_iceberg(spark, tbl)
    assert back.count() == 90
    got = {r["k"]: r["v"] for r in back.filter("k % 30 = 7").collect()}
    assert got == {k: -(k * 1.5) for k in (7, 37, 67)}
    # new NON-delete parquet files hold exactly the 3 updated rows
    new_data = [
        f
        for f in set(glob.glob(os.path.join(tbl, "data", "*.parquet"))) - data0
        if "-del-" not in f
    ]
    assert sum(pq.ParquetFile(f).metadata.num_rows for f in new_data) == 3
    with pytest.raises(ValueError, match="unknown column"):
        update_iceberg(spark, tbl, "k = 1", {"nope": "1"}, mode="mor")


def test_mor_then_cow_and_compaction_interoperate(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        compact_iceberg,
        delete_from_iceberg,
        expire_iceberg_snapshots,
    )

    write_iceberg(_df(spark, 0, 100).coalesce(1), tbl)
    delete_from_iceberg(spark, tbl, "k % 4 = 1", mode="mor")
    delete_from_iceberg(spark, tbl, "k % 4 = 2")  # CoW on the MoR'd table
    back = read_iceberg(spark, tbl)
    assert back.count() == 50
    assert back.filter("k % 4 IN (1, 2)").count() == 0
    # compaction folds the deletes into fresh base files (replace snapshot)
    compact_iceberg(spark, tbl)
    assert read_iceberg(spark, tbl).count() == 50
    recs = _manifest_recs(tbl)
    assert all(r.get("content", 0) == 0 for r in recs)
    # expiry reclaims the now-unreferenced delete files
    doomed = expire_iceberg_snapshots(tbl, keep_last=1)
    assert any("-del-" in d for d in doomed)
    assert read_iceberg(spark, tbl).count() == 50


def test_mor_delete_no_match_is_noop(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        _current_meta,
        delete_from_iceberg,
    )

    write_iceberg(_df(spark, 0, 30), tbl)
    meta0, v0 = _current_meta(tbl)
    snap = delete_from_iceberg(spark, tbl, "k > 999", mode="mor")
    meta1, v1 = _current_meta(tbl)
    assert snap == meta0["current-snapshot-id"] and v1 == v0
    assert read_iceberg(spark, tbl).count() == 30


def test_mor_unknown_mode_refused(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        delete_from_iceberg,
        update_iceberg,
    )

    write_iceberg(_df(spark, 0, 10), tbl)
    with pytest.raises(ValueError, match="unknown DELETE mode"):
        delete_from_iceberg(spark, tbl, "k = 1", mode="nope")
    with pytest.raises(ValueError, match="unknown UPDATE mode"):
        update_iceberg(spark, tbl, "k = 1", {"v": "1"}, mode="nope")


# ---------------------------------------------------------------------------
# incremental append scan: read_iceberg_incremental
# ---------------------------------------------------------------------------


def test_incremental_reads_only_appended_snapshots(spark, tbl):
    from connected_data_lake_spark.sources.iceberg import read_iceberg_incremental

    s1 = write_iceberg(_df(spark, 0, 50), tbl)
    s2 = write_iceberg(_df(spark, 50, 80), tbl, mode="append")
    s3 = write_iceberg(_df(spark, 80, 90), tbl, mode="append")
    inc = read_iceberg_incremental(spark, tbl, s1)
    assert inc.count() == 40
    assert inc.filter("k < 50").count() == 0
    per = {
        r["_snapshot_id"]: r["n"]
        for r in inc.groupBy("_snapshot_id").agg(F.count("*").alias("n")).collect()
    }
    assert per == {s2: 30, s3: 10}
    assert read_iceberg_incremental(spark, tbl, s1, s2).count() == 30
    assert read_iceberg_incremental(spark, tbl, s3).count() == 0


def test_incremental_skips_replace_and_gates_deletes(spark, tbl):
    from connected_data_lake_spark.sources.iceberg import read_iceberg_incremental
    from connected_data_lake_spark.sources.iceberg_write import (
        compact_iceberg,
        delete_from_iceberg,
    )

    s1 = write_iceberg(_df(spark, 0, 50), tbl)
    write_iceberg(_df(spark, 50, 80), tbl, mode="append")
    compact_iceberg(spark, tbl)  # replace snapshot: rearrangement only
    s4 = write_iceberg(_df(spark, 80, 85), tbl, mode="append")
    inc = read_iceberg_incremental(spark, tbl, s1)
    # 30 appended + 5 appended; the compaction's rewritten files NOT
    # re-emitted (the property that makes this safe across maintenance)
    assert inc.count() == 35
    delete_from_iceberg(spark, tbl, "k = 1", mode="mor")
    with pytest.raises(ValueError, match="incremental append scan"):
        read_iceberg_incremental(spark, tbl, s4).count()
    # a range ending BEFORE the delete still reads
    assert read_iceberg_incremental(spark, tbl, s1, s4).count() == 35


def test_incremental_unknown_snapshot_refused(spark, tbl):
    from connected_data_lake_spark.sources.iceberg import read_iceberg_incremental

    write_iceberg(_df(spark, 0, 10), tbl)
    with pytest.raises(ValueError, match="unknown from_snapshot_id"):
        read_iceberg_incremental(spark, tbl, 424242)


# ---------------------------------------------------------------------------
# CDC-style equality-delete writes
# ---------------------------------------------------------------------------


def test_equality_delete_without_table_scan(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        equality_delete_iceberg,
    )

    write_iceberg(_df(spark, 0, 100).coalesce(1), tbl)
    data0 = sorted(glob.glob(os.path.join(tbl, "data", "*.parquet")))
    keys = spark.range(0, 100).filter("id % 10 = 5").selectExpr("id AS k")
    snap = equality_delete_iceberg(spark, tbl, keys)
    back = read_iceberg(spark, tbl)
    assert back.count() == 90 and back.filter("k % 10 = 5").count() == 0
    # commit wrote ONLY the key file — base files untouched
    new = set(glob.glob(os.path.join(tbl, "data", "*.parquet"))) - set(data0)
    assert len(new) == 1 and "-eqdel-" in next(iter(new))
    # the delete manifest declares content=2 + equality_ids
    recs = _manifest_recs(tbl)
    del_rec = next(r for r in recs if r.get("content") == 1)
    from connected_data_lake_spark.sources.iceberg import IcebergStore

    _es, entries = read_ocf(IcebergStore(tbl).read_uri(del_rec["manifest_path"]))
    assert entries[0]["data_file"]["content"] == 2
    assert entries[0]["data_file"]["equality_ids"] == [1]  # field id of k
    assert snap == 2


def test_equality_delete_sequence_scoping_reinsert_survives(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        equality_delete_iceberg,
    )

    write_iceberg(_df(spark, 0, 100), tbl)
    keys = spark.range(0, 100).filter("id % 10 = 5").selectExpr("id AS k")
    equality_delete_iceberg(spark, tbl, keys)
    # re-insert the deleted keys at a HIGHER sequence: they must survive
    reins = _df(spark, 0, 100).filter("k % 10 = 5").withColumn(
        "v", -F.col("v")
    )
    write_iceberg(reins, tbl, mode="append")
    back = read_iceberg(spark, tbl)
    assert back.count() == 100
    assert back.filter("k % 10 = 5").filter("v <> -(k * 1.5)").count() == 0
    # time travel to the pre-delete snapshot
    assert read_iceberg(spark, tbl, snapshot_id=1).count() == 100


def test_equality_delete_validation(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        equality_delete_iceberg,
    )

    write_iceberg(_df(spark, 0, 10), tbl)
    with pytest.raises(ValueError, match="not in the table schema"):
        equality_delete_iceberg(
            spark, tbl, spark.range(1).selectExpr("id AS nope")
        )
    # empty key set: no-op, no new snapshot
    snap = equality_delete_iceberg(
        spark, tbl, spark.range(0).selectExpr("id AS k")
    )
    assert snap == 1
    assert read_iceberg(spark, tbl).count() == 10


def test_compact_iceberg_zorder_tightens_bounds(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import compact_iceberg

    df = spark.range(0, 20_000).select(
        (F.col("id") % 131).alias("k"),
        ((F.col("id") * 7919) % 500).alias("v"),
    )
    write_iceberg(df, tbl)
    compact_iceberg(spark, tbl, target_file_rows=2000, zorder_by=["k", "v"])
    n_all = len(read_iceberg(spark, tbl).inputFiles())
    assert n_all >= 8
    for col, val in (("k", 120), ("v", 450)):
        pr = read_iceberg(spark, tbl, filters=[(col, ">=", val)])
        assert len(pr.inputFiles()) < n_all * 0.6, col
        assert pr.count() == df.filter(f"{col} >= {val}").count()


def test_rollback_iceberg_restores_old_snapshot(spark, tbl):
    from connected_data_lake_spark.sources.iceberg_write import (
        delete_from_iceberg,
        rollback_iceberg,
        write_iceberg,
    )

    write_iceberg(_df(spark, 0, 100), tbl)
    delete_from_iceberg(spark, tbl, "k % 10 = 5", mode="mor")
    assert read_iceberg(spark, tbl).count() == 90
    assert rollback_iceberg(tbl, 1) == 1
    assert read_iceberg(spark, tbl).count() == 100
    # forward again (rollback is symmetric) and unknown ids refuse
    rollback_iceberg(tbl, 2)
    assert read_iceberg(spark, tbl).count() == 90
    with pytest.raises(ValueError, match="unknown snapshot"):
        rollback_iceberg(tbl, 999)


def test_delete_manifests_commit_under_unpartitioned_spec(spark, tbl):
    """ADVICE r13: delete files on a PARTITIONED table must not commit
    under the partitioned default spec with all-null partition tuples —
    spec-compliant external readers index delete files by partition and
    would never apply them to non-null partitions. They commit under an
    UNPARTITIONED spec instead (globally applicable per the spec's Scan
    Planning rules)."""
    from connected_data_lake_spark.sources.iceberg_write import (
        _current_meta,
        delete_from_iceberg,
        equality_delete_iceberg,
    )

    write_iceberg(_df(spark, 0, 90).coalesce(1), tbl, partition_by=["p"])
    delete_from_iceberg(spark, tbl, "k % 10 = 5", mode="mor")
    meta, _v = _current_meta(tbl)
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    unpart = [sid for sid, s in specs.items() if not s.get("fields")]
    assert len(unpart) == 1, "exactly one unpartitioned spec registered"
    default = meta["default-spec-id"]
    assert specs[default]["fields"], "default spec stays partitioned"
    recs = _manifest_recs(tbl)
    for r in recs:
        if r.get("content") == 1:
            assert r["partition_spec_id"] == unpart[0]
        else:
            assert r["partition_spec_id"] == default
    # the delete entries carry an EMPTY partition record, not nulls
    del_rec = next(r for r in recs if r.get("content") == 1)
    from connected_data_lake_spark.sources.iceberg import IcebergStore

    _es, entries = read_ocf(IcebergStore(tbl).read_uri(del_rec["manifest_path"]))
    assert all(e["data_file"]["partition"] == {} for e in entries)
    assert read_iceberg(spark, tbl).count() == 81
    # equality deletes reuse the SAME unpartitioned spec (no duplicate)
    keys = spark.createDataFrame([(1,), (2,)], "k long")
    equality_delete_iceberg(spark, tbl, keys, ["k"])
    meta2, _v2 = _current_meta(tbl)
    assert [s for s in meta2["partition-specs"] if not s.get("fields")] == [
        {"spec-id": unpart[0], "fields": []}
    ]
    recs2 = _manifest_recs(tbl)
    eq_rec = [r for r in recs2 if r.get("content") == 1]
    assert all(r["partition_spec_id"] == unpart[0] for r in eq_rec)
    assert read_iceberg(spark, tbl).count() == 79
