"""Delta WRITE path (sources/delta_write.py): spec-compliant commit logs
this repo's own reader — and any external Delta engine — can replay.

Covers create/append/overwrite modes, hive-partitioned layout +
partitionValues agreement, footer-derived per-file stats, classic
checkpoints (+ replay after log cleanup), put-if-absent commit
atomicity behind a concurrent writer, and the loud writer-protocol
gates (schema/partition mismatch, appendOnly, columnMapping,
writerFeatures)."""

from __future__ import annotations

import json
import glob
import os

import pytest
from pyspark.sql import functions as F

from connected_data_lake_spark.sources.delta import (
    DeltaProtocolError,
    delta_table_version,
    read_delta,
)
from connected_data_lake_spark.sources.delta_write import (
    checkpoint_delta,
    write_delta,
)


def _df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
        (F.col("id") * 1.5).alias("v"),
    )


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "tbl")


def test_create_append_roundtrip(spark, tbl):
    assert write_delta(_df(spark, 0, 50), tbl, mode="error") == 0
    assert write_delta(_df(spark, 50, 100), tbl, mode="append") == 1
    back = read_delta(spark, tbl)
    assert back.count() == 100
    assert back.agg(F.sum("k")).first()[0] == sum(range(100))
    # time travel sees only the first write
    assert read_delta(spark, tbl, version=0).count() == 50


def test_overwrite_replaces_live_set(spark, tbl):
    write_delta(_df(spark, 0, 100), tbl)
    write_delta(_df(spark, 0, 10), tbl, mode="overwrite")
    assert read_delta(spark, tbl).count() == 10
    # old files stay readable via time travel (logical delete only)
    assert read_delta(spark, tbl, version=0).count() == 100


def test_mode_error_and_ignore(spark, tbl):
    write_delta(_df(spark, 0, 10), tbl)
    with pytest.raises(FileExistsError):
        write_delta(_df(spark, 0, 10), tbl, mode="error")
    # ignore: no-op, returns current version, data unchanged
    assert write_delta(_df(spark, 0, 99), tbl, mode="ignore") == 0
    assert read_delta(spark, tbl).count() == 10


def test_partitioned_layout_matches_partition_values(spark, tbl):
    write_delta(_df(spark, 0, 90), tbl, partition_by=["p"])
    commit = os.path.join(tbl, "_delta_log", f"{0:020d}.json")
    adds = [
        json.loads(line)["add"]
        for line in open(commit)
        if '"add"' in line
    ]
    assert adds, "no add actions committed"
    for a in adds:
        # the hive dir name and the recorded partitionValues must agree —
        # the reader refuses tables where they diverge
        assert a["path"].startswith(f"p={a['partitionValues']['p']}/")
    # reading back an equality filter partition-prunes to 1/3 of rows
    got = read_delta(spark, tbl).filter(F.col("p") == "1")
    assert got.count() == 30
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in plan


def test_add_stats_from_footer(spark, tbl):
    write_delta(_df(spark, 0, 100).coalesce(1), tbl)
    commit = os.path.join(tbl, "_delta_log", f"{0:020d}.json")
    adds = [json.loads(l)["add"] for l in open(commit) if '"add"' in l]
    assert len(adds) == 1
    stats = json.loads(adds[0]["stats"])
    assert stats["numRecords"] == 100
    assert stats["minValues"]["k"] == 0 and stats["maxValues"]["k"] == 99
    assert stats["minValues"]["v"] == 0.0 and stats["maxValues"]["v"] == 148.5
    assert stats["nullCount"]["k"] == 0


def test_checkpoint_then_log_cleanup_replay(spark, tbl):
    write_delta(_df(spark, 0, 40), tbl, partition_by=["p"])
    write_delta(_df(spark, 40, 80), tbl, mode="append", partition_by=["p"])
    assert checkpoint_delta(tbl) == 1
    assert os.path.isfile(
        os.path.join(tbl, "_delta_log", f"{1:020d}.checkpoint.parquet")
    )
    ptr = json.load(open(os.path.join(tbl, "_delta_log", "_last_checkpoint")))
    assert ptr["version"] == 1
    # vacuum the compacted commits: replay must come from the checkpoint
    for v in (0, 1):
        os.unlink(os.path.join(tbl, "_delta_log", f"{v:020d}.json"))
    assert read_delta(spark, tbl).count() == 80
    # the next write resolves its version THROUGH the checkpoint
    assert (
        write_delta(_df(spark, 80, 90), tbl, mode="append", partition_by=["p"])
        == 2
    )
    assert read_delta(spark, tbl).count() == 90
    assert delta_table_version(tbl) == 2


def test_checkpoint_time_travel_through_checkpoint(spark, tbl):
    write_delta(_df(spark, 0, 30), tbl)
    write_delta(_df(spark, 30, 60), tbl, mode="append")
    checkpoint_delta(tbl)
    write_delta(_df(spark, 60, 90), tbl, mode="append")
    assert read_delta(spark, tbl, version=1).count() == 60
    assert read_delta(spark, tbl).count() == 90


def test_concurrent_commit_retries_to_next_version(spark, tbl):
    write_delta(_df(spark, 0, 10), tbl)
    # a concurrent writer takes version 1 (commitInfo-only commit is legal)
    squatter = os.path.join(tbl, "_delta_log", f"{1:020d}.json")
    with open(squatter, "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "NOOP"}}) + "\n")
    assert write_delta(_df(spark, 10, 20), tbl, mode="append") == 2
    assert read_delta(spark, tbl).count() == 20


def test_schema_mismatch_refused(spark, tbl):
    write_delta(_df(spark, 0, 10), tbl)
    other = spark.range(0, 5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(other, tbl, mode="append")


def test_partitioning_mismatch_refused(spark, tbl):
    write_delta(_df(spark, 0, 10), tbl, partition_by=["p"])
    with pytest.raises(ValueError, match="partition_by"):
        write_delta(_df(spark, 10, 20), tbl, mode="append")


def test_append_only_table_refuses_overwrite(spark, tbl):
    write_delta(
        _df(spark, 0, 10), tbl, configuration={"delta.appendOnly": "true"}
    )
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        write_delta(_df(spark, 0, 5), tbl, mode="overwrite")
    # appends stay allowed
    write_delta(_df(spark, 10, 20), tbl, mode="append")
    assert read_delta(spark, tbl).count() == 20


def test_column_mapping_table_refuses_write(spark, tbl):
    write_delta(_df(spark, 0, 10), tbl)
    # upgrade the table to columnMapping out-of-band (reader handles it;
    # the WRITER must refuse rather than write logical-named files)
    commit = os.path.join(tbl, "_delta_log", f"{1:020d}.json")
    meta = None
    for line in open(os.path.join(tbl, "_delta_log", f"{0:020d}.json")):
        action = json.loads(line)
        if "metaData" in action:
            meta = action["metaData"]
    meta["configuration"] = {"delta.columnMapping.mode": "name"}
    with open(commit, "w") as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        write_delta(_df(spark, 10, 20), tbl, mode="append")


def test_unsupported_writer_features_gate(spark, tbl):
    write_delta(_df(spark, 0, 10), tbl)
    commit = os.path.join(tbl, "_delta_log", f"{1:020d}.json")
    with open(commit, "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": ["generatedColumns"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(DeltaProtocolError, match="generatedColumns"):
        write_delta(_df(spark, 10, 20), tbl, mode="append")


def test_null_partition_value_roundtrip(spark, tbl):
    df = spark.range(0, 20).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit(None)).otherwise(
            F.lit("odd")
        ).alias("p"),
    )
    write_delta(df, tbl, partition_by=["p"])
    assert glob.glob(os.path.join(tbl, "p=__HIVE_DEFAULT_PARTITION__", "*"))
    back = read_delta(spark, tbl)
    assert back.count() == 20
    assert back.filter(F.col("p").isNull()).count() == 10


def test_no_staging_or_tmp_left_behind(spark, tbl):
    write_delta(_df(spark, 0, 30), tbl, partition_by=["p"])
    checkpoint_delta(tbl)
    leftovers = [
        rel
        for n in glob.glob(os.path.join(tbl, "**"), recursive=True)
        if "_staging_" in (rel := os.path.relpath(n, tbl)) or ".tmp-" in rel
    ]
    assert leftovers == []


def test_ntz_table_checkpoint_preserves_features(spark, tbl):
    df = spark.range(0, 10).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id")).cast("timestamp_ntz").alias("t"),
    )
    write_delta(df, tbl)
    write_delta(df, tbl, mode="append")
    checkpoint_delta(tbl)
    # vacuum the compacted commits: the FEATURE lists must survive in the
    # checkpoint's protocol row or the reader would mis-gate the table
    for v in (0, 1):
        os.unlink(os.path.join(tbl, "_delta_log", f"{v:020d}.json"))
    back = read_delta(spark, tbl)
    assert back.count() == 20
    assert dict(back.dtypes)["t"] == "timestamp_ntz"


def test_commit_delta_on_conditional_put_store(spark):
    """The object-store commit leg: one conditional PUT per commit, the
    manifest store's winner/loser contract, replayable through
    ObjectStoreDeltaLog."""
    from connected_data_lake_spark.sources.delta import (
        ObjectStoreDeltaLog,
        _replay,
    )
    from connected_data_lake_spark.sources.delta_write import commit_delta
    from connected_data_lake_spark.sources.manifest import InMemoryStore

    store = InMemoryStore()
    proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    meta = {
        "metaData": {
            "id": "t",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": spark.range(1).schema.json(),
            "partitionColumns": [],
            "configuration": {},
        }
    }
    add = {
        "add": {
            "path": "a.parquet",
            "partitionValues": {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }
    assert commit_delta(store, 0, [proto, meta, add]) is True
    # loser: same version again
    assert commit_delta(store, 0, [proto, meta]) is False
    assert commit_delta(store, 1, [{"remove": {"path": "a.parquet", "dataChange": True}}]) is True
    m, adds, p = _replay(ObjectStoreDeltaLog(store), "s3://t", None)
    assert adds == [] and p["minWriterVersion"] == 2
    m0, adds0, _ = _replay(ObjectStoreDeltaLog(store), "s3://t", 0)
    assert [a["path"] for a in adds0] == ["a.parquet"]


def test_compact_delta_bin_packs_without_data_change(spark, tbl):
    import glob as _glob

    for lo in range(0, 100, 20):  # 5 appends → ≥5 small files
        write_delta(_df(spark, lo, lo + 20), tbl, mode="append")
    n_before = len(
        [json.loads(l)["add"]
         for v in range(5)
         for l in open(os.path.join(tbl, "_delta_log", f"{v:020d}.json"))
         if '"add"' in l]
    )
    assert n_before >= 5
    from connected_data_lake_spark.sources.delta_write import compact_delta

    v = compact_delta(spark, tbl, target_file_rows=1_000_000)
    assert v == 5
    back = read_delta(spark, tbl)
    assert back.count() == 100 and back.agg(F.sum("k")).first()[0] == 4950
    # one live file now; the commit is dataChange=false end to end
    live_adds = [
        json.loads(l)["add"]
        for l in open(os.path.join(tbl, "_delta_log", f"{5:020d}.json"))
        if '"add"' in l
    ]
    assert len(live_adds) == 1 and live_adds[0]["dataChange"] is False
    # pre-compaction snapshots still read (logical rewrite only)
    assert read_delta(spark, tbl, version=2).count() == 60


def test_compact_delta_partitioned_keeps_layout(spark, tbl):
    write_delta(_df(spark, 0, 30), tbl, partition_by=["p"])
    write_delta(_df(spark, 30, 60), tbl, mode="append", partition_by=["p"])
    from connected_data_lake_spark.sources.delta_write import compact_delta

    compact_delta(spark, tbl, target_file_rows=1_000_000)
    back = read_delta(spark, tbl)
    assert back.count() == 60
    assert back.filter(F.col("p") == "2").count() == 20
    plan = back.filter(F.col("p") == "2")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in plan


def test_vacuum_deletes_unreferenced_files_after_retention(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import vacuum_delta

    write_delta(_df(spark, 0, 50), tbl)
    write_delta(_df(spark, 0, 10), tbl, mode="overwrite")
    # within retention: nothing deletable
    assert vacuum_delta(tbl, dry_run=True) == []
    # zero retention: the overwritten version-0 files become deletable
    doomed = vacuum_delta(tbl, retention_ms=0, dry_run=True)
    assert doomed, "overwritten files should be vacuumable at 0 retention"
    vacuum_delta(tbl, retention_ms=0)
    # current snapshot unaffected; time travel to v0 now fails on scan
    assert read_delta(spark, tbl).count() == 10
    with pytest.raises(Exception):
        read_delta(spark, tbl, version=0).count()
    # vacuum is idempotent
    assert vacuum_delta(tbl, retention_ms=0) == []


def test_delete_from_delta_rewrites_only_hit_files(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import delete_from_delta

    # 3 partition files; the predicate hits only p=1
    write_delta(_df(spark, 0, 90), tbl, partition_by=["p"])
    adds0 = {
        json.loads(l)["add"]["path"]
        for l in open(os.path.join(tbl, "_delta_log", f"{0:020d}.json"))
        if '"add"' in l
    }
    v = delete_from_delta(spark, tbl, "p = '1' AND k < 30")
    assert v == 1
    back = read_delta(spark, tbl)
    assert back.count() == 90 - 10  # keys 1,4,...,28 removed
    assert back.filter("p = '1'").count() == 20
    # only the p=1 file was removed/rewritten; p=0 and p=2 files untouched
    commit1 = open(os.path.join(tbl, "_delta_log", f"{1:020d}.json")).read()
    removed = {
        json.loads(l)["remove"]["path"]
        for l in commit1.splitlines()
        if '"remove"' in l
    }
    # file-level granularity: every removed file is a p=1 file that the
    # predicate could hit; p=0 / p=2 files are never touched
    assert removed and removed <= {p for p in adds0 if p.startswith("p=1/")}
    # time travel still sees the pre-delete table
    assert read_delta(spark, tbl, version=0).count() == 90


def test_delete_no_match_is_noop(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import delete_from_delta

    write_delta(_df(spark, 0, 30), tbl)
    assert delete_from_delta(spark, tbl, "k > 999") == 0  # no new version
    assert read_delta(spark, tbl).count() == 30


def test_update_delta_rewrites_matching_rows(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import update_delta

    write_delta(_df(spark, 0, 90), tbl, partition_by=["p"])
    v = update_delta(
        spark, tbl, "p = '2' AND k >= 60", {"v": "v * 100"}
    )
    assert v == 1
    back = read_delta(spark, tbl)
    assert back.count() == 90
    got = {r["k"]: r["v"] for r in back.filter("p = '2'").collect()}
    assert got[62] == 62 * 1.5 * 100 and got[59] == 59 * 1.5
    # unknown column refused
    with pytest.raises(ValueError, match="unknown column"):
        update_delta(spark, tbl, "k = 1", {"nope": "1"})


def test_merge_into_delta_upsert(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import merge_into_delta

    write_delta(_df(spark, 0, 90), tbl, partition_by=["p"])
    source = spark.range(0, 5).select(
        (F.col("id") * 30).alias("k"),          # 0,30,60 exist; 90,120 new
        (F.col("id") % 3).cast("string").alias("p"),
        F.lit(-1.0).alias("v"),
    )
    v = merge_into_delta(
        spark, tbl, source, on=["k"],
        when_matched_update={"v": "src.v"},
    )
    assert v == 1
    back = read_delta(spark, tbl)
    assert back.count() == 92  # 90 + 2 inserts
    got = {r["k"]: r["v"] for r in back.filter(F.col("k") % 30 == 0).collect()}
    assert got[0] == -1.0 and got[60] == -1.0     # matched → updated
    assert got[90] == -1.0 and got[120] == -1.0   # unmatched → inserted
    assert {r["k"]: r["v"] for r in back.filter("k = 31").collect()} == {31: 46.5}


def test_merge_into_delta_matched_delete(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import merge_into_delta

    write_delta(_df(spark, 0, 30), tbl)
    source = spark.range(0, 3).select(
        (F.col("id") * 10).alias("k"),
        F.lit("x").alias("p"),
        F.lit(0.0).alias("v"),
    )
    merge_into_delta(
        spark, tbl, source, on=["k"],
        when_matched_delete=True, when_not_matched_insert=False,
    )
    back = read_delta(spark, tbl)
    assert back.count() == 27
    assert back.filter(F.col("k").isin(0, 10, 20)).count() == 0


def test_merge_into_delta_duplicate_source_keys_refused(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import merge_into_delta

    write_delta(_df(spark, 0, 10), tbl)
    dup = _df(spark, 0, 4).union(_df(spark, 0, 2))
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_into_delta(spark, tbl, dup, on=["k"])


def test_merge_into_delta_noop_when_nothing_matches_or_inserts(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import merge_into_delta

    write_delta(_df(spark, 0, 10), tbl)
    src = _df(spark, 100, 105)
    v = merge_into_delta(
        spark, tbl, src, on=["k"],
        when_matched_update={"v": "src.v"},
        when_not_matched_insert=False,
    )
    assert v == 0  # no commit
    assert read_delta(spark, tbl).count() == 10


def test_schema_merge_adds_nullable_columns(spark, tbl):
    write_delta(_df(spark, 0, 10), tbl)
    wider = _df(spark, 10, 20).withColumn("extra", F.col("k") * 10)
    # strict refuses
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(wider, tbl, mode="append")
    v = write_delta(wider, tbl, mode="append", schema_mode="merge")
    assert v == 1
    back = read_delta(spark, tbl)
    assert back.count() == 20
    assert "extra" in back.columns
    got = {r["k"]: r["extra"] for r in back.collect()}
    assert got[15] == 150 and got[5] is None  # old files read null
    # narrower appends are fine under merge (missing cols read null)
    write_delta(_df(spark, 20, 30), tbl, mode="append", schema_mode="merge")
    assert read_delta(spark, tbl).filter("extra IS NULL").count() == 20


def test_schema_merge_refuses_type_change(spark, tbl):
    write_delta(_df(spark, 0, 10), tbl)
    changed = _df(spark, 10, 20).withColumn("v", F.col("v").cast("string"))
    with pytest.raises(ValueError, match="cannot change column types"):
        write_delta(changed, tbl, mode="append", schema_mode="merge")


# ---------------------------------------------------------------------------
# merge-on-read DML: deletion-vector writes (mode="dv")
# ---------------------------------------------------------------------------


def _live_adds(tbl):
    """(path, deletionVector) of the current snapshot's live adds."""
    from connected_data_lake_spark.sources.delta import _replay, _store_for

    _m, live, proto = _replay(_store_for(tbl, None), tbl, None)
    return live, proto


def test_dv_delete_marks_rows_without_rewriting_files(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import delete_from_delta

    # one file per partition dir → every hit file keeps live rows, so the
    # delete must mark with DVs (never the full-file removal path)
    write_delta(_df(spark, 0, 90).coalesce(1), tbl, partition_by=["p"])
    data0 = sorted(glob.glob(os.path.join(tbl, "p=*", "*.parquet")))
    mtimes0 = {f: os.path.getmtime(f) for f in data0}
    v = delete_from_delta(spark, tbl, "k % 10 = 5", mode="dv")
    assert v == 1
    back = read_delta(spark, tbl)
    assert back.count() == 81
    assert back.filter("k % 10 = 5").count() == 0
    # NO data file moved — the delete wrote only a DV sidecar + log entry
    data1 = sorted(glob.glob(os.path.join(tbl, "p=*", "*.parquet")))
    assert data1 == data0
    assert {f: os.path.getmtime(f) for f in data1} == mtimes0
    bins = glob.glob(os.path.join(tbl, "deletion_vector_*.bin"))
    assert len(bins) == 1
    # live adds now carry DV descriptors with exact cardinalities
    live, proto = _live_adds(tbl)
    dv_cards = sorted(
        a["deletionVector"]["cardinality"] for a in live if a.get("deletionVector")
    )
    assert sum(dv_cards) == 9
    # the commit upgraded the protocol to table features with DVs
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in set(proto["readerFeatures"])
    assert "deletionVectors" in set(proto["writerFeatures"])
    # time travel to the pre-delete snapshot still sees every row
    assert read_delta(spark, tbl, version=0).count() == 90


def test_dv_redelete_unions_with_existing_vector(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import delete_from_delta

    write_delta(_df(spark, 0, 100).coalesce(1), tbl)
    delete_from_delta(spark, tbl, "k % 10 = 5", mode="dv")
    v2 = delete_from_delta(spark, tbl, "k % 10 = 6", mode="dv")
    back = read_delta(spark, tbl)
    assert back.count() == 80
    assert back.filter("k % 10 IN (5, 6)").count() == 0
    # ONE live logical file per path, its DV the union of both deletes
    live, _ = _live_adds(tbl)
    assert sum(int(a["deletionVector"]["cardinality"]) for a in live
               if a.get("deletionVector")) == 20
    # the intermediate snapshot shows only the first delete
    assert read_delta(spark, tbl, version=1).count() == 90
    assert v2 == 2


def test_dv_update_writes_only_updated_rows(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import update_delta

    write_delta(_df(spark, 0, 90).coalesce(1), tbl, partition_by=["p"])
    data0 = set(glob.glob(os.path.join(tbl, "p=*", "*.parquet")))
    v = update_delta(spark, tbl, "k % 30 = 7", {"v": "-v"}, mode="dv")
    assert v == 1
    back = read_delta(spark, tbl)
    assert back.count() == 90
    got = {r["k"]: r["v"] for r in back.filter("k % 30 = 7").collect()}
    assert got == {k: -(k * 1.5) for k in (7, 37, 67)}
    # original files untouched; new files carry ONLY the 3 updated rows
    data1 = set(glob.glob(os.path.join(tbl, "p=*", "*.parquet")))
    assert data0 <= data1
    new_rows = 0
    for f in data1 - data0:
        import pyarrow.parquet as pq

        new_rows += pq.ParquetFile(f).metadata.num_rows
    assert new_rows == 3
    # unknown column still refused in dv mode
    with pytest.raises(ValueError, match="unknown column"):
        update_delta(spark, tbl, "k = 1", {"nope": "1"}, mode="dv")


def test_dv_full_file_delete_removes_file_outright(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import delete_from_delta

    write_delta(_df(spark, 0, 90), tbl, partition_by=["p"])
    delete_from_delta(spark, tbl, "p = '1'", mode="dv")
    back = read_delta(spark, tbl)
    assert back.count() == 60 and back.filter("p = '1'").count() == 0
    # the p=1 files left the live set entirely — no empty-bitmap adds
    live, _ = _live_adds(tbl)
    assert not any(a["path"].startswith("p=1/") for a in live)
    assert not any(a.get("deletionVector") for a in live)
    # and no sidecar was written (every affected file was fully deleted)
    assert glob.glob(os.path.join(tbl, "deletion_vector_*.bin")) == []


def test_dv_delete_above_gate_falls_back_to_cow(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import delete_from_delta

    write_delta(_df(spark, 0, 100), tbl)
    with pytest.warns(UserWarning, match="falling back to copy-on-write"):
        v = delete_from_delta(spark, tbl, "k < 50", mode="dv", dv_max_rows=10)
    assert v == 1
    back = read_delta(spark, tbl)
    assert back.count() == 50
    # CoW path: no DV sidecar, live adds carry no descriptors
    assert glob.glob(os.path.join(tbl, "deletion_vector_*.bin")) == []
    live, _ = _live_adds(tbl)
    assert not any(a.get("deletionVector") for a in live)


def test_dv_then_cow_delete_interoperates(spark, tbl):
    """A CoW rewrite of a DV'd file must remove the (path, dv) logical
    file — remove actions carry the descriptor."""
    from connected_data_lake_spark.sources.delta_write import delete_from_delta

    write_delta(_df(spark, 0, 100).coalesce(1), tbl)
    delete_from_delta(spark, tbl, "k % 10 = 5", mode="dv")
    delete_from_delta(spark, tbl, "k % 10 = 6")  # CoW on the DV'd file
    back = read_delta(spark, tbl)
    assert back.count() == 80
    assert back.filter("k % 10 IN (5, 6)").count() == 0
    live, _ = _live_adds(tbl)
    # the rewrite folded the DV in: fresh files, no descriptors
    assert not any(a.get("deletionVector") for a in live)


def test_optimize_folds_dvs_into_base_files(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import (
        compact_delta,
        delete_from_delta,
        vacuum_delta,
    )

    write_delta(_df(spark, 0, 100).coalesce(1), tbl)
    delete_from_delta(spark, tbl, "k % 4 = 1", mode="dv")
    v = compact_delta(spark, tbl)
    back = read_delta(spark, tbl)
    assert back.count() == 75 and back.filter("k % 4 = 1").count() == 0
    live, _ = _live_adds(tbl)
    assert not any(a.get("deletionVector") for a in live)
    # pre-OPTIMIZE snapshots still read (both DV'd and original)
    assert read_delta(spark, tbl, version=1).count() == 75
    assert read_delta(spark, tbl, version=0).count() == 100
    # vacuum now reclaims the stale sidecar but never a live one
    doomed = vacuum_delta(tbl, retention_ms=0)
    assert any(d.startswith("deletion_vector_") for d in doomed)
    assert read_delta(spark, tbl).count() == 75
    assert v == 2


def test_vacuum_keeps_live_dv_sidecars(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import (
        delete_from_delta,
        vacuum_delta,
    )

    write_delta(_df(spark, 0, 100), tbl)
    delete_from_delta(spark, tbl, "k % 10 = 5", mode="dv")
    doomed = vacuum_delta(tbl, retention_ms=0)
    assert not any(d.endswith(".bin") for d in doomed)
    assert read_delta(spark, tbl).count() == 90


def test_dv_append_only_table_refuses(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import delete_from_delta

    write_delta(
        _df(spark, 0, 10), tbl,
        configuration={"delta.appendOnly": "true"},
    )
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        delete_from_delta(spark, tbl, "k = 1", mode="dv")


def test_dv_unknown_mode_refused(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import (
        delete_from_delta,
        update_delta,
    )

    write_delta(_df(spark, 0, 10), tbl)
    with pytest.raises(ValueError, match="unknown DELETE mode"):
        delete_from_delta(spark, tbl, "k = 1", mode="nope")
    with pytest.raises(ValueError, match="unknown UPDATE mode"):
        update_delta(spark, tbl, "k = 1", {"v": "1"}, mode="nope")


# ---------------------------------------------------------------------------
# change feed: read_delta_changes
# ---------------------------------------------------------------------------


def _cdf_table(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import (
        compact_delta,
        delete_from_delta,
        update_delta,
    )

    write_delta(_df(spark, 0, 100).coalesce(1), tbl)          # v0
    delete_from_delta(spark, tbl, "k % 10 = 5", mode="dv")    # v1
    update_delta(spark, tbl, "k % 10 = 0", {"v": "-v"}, mode="dv")  # v2
    compact_delta(spark, tbl)                                 # v3 (no change)
    return tbl


def test_cdf_derives_inserts_and_dv_deletes(spark, tbl):
    from connected_data_lake_spark.sources.delta import read_delta_changes

    _cdf_table(spark, tbl)
    ch = read_delta_changes(spark, tbl, 0)
    agg = {
        (r["_change_type"], r["_commit_version"]): r["n"]
        for r in ch.groupBy("_change_type", "_commit_version")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert agg == {
        ("insert", 0): 100,
        ("delete", 1): 10,
        ("delete", 2): 10,
        ("insert", 2): 10,
    }
    # OPTIMIZE (v3, dataChange=false) contributed NO change rows
    assert not any(v == 3 for (_t, v) in agg)
    # delete rows carry the values AT delete time; v2 inserts the update
    del1 = ch.filter("_commit_version = 1 AND _change_type = 'delete'")
    assert del1.filter("k % 10 <> 5 OR v <> k * 1.5").count() == 0
    ins2 = ch.filter("_commit_version = 2 AND _change_type = 'insert'")
    assert ins2.filter("k % 10 <> 0 OR v <> -(k * 1.5)").count() == 0


def test_cdf_dv_update_emits_only_newly_masked_positions(spark, tbl):
    """The second DV commit's remove+add of the same path must diff the
    vectors — re-emitting the union would double-count v1's deletes."""
    from connected_data_lake_spark.sources.delta import read_delta_changes
    from connected_data_lake_spark.sources.delta_write import delete_from_delta

    write_delta(_df(spark, 0, 100).coalesce(1), tbl)
    delete_from_delta(spark, tbl, "k % 10 = 5", mode="dv")
    delete_from_delta(spark, tbl, "k % 10 = 6", mode="dv")
    ch2 = read_delta_changes(spark, tbl, 2, 2)
    assert ch2.count() == 10
    assert ch2.filter("k % 10 <> 6").count() == 0
    assert ch2.filter("_change_type <> 'delete'").count() == 0


def test_cdf_version_range_and_validation(spark, tbl):
    from connected_data_lake_spark.sources.delta import read_delta_changes

    _cdf_table(spark, tbl)
    assert read_delta_changes(spark, tbl, 1, 2).count() == 30
    assert read_delta_changes(spark, tbl, 3).count() == 0
    with pytest.raises(ValueError, match="bad change range"):
        read_delta_changes(spark, tbl, 2, 1)
    with pytest.raises(ValueError, match="> latest version"):
        read_delta_changes(spark, tbl, 0, 99)


def test_cdf_cow_delete_reads_exact_deletes_via_cdc(spark, tbl):
    """A copy-on-write DELETE on a CDF-enabled table reads back EXACTLY
    the deleted rows from its cdc files — the old file-action
    derivation re-emitted every surviving rewritten row as a
    delete+insert pair (100 deletes + 90 inserts for a 10-row delete),
    which net-cancelled but silently duplicated data in append-only
    sync consumers (ADVICE r13)."""
    from connected_data_lake_spark.sources.delta import read_delta_changes
    from connected_data_lake_spark.sources.delta_write import delete_from_delta

    write_delta(
        _df(spark, 0, 100).coalesce(1), tbl,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    delete_from_delta(spark, tbl, "k % 10 = 5")  # CoW: rewrite the file
    ch = read_delta_changes(spark, tbl, 1, 1)
    assert {r["_change_type"] for r in ch.collect()} == {"delete"}
    assert {r["k"] for r in ch.collect()} == set(range(5, 100, 10))


def test_cdf_missing_commit_json_refused(spark, tbl):
    from connected_data_lake_spark.sources.delta import read_delta_changes

    write_delta(_df(spark, 0, 20), tbl)
    write_delta(_df(spark, 20, 40), tbl, mode="append")
    checkpoint_delta(tbl)
    os.unlink(os.path.join(tbl, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(ValueError, match="log cleanup"):
        read_delta_changes(spark, tbl, 0)
    # ranges that avoid the hole still work
    assert read_delta_changes(spark, tbl, 1).count() == 20


# ---------------------------------------------------------------------------
# MERGE INTO, merge-on-read (mode="dv")
# ---------------------------------------------------------------------------


def test_dv_merge_upsert_masks_and_inserts_in_one_commit(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import merge_into_delta

    write_delta(_df(spark, 0, 100).coalesce(1), tbl)
    src = spark.range(90, 120).select(
        F.col("id").alias("k"),
        F.lit("9").alias("p"),
        F.lit(-1.0).alias("v"),
    )
    v = merge_into_delta(
        spark, tbl, src, on=["k"], when_matched_update={"v": "src.v"},
        mode="dv",
    )
    assert v == 1
    back = read_delta(spark, tbl)
    assert back.count() == 120
    assert back.filter("k >= 90").filter("v <> -1.0").count() == 0
    assert back.filter("k < 90").filter("v <> k * 1.5").count() == 0
    # the original base file never moved: its rows are DV-masked
    live, _ = _live_adds(tbl)
    assert any(a.get("deletionVector") for a in live)
    assert read_delta(spark, tbl, version=0).count() == 100


def test_dv_merge_matched_delete(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import merge_into_delta

    write_delta(_df(spark, 0, 100).coalesce(1), tbl)
    src = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit("0").alias("p"), F.lit(0.0).alias("v")
    )
    merge_into_delta(
        spark, tbl, src, on=["k"], when_matched_delete=True,
        when_not_matched_insert=False, mode="dv",
    )
    back = read_delta(spark, tbl)
    assert back.count() == 90 and back.filter("k < 10").count() == 0


def test_dv_merge_above_gate_falls_back_to_cow(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import merge_into_delta

    write_delta(_df(spark, 0, 100).coalesce(1), tbl)
    src = _df(spark, 0, 50).withColumn("v", F.lit(2.0))
    with pytest.warns(UserWarning, match="falling back to copy-on-write"):
        merge_into_delta(
            spark, tbl, src, on=["k"], when_matched_update={"v": "src.v"},
            mode="dv", dv_max_rows=10,
        )
    back = read_delta(spark, tbl)
    assert back.count() == 100
    assert back.filter("k < 50").filter("v <> 2.0").count() == 0
    live, _ = _live_adds(tbl)
    assert not any(a.get("deletionVector") for a in live)


def test_cow_merge_on_dv_table_carries_descriptors(spark, tbl):
    """A CoW MERGE over a DV'd table must anti-key the (path, dvId)
    logical file — dropping the descriptor would leave both the old
    DV'd file and its rewrite live (duplicate rows)."""
    from connected_data_lake_spark.sources.delta_write import (
        delete_from_delta,
        merge_into_delta,
    )

    write_delta(_df(spark, 0, 100).coalesce(1), tbl)
    delete_from_delta(spark, tbl, "k % 10 = 5", mode="dv")
    src = spark.range(0, 5).select(
        F.col("id").alias("k"), F.lit("0").alias("p"), F.lit(3.0).alias("v")
    )
    merge_into_delta(spark, tbl, src, on=["k"], when_matched_update={"v": "src.v"})
    back = read_delta(spark, tbl)
    assert back.count() == 90  # no duplication
    assert back.filter("k < 5").filter("v <> 3.0").count() == 0
    assert back.filter("k % 10 = 5").count() == 0


# ---------------------------------------------------------------------------
# stats-based file pruning (read_delta filters=) + OPTIMIZE ZORDER BY
# ---------------------------------------------------------------------------


def test_read_delta_filters_prune_files_by_stats(spark, tbl):
    # 10 coalesced appends → 10 files with disjoint k ranges in stats
    for lo in range(0, 100, 10):
        write_delta(
            _df(spark, lo, lo + 10).coalesce(1), tbl,
            mode="append" if lo else "error",
        )
    allf = read_delta(spark, tbl).inputFiles()
    assert len(allf) == 10
    pruned = read_delta(spark, tbl, filters=[("k", ">=", 80)])
    assert len(pruned.inputFiles()) == 2
    assert pruned.count() == 20
    # equality hits exactly one file; residual filter keeps semantics
    one = read_delta(spark, tbl, filters=[("k", "=", 55)])
    assert len(one.inputFiles()) == 1 and one.count() == 1
    # partition-column filters prune via partitionValues (no stats needed)


def test_read_delta_filters_keep_on_missing_or_mismatched_stats(spark, tbl):
    write_delta(_df(spark, 0, 50).coalesce(1), tbl)
    # strip the stats out of the add action: pruning must KEEP the file
    log = os.path.join(tbl, "_delta_log", f"{0:020d}.json")
    lines = []
    for line in open(log):
        a = json.loads(line)
        if "add" in a:
            a["add"].pop("stats", None)
        lines.append(json.dumps(a))
    os.unlink(log)
    with open(log, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    got = read_delta(spark, tbl, filters=[("k", ">=", 49)])
    assert len(got.inputFiles()) == 1
    assert got.count() == 1
    # type-mismatched literal keeps the file at the PRUNING layer (the
    # residual Spark filter owns the semantics — observable only on the
    # helper, since Catalyst folds the coerced-null predicate to empty)
    from connected_data_lake_spark.sources.delta import _keep_add_under_filters
    from pyspark.sql import types as T

    sch = T.StructType([T.StructField("k", T.LongType())])
    add = {"stats": json.dumps({"minValues": {"k": 0}, "maxValues": {"k": 49}})}
    assert _keep_add_under_filters(add, [("k", ">=", "zz")], sch, set())
    assert not _keep_add_under_filters(add, [("k", ">=", 50)], sch, set())
    assert _keep_add_under_filters({"stats": "not json"}, [("k", "=", 1)], sch, set())


def test_optimize_zorder_clusters_both_columns(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import compact_delta

    df = spark.range(0, 20_000).select(
        (F.col("id") % 131).alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
        ((F.col("id") * 7919) % 500).cast("double").alias("v"),
    )
    write_delta(df, tbl)
    compact_delta(spark, tbl, target_file_rows=2000, zorder_by=["k", "v"])
    n_all = len(read_delta(spark, tbl).inputFiles())
    assert n_all >= 8
    for col, val in (("k", 120), ("v", 450.0)):
        pr = read_delta(spark, tbl, filters=[(col, ">=", val)])
        assert len(pr.inputFiles()) < n_all * 0.6, col
        assert pr.count() == df.filter(f"{col} >= {val}").count()
    # the commit records the clustering
    commits = sorted(glob.glob(os.path.join(tbl, "_delta_log", "*.json")))
    info = [
        json.loads(l)["commitInfo"]
        for l in open(commits[-1])
        if '"commitInfo"' in l
    ][0]
    assert json.loads(info["operationParameters"]["zOrderBy"]) == ["k", "v"]


# ---------------------------------------------------------------------------
# DESCRIBE HISTORY + RESTORE
# ---------------------------------------------------------------------------


def test_history_and_restore_roundtrip(spark, tbl):
    from connected_data_lake_spark.sources.delta import delta_history
    from connected_data_lake_spark.sources.delta_write import (
        delete_from_delta,
        restore_delta,
        update_delta,
    )

    write_delta(_df(spark, 0, 100).coalesce(1), tbl)
    delete_from_delta(spark, tbl, "k % 10 = 5", mode="dv")   # v1
    update_delta(spark, tbl, "k % 10 = 0", {"v": "-v"})      # v2 (CoW)
    assert read_delta(spark, tbl).count() == 90
    v = restore_delta(spark, tbl, 0)                          # v3
    assert v == 3
    back = read_delta(spark, tbl)
    assert back.count() == 100
    assert back.filter("v < 0").count() == 0
    # restore of a DV'd intermediate state works too and is reversible
    restore_delta(spark, tbl, 1)
    assert read_delta(spark, tbl).count() == 90
    assert read_delta(spark, tbl).filter("v < 0").count() == 0
    ops = {
        r["version"]: r["operation"]
        for r in delta_history(tbl)
    }
    assert ops[1] == "DELETE" and ops[2] == "UPDATE"
    assert ops[3] == "RESTORE" and ops[4] == "RESTORE"
    # no-op restore (already at the target state) commits nothing
    latest = max(ops)
    assert restore_delta(spark, tbl, 1) == latest


def test_restore_refuses_schema_change(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import restore_delta

    write_delta(_df(spark, 0, 10), tbl)
    wider = _df(spark, 10, 20).withColumn("extra", F.lit(1))
    write_delta(wider, tbl, mode="append", schema_mode="merge")
    with pytest.raises(DeltaProtocolError, match="schema change"):
        restore_delta(spark, tbl, 0)


# ---------------------------------------------------------------------------
# CHECK constraints (legacy writer protocol 3)
# ---------------------------------------------------------------------------


def test_check_constraints_enforced_on_every_write_path(spark, tbl):
    from connected_data_lake_spark.sources.delta_write import (
        merge_into_delta,
        update_delta,
    )

    write_delta(
        _df(spark, 1, 50), tbl, mode="error",
        configuration={"delta.constraints.v_pos": "v > 0"},
    )
    proto = next(
        json.loads(l)["protocol"]
        for l in open(os.path.join(tbl, "_delta_log", f"{0:020d}.json"))
        if '"protocol"' in l
    )
    assert proto["minWriterVersion"] == 3  # CHECK constraints demand it
    write_delta(_df(spark, 50, 60), tbl, mode="append")  # valid rows pass
    assert read_delta(spark, tbl).count() == 59
    bad = _df(spark, 60, 65).withColumn("v", F.lit(-1.0))
    with pytest.raises(ValueError, match="CHECK constraint 'v_pos'"):
        write_delta(bad, tbl, mode="append")
    with pytest.raises(ValueError, match="CHECK constraint 'v_pos'"):
        update_delta(spark, tbl, "k = 1", {"v": "-5"})
    with pytest.raises(ValueError, match="CHECK constraint 'v_pos'"):
        update_delta(spark, tbl, "k = 1", {"v": "-5"}, mode="dv")
    src = spark.range(1, 3).select(
        F.col("id").alias("k"), F.lit("0").alias("p"), F.lit(-9.0).alias("v")
    )
    with pytest.raises(ValueError, match="CHECK constraint 'v_pos'"):
        merge_into_delta(
            spark, tbl, src, on=["k"], when_matched_update={"v": "src.v"}
        )
    # nothing committed by the refused writes
    assert read_delta(spark, tbl).count() == 59
    # null constraint results are VIOLATIONS (delta-spark semantics)
    nully = _df(spark, 70, 72).withColumn("v", F.lit(None).cast("double"))
    with pytest.raises(ValueError, match="CHECK constraint"):
        write_delta(nully, tbl, mode="append")


def test_external_writer3_constraint_table_now_writable(spark, tbl):
    """A table an external engine created at minWriterVersion 3 with a
    recorded constraint used to gate loudly; now it writes WITH
    enforcement."""
    write_delta(_df(spark, 1, 20), tbl)
    # out-of-band upgrade: protocol 3 + a constraint in configuration
    meta = next(
        json.loads(l)["metaData"]
        for l in open(os.path.join(tbl, "_delta_log", f"{0:020d}.json"))
        if '"metaData"' in l
    )
    meta["configuration"] = {"delta.constraints.k_range": "k < 1000"}
    with open(os.path.join(tbl, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 3}}
            )
            + "\n"
            + json.dumps({"metaData": meta})
            + "\n"
        )
    write_delta(_df(spark, 20, 30), tbl, mode="append")
    assert read_delta(spark, tbl).count() == 29
    with pytest.raises(ValueError, match="CHECK constraint 'k_range'"):
        write_delta(_df(spark, 5000, 5005), tbl, mode="append")
    # versions 4-6 still gate
    with open(os.path.join(tbl, "_delta_log", f"{3:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}}
            )
            + "\n"
        )
    with pytest.raises(DeltaProtocolError, match="minWriterVersion=4"):
        write_delta(_df(spark, 30, 40), tbl, mode="append")


def test_dv_protocol_upgrade_keeps_legacy_implied_features():
    """ADVICE r13: upgrading a legacy protocol to table features must
    carry EVERY feature the legacy writer version implied (PROTOCOL.md
    legacy mapping) — dropping checkConstraints from a (1,3) table
    would free external writers from enforcing delta.constraints.*."""
    from connected_data_lake_spark.sources.delta_write import (
        _dv_protocol_upgrade,
    )

    up = _dv_protocol_upgrade({"minReaderVersion": 1, "minWriterVersion": 3})
    w = set(up["protocol"]["writerFeatures"])
    assert {"appendOnly", "invariants", "checkConstraints", "deletionVectors"} <= w
    assert "changeDataFeed" not in w  # implied only at minWriterVersion>=4
    up4 = _dv_protocol_upgrade({"minReaderVersion": 2, "minWriterVersion": 5})
    w4 = set(up4["protocol"]["writerFeatures"])
    assert {"changeDataFeed", "generatedColumns", "columnMapping"} <= w4
    assert "columnMapping" in set(up4["protocol"]["readerFeatures"])
    # already-featured protocols pass through untouched
    assert (
        _dv_protocol_upgrade(
            {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        )
        is None
    )


# ---------------------------------------------------------------------------
# change data feed: DML on delta.enableChangeDataFeed tables writes
# _change_data/ cdc files; read_delta_changes consumes them exclusively
# ---------------------------------------------------------------------------

_CDF_CONF = {"delta.enableChangeDataFeed": "true"}


def _cdf_tbl(spark, tmp_path, n=100, parts=None):
    from connected_data_lake_spark.sources.delta_write import write_delta

    tbl = str(tmp_path / "cdf")
    df = spark.range(0, n).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p", "id * 1.5 AS v"
    )
    write_delta(df, tbl, mode="error", partition_by=parts, configuration=_CDF_CONF)
    return tbl


def test_cdf_create_declares_changedatafeed_feature(spark, tmp_path):
    tbl = _cdf_tbl(spark, tmp_path)
    with open(os.path.join(tbl, "_delta_log", f"{0:020d}.json")) as fh:
        proto = next(
            json.loads(l)["protocol"] for l in fh if '"protocol"' in l
        )
    assert proto["minWriterVersion"] == 7
    assert "changeDataFeed" in proto["writerFeatures"]
    assert "readerFeatures" not in proto  # writer-side feature only


def test_cow_update_writes_cdc_and_reads_exact_pre_post(spark, tmp_path):
    import glob as _glob

    from connected_data_lake_spark.sources.delta import read_delta_changes
    from connected_data_lake_spark.sources.delta_write import update_delta

    tbl = _cdf_tbl(spark, tmp_path, parts=["p"])
    update_delta(spark, tbl, "k % 10 = 3", {"v": "v + 1000"})
    cdc_files = _glob.glob(os.path.join(tbl, "_change_data", "**", "*.parquet"),
                           recursive=True)
    assert cdc_files, "cdc parquet files written under _change_data/"
    ch = read_delta_changes(spark, tbl, 1, 1)
    got = {
        (r["_change_type"], r["k"], r["v"]) for r in ch.collect()
    }
    want = set()
    for k in range(3, 100, 10):
        want.add(("update_preimage", k, k * 1.5))
        want.add(("update_postimage", k, k * 1.5 + 1000))
    assert got == want
    # partition column restored from the cdc action's partitionValues
    assert {r["p"] for r in ch.collect()} == {"0", "1", "2"} & {
        str(k % 3) for k in range(3, 100, 10)
    }


def test_dv_delete_writes_cdc_rows(spark, tmp_path):
    from connected_data_lake_spark.sources.delta import read_delta_changes
    from connected_data_lake_spark.sources.delta_write import delete_from_delta

    tbl = _cdf_tbl(spark, tmp_path)
    delete_from_delta(spark, tbl, "k % 10 = 7", mode="dv")
    ch = read_delta_changes(spark, tbl, 1, 1)
    assert {r["_change_type"] for r in ch.collect()} == {"delete"}
    assert {r["k"] for r in ch.collect()} == set(range(7, 100, 10))


def test_merge_cdc_covers_all_change_kinds(spark, tmp_path):
    from connected_data_lake_spark.sources.delta import read_delta_changes
    from connected_data_lake_spark.sources.delta_write import merge_into_delta

    tbl = _cdf_tbl(spark, tmp_path, n=50)
    src = spark.range(40, 60).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p", "id * 100.0 AS v"
    )
    merge_into_delta(
        spark, tbl, src, on=["k"], when_matched_update={"v": "src.v"}
    )
    ch = read_delta_changes(spark, tbl, 1, 1)
    by_kind = {}
    for r in ch.collect():
        by_kind.setdefault(r["_change_type"], set()).add(r["k"])
    assert by_kind["update_preimage"] == set(range(40, 50))
    assert by_kind["update_postimage"] == set(range(40, 50))
    assert by_kind["insert"] == set(range(50, 60))


def test_cow_dml_without_cdf_gates_cdf_read(spark, tmp_path):
    from connected_data_lake_spark.sources.delta import (
        DeltaProtocolError,
        read_delta_changes,
    )
    from connected_data_lake_spark.sources.delta_write import (
        delete_from_delta,
        write_delta,
    )

    tbl = str(tmp_path / "plain")
    write_delta(_df(spark, 0, 100).coalesce(1), tbl, mode="error")
    delete_from_delta(spark, tbl, "k % 10 = 3")  # CoW: mixed add+remove
    with pytest.raises(DeltaProtocolError, match="without cdc actions"):
        read_delta_changes(spark, tbl, 1, 1).collect()
