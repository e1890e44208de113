"""Hudi MERGE_ON_READ read path (sources/hudi.py::read_hudi_mor):
HoodieLogFormat codec + per-file-group merge semantics.

Fixture tables are hand-built per hudi.apache.org/tech-specs ("Log File
Format", "Timeline"): framed log blocks with big-endian java metadata
maps and raw-Avro record payloads, deltacommit timeline instants, and
`_hoodie_is_deleted` row-level deletes."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from connected_data_lake_spark.sources.hudi import (
    HudiProtocolError,
    _BLK_COMMAND,
    _BLK_CORRUPT,
    _HDR_INSTANT,
    _HDR_TARGET_INSTANT,
    encode_avro_data_block,
    read_hudi,
    read_hudi_mor,
    read_log_blocks,
    write_log_blocks,
)

T1, T2, T3 = "20260101000000000", "20260102000000000", "20260103000000000"

AVRO_SCHEMA = {
    "type": "record",
    "name": "mor_rows",
    "fields": [
        {"name": "_hoodie_record_key", "type": "string"},
        {"name": "k", "type": ["null", "long"], "default": None},
        {"name": "v", "type": ["null", "double"], "default": None},
        {"name": "_hoodie_is_deleted", "type": "boolean", "default": False},
    ],
}


def _rec(k: int, v: float, deleted: bool = False) -> dict:
    return {
        "_hoodie_record_key": str(k),
        "k": k,
        "v": v,
        "_hoodie_is_deleted": deleted,
    }


def _mk_table(spark, root: str, log_blocks_by_instant: dict[str, list[dict]]):
    """Base file (k=0..9, v=k) at T1 + one log file per deltacommit."""
    import glob
    import shutil

    os.makedirs(os.path.join(root, ".hoodie"))
    base = spark.range(0, 10).select(
        F.col("id").cast("string").alias("_hoodie_record_key"),
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    stage = os.path.join(root, ".stage")
    base.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    base_rel = f"f1_0-1-0_{T1}.parquet"
    os.replace(part, os.path.join(root, base_rel))
    shutil.rmtree(stage, ignore_errors=True)

    def commit(instant: str, action: str, rel: str) -> None:
        meta = {"partitionToWriteStats": {"": [{"fileId": "f1", "path": rel}]}}
        with open(os.path.join(root, ".hoodie", f"{instant}.{action}"), "w") as fh:
            json.dump(meta, fh)

    commit(T1, "commit", base_rel)
    for i, (instant, blocks) in enumerate(sorted(log_blocks_by_instant.items())):
        log_rel = f".f1_{T1}.log.{i + 1}_0-1-0"
        with open(os.path.join(root, log_rel), "wb") as fh:
            fh.write(write_log_blocks(blocks))
        commit(instant, "deltacommit", log_rel)
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write(
            "hoodie.table.name=t\nhoodie.table.type=MERGE_ON_READ\n"
        )
    return root


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "mor")


def test_log_block_codec_roundtrip():
    blocks = [
        encode_avro_data_block([_rec(1, 10.0), _rec(2, 20.0)], AVRO_SCHEMA, T2),
        {"type": _BLK_COMMAND, "header": {_HDR_TARGET_INSTANT: T2}, "content": b""},
    ]
    back = read_log_blocks(write_log_blocks(blocks))
    assert [b["type"] for b in back] == [3, 0]
    assert back[0]["header"][_HDR_INSTANT] == T2
    assert back[1]["header"][_HDR_TARGET_INSTANT] == T2


def test_log_block_codec_refuses_bad_framing():
    good = write_log_blocks([encode_avro_data_block([_rec(1, 1.0)], AVRO_SCHEMA, T2)])
    with pytest.raises(HudiProtocolError, match="magic"):
        read_log_blocks(b"NOPE!!" + good[6:])
    # corrupt the trailing total-length field
    bad = good[:-8] + b"\x00\x00\x00\x00\x00\x00\x00\x01"
    with pytest.raises(HudiProtocolError, match="total block length"):
        read_log_blocks(bad)


def test_mor_merge_upsert_and_delete(spark, tbl):
    _mk_table(
        spark,
        tbl,
        {
            T2: [
                encode_avro_data_block(
                    [_rec(3, 333.0), _rec(7, 777.0), _rec(5, 5.0, deleted=True)],
                    AVRO_SCHEMA,
                    T2,
                )
            ]
        },
    )
    rows = {r["k"]: r["v"] for r in read_hudi_mor(spark, tbl).collect()}
    assert rows[3] == 333.0 and rows[7] == 777.0  # log wins over base
    assert 5 not in rows  # _hoodie_is_deleted
    assert rows[0] == 0.0 and len(rows) == 9


def test_mor_newest_write_wins_across_deltacommits(spark, tbl):
    _mk_table(
        spark,
        tbl,
        {
            T2: [encode_avro_data_block([_rec(1, 111.0)], AVRO_SCHEMA, T2)],
            T3: [
                encode_avro_data_block([_rec(1, 999.0)], AVRO_SCHEMA, T3),
                # re-insert a key the same file deleted earlier? later
                # block in the SAME file also wins over its predecessor
                encode_avro_data_block([_rec(2, 222.0)], AVRO_SCHEMA, T3),
            ],
        },
    )
    rows = {r["k"]: r["v"] for r in read_hudi_mor(spark, tbl).collect()}
    assert rows[1] == 999.0 and rows[2] == 222.0


def test_mor_time_travel_excludes_later_deltacommits(spark, tbl):
    _mk_table(
        spark,
        tbl,
        {T2: [encode_avro_data_block([_rec(1, 111.0)], AVRO_SCHEMA, T2)]},
    )
    rows = {r["k"]: r["v"] for r in read_hudi_mor(spark, tbl, as_of_instant=T1).collect()}
    assert rows[1] == 1.0 and len(rows) == 10


def test_mor_rollback_command_block(spark, tbl):
    _mk_table(
        spark,
        tbl,
        {
            T2: [encode_avro_data_block([_rec(1, 111.0)], AVRO_SCHEMA, T2)],
            T3: [
                # rollback of T2's blocks, then a fresh write at T3
                {
                    "type": _BLK_COMMAND,
                    "header": {_HDR_TARGET_INSTANT: T2},
                    "content": b"",
                },
                encode_avro_data_block([_rec(2, 222.0)], AVRO_SCHEMA, T3),
            ],
        },
    )
    rows = {r["k"]: r["v"] for r in read_hudi_mor(spark, tbl).collect()}
    assert rows[1] == 1.0  # T2's upsert rolled back → base value
    assert rows[2] == 222.0


def test_mor_corrupt_block_skipped(spark, tbl):
    _mk_table(
        spark,
        tbl,
        {
            T2: [
                {"type": _BLK_CORRUPT, "header": {}, "content": b"\xde\xad"},
                encode_avro_data_block([_rec(1, 111.0)], AVRO_SCHEMA, T2),
            ]
        },
    )
    rows = {r["k"]: r["v"] for r in read_hudi_mor(spark, tbl).collect()}
    assert rows[1] == 111.0


def test_mor_unsupported_block_type_gate(spark, tbl):
    _mk_table(
        spark,
        tbl,
        {T2: [{"type": 4, "header": {}, "content": b""}]},  # HFILE
    )
    with pytest.raises(Exception, match="block type ordinal 4"):
        read_hudi_mor(spark, tbl).collect()


def test_cow_reader_points_mor_tables_at_mor_reader(spark, tbl):
    _mk_table(spark, tbl, {})
    with pytest.raises(HudiProtocolError, match="read_hudi_mor"):
        read_hudi(spark, tbl)


def test_mor_reader_refuses_cow_table(spark, tmp_path):
    root = str(tmp_path / "cow")
    os.makedirs(os.path.join(root, ".hoodie"))
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write("hoodie.table.type=COPY_ON_WRITE\n")
    with pytest.raises(ValueError, match="read_hudi_mor is for MERGE_ON_READ"):
        read_hudi_mor(spark, root)


def test_mor_plan_one_shuffle_no_cartesian(spark, tbl):
    _mk_table(
        spark,
        tbl,
        {T2: [encode_avro_data_block([_rec(1, 111.0)], AVRO_SCHEMA, T2)]},
    )
    plan = (
        read_hudi_mor(spark, tbl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the merge is the single record-key exchange (plus the tiny slice-list
    # repartition feeding mapInPandas)
    assert plan.count("Exchange hashpartitioning(_hoodie_record_key") == 1


def test_mor_partitioned_file_groups(spark, tmp_path):
    """Two partitions, two file groups: log records apply only to their
    own slice; the merge never leaks across partitions."""
    import glob
    import shutil

    root = str(tmp_path / "mor_part")
    os.makedirs(os.path.join(root, ".hoodie"))

    def base_slice(part: str, fid: str, lo: int, hi: int) -> str:
        df = spark.range(lo, hi).select(
            F.col("id").cast("string").alias("_hoodie_record_key"),
            F.col("id").alias("k"),
            F.col("id").cast("double").alias("v"),
        )
        os.makedirs(os.path.join(root, part), exist_ok=True)
        stage = os.path.join(root, f".stage-{fid}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        partfile = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        rel = f"{part}/{fid}_0-1-0_{T1}.parquet"
        os.replace(partfile, os.path.join(root, rel))
        shutil.rmtree(stage, ignore_errors=True)
        return rel

    r1 = base_slice("d=a", "f1", 0, 10)
    r2 = base_slice("d=b", "f2", 10, 20)
    log_rel = f"d=a/.f1_{T1}.log.1_0-1-0"
    with open(os.path.join(root, log_rel), "wb") as fh:
        fh.write(
            write_log_blocks(
                [encode_avro_data_block([_rec(3, 333.0)], AVRO_SCHEMA, T2)]
            )
        )
    with open(os.path.join(root, ".hoodie", f"{T1}.commit"), "w") as fh:
        json.dump(
            {
                "partitionToWriteStats": {
                    "d=a": [{"fileId": "f1", "path": r1}],
                    "d=b": [{"fileId": "f2", "path": r2}],
                }
            },
            fh,
        )
    with open(os.path.join(root, ".hoodie", f"{T2}.deltacommit"), "w") as fh:
        json.dump(
            {"partitionToWriteStats": {"d=a": [{"fileId": "f1", "path": log_rel}]}},
            fh,
        )
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write("hoodie.table.type=MERGE_ON_READ\n")
    rows = {r["k"]: r["v"] for r in read_hudi_mor(spark, root).collect()}
    assert len(rows) == 20
    assert rows[3] == 333.0  # partition a's log applied
    assert rows[13] == 13.0  # partition b untouched


def test_compact_mor_folds_logs_into_new_base(spark, tmp_path):
    from connected_data_lake_spark.sources.hudi import compact_hudi_mor

    root = str(tmp_path / "mor_c")
    _mk_table(
        spark,
        root,
        {
            T2: [
                encode_avro_data_block(
                    [_rec(3, 333.0), _rec(5, 5.0, deleted=True)],
                    AVRO_SCHEMA,
                    T2,
                )
            ]
        },
    )
    # the MoR key field must be declared for compaction to restore keys
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "a") as fh:
        fh.write("hoodie.table.recordkey.fields=k\n")
    before = {r["k"]: r["v"] for r in read_hudi_mor(spark, root).collect()}
    instant = compact_hudi_mor(spark, root)
    after = {r["k"]: r["v"] for r in read_hudi_mor(spark, root).collect()}
    assert after == before  # same merged snapshot
    assert after[3] == 333.0 and 5 not in after
    # the compacted read touches ZERO log files: all inputs are the new base
    files = read_hudi_mor(spark, root).inputFiles()
    assert files and all(f"_{instant}.parquet" in f for f in files)
    # pre-compaction snapshot still resolves
    assert len(read_hudi_mor(spark, root, as_of_instant=T2).collect()) == 9


# ---------------------------------------------------------------------------
# MoR WRITE path: upsert_hudi_mor / delete_from_hudi_mor (log-block DML)
# ---------------------------------------------------------------------------


def _mor_table(spark, tmp_path, n=120):
    from connected_data_lake_spark.sources.hudi import write_hudi

    p = str(tmp_path / "mor_w")
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
    )
    write_hudi(
        df.coalesce(1), p, record_key="k", table_type="MERGE_ON_READ"
    )
    return p


def test_mor_upsert_appends_log_blocks_not_rewrites(spark, tmp_path):
    import glob

    from connected_data_lake_spark.sources.hudi import upsert_hudi_mor

    p = _mor_table(spark, tmp_path)
    bases0 = sorted(glob.glob(os.path.join(p, "*.parquet")))
    mtimes0 = {f: os.path.getmtime(f) for f in bases0}
    upd = spark.range(0, 30).select(
        F.col("id").alias("k"), (-F.col("id") * 1.5).alias("v")
    )
    instant = upsert_hudi_mor(spark, p, upd, record_key="k")
    got = read_hudi_mor(spark, p)
    assert got.count() == 120
    assert got.filter("k < 30").filter("v <> -(k * 1.5)").count() == 0
    assert got.filter("k >= 30").filter("v <> k * 1.5").count() == 0
    # base files untouched; the update is one hidden .log file
    assert {f: os.path.getmtime(f) for f in bases0} == mtimes0
    logs = [
        name for name in os.listdir(p) if ".log." in name and name.startswith(".")
    ]
    assert len(logs) == 1
    # the deltacommit instant records the log path in its write stats
    meta = json.load(open(os.path.join(p, ".hoodie", f"{instant}.deltacommit")))
    stat_paths = [
        st["path"]
        for sts in meta["partitionToWriteStats"].values()
        for st in sts
    ]
    assert stat_paths == logs


def test_mor_upsert_routes_inserts_to_new_base_group(spark, tmp_path):
    from connected_data_lake_spark.sources.hudi import upsert_hudi_mor

    p = _mor_table(spark, tmp_path)
    mix = spark.range(100, 140).select(
        F.col("id").alias("k"), F.lit(0.5).alias("v")
    )  # 100-119 update, 120-139 insert
    upsert_hudi_mor(spark, p, mix, record_key="k")
    got = read_hudi_mor(spark, p)
    assert got.count() == 140
    assert got.filter("k >= 100").filter("v <> 0.5").count() == 0


def test_mor_delete_soft_deletes_and_reinserts_win(spark, tmp_path):
    from connected_data_lake_spark.sources.hudi import (
        delete_from_hudi_mor,
        upsert_hudi_mor,
    )

    p = _mor_table(spark, tmp_path)
    i1 = delete_from_hudi_mor(spark, p, "k % 10 = 7")
    got = read_hudi_mor(spark, p)
    assert got.count() == 108
    assert got.filter("k % 10 = 7").count() == 0
    # pre-delete instant still reads in full
    assert read_hudi_mor(spark, p, as_of_instant=str(int(i1) - 1)).count() == 120
    # a later upsert of a deleted key resurrects it (newest write wins)
    back = spark.range(7, 8).select(
        F.col("id").alias("k"), F.lit(99.0).alias("v")
    )
    upsert_hudi_mor(spark, p, back, record_key="k")
    got2 = read_hudi_mor(spark, p)
    assert got2.count() == 109
    assert got2.filter("k = 7").first()["v"] == 99.0


def test_mor_delete_no_match_commits_nothing(spark, tmp_path):
    from connected_data_lake_spark.sources.hudi import delete_from_hudi_mor

    p = _mor_table(spark, tmp_path)
    before = sorted(os.listdir(os.path.join(p, ".hoodie")))
    delete_from_hudi_mor(spark, p, "k > 9999")
    assert sorted(os.listdir(os.path.join(p, ".hoodie"))) == before
    assert read_hudi_mor(spark, p).count() == 120


def test_mor_compaction_folds_log_dml(spark, tmp_path):
    from connected_data_lake_spark.sources.hudi import (
        compact_hudi_mor,
        delete_from_hudi_mor,
        upsert_hudi_mor,
    )

    p = _mor_table(spark, tmp_path)
    upsert_hudi_mor(
        spark,
        p,
        spark.range(0, 10).select(F.col("id").alias("k"), F.lit(-1.0).alias("v")),
        record_key="k",
    )
    delete_from_hudi_mor(spark, p, "k % 4 = 3")
    compact_hudi_mor(spark, p)
    got = read_hudi_mor(spark, p)
    assert got.count() == 90
    assert got.filter("k % 4 = 3").count() == 0
    assert got.filter("k < 10").filter("v <> -1.0").count() == 0


def test_mor_upsert_on_cow_table_refused(spark, tmp_path):
    from connected_data_lake_spark.sources.hudi import (
        upsert_hudi_mor,
        write_hudi,
    )

    p = str(tmp_path / "cow")
    df = spark.range(0, 10).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    write_hudi(df, p, record_key="k")  # COPY_ON_WRITE default
    with pytest.raises(HudiProtocolError, match="MERGE_ON_READ"):
        upsert_hudi_mor(spark, p, df, record_key="k")
    # and the reverse: COW upsert path refuses MERGE_ON_READ tables
    p2 = _mor_table(spark, tmp_path)
    with pytest.raises(HudiProtocolError, match="upsert_hudi_mor"):
        write_hudi(df, p2, record_key="k", mode="upsert",
                   table_type="MERGE_ON_READ")


def test_mor_unencodable_column_type_gates(spark, tmp_path):
    from connected_data_lake_spark.sources.hudi import (
        upsert_hudi_mor,
        write_hudi,
    )

    p = str(tmp_path / "mor_date")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"),
        F.lit(1.5).alias("v"),
        F.current_date().alias("d"),
    )
    write_hudi(df.coalesce(1), p, record_key="k", table_type="MERGE_ON_READ")
    with pytest.raises(HudiProtocolError, match="not encodable"):
        upsert_hudi_mor(spark, p, df, record_key="k")


def test_mor_dml_schema_mismatch_refused(spark, tmp_path):
    from connected_data_lake_spark.sources.hudi import upsert_hudi_mor

    p = _mor_table(spark, tmp_path)
    narrower = spark.range(0, 3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="table data columns"):
        upsert_hudi_mor(spark, p, narrower, record_key="k")


# ---------------------------------------------------------------------------
# LOGS-ONLY file groups (r14: schema from the block's embedded Avro schema)
# ---------------------------------------------------------------------------


def _mk_logsonly_table(spark, root: str, logs_by_instant: dict[str, list[dict]]):
    """MoR table with ONE file group that has NO base parquet: each
    deltacommit commits one log file named against base-instant T1."""
    os.makedirs(os.path.join(root, ".hoodie"))
    for i, (instant, blocks) in enumerate(sorted(logs_by_instant.items())):
        log_rel = f".f9_{T1}.log.{i + 1}_0-1-0"
        with open(os.path.join(root, log_rel), "wb") as fh:
            fh.write(write_log_blocks(blocks))
        meta = {"partitionToWriteStats": {"": [{"fileId": "f9", "path": log_rel}]}}
        with open(
            os.path.join(root, ".hoodie", f"{instant}.deltacommit"), "w"
        ) as fh:
            json.dump(meta, fh)
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write("hoodie.table.name=t\nhoodie.table.type=MERGE_ON_READ\n")
    return root


def test_logsonly_insert_upsert_delete(spark, tmp_path):
    root = _mk_logsonly_table(
        spark,
        str(tmp_path / "lo"),
        {
            T1: [
                encode_avro_data_block(
                    [_rec(1, 1.0), _rec(2, 2.0), _rec(3, 3.0)], AVRO_SCHEMA, T1
                )
            ],
            T2: [
                encode_avro_data_block(
                    [_rec(2, 20.0), _rec(3, 3.0, deleted=True)], AVRO_SCHEMA, T2
                )
            ],
        },
    )
    df = read_hudi_mor(spark, root)
    # schema inferred from the embedded Avro writer schema: long + double
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint",
        "double",
    ]
    got = {r["k"]: r["v"] for r in df.collect()}
    assert got == {1: 1.0, 2: 20.0}


def test_logsonly_time_travel_sees_inserts_only(spark, tmp_path):
    root = _mk_logsonly_table(
        spark,
        str(tmp_path / "lo_tt"),
        {
            T1: [encode_avro_data_block([_rec(1, 1.0)], AVRO_SCHEMA, T1)],
            T2: [
                encode_avro_data_block(
                    [_rec(1, 9.0), _rec(4, 4.0)], AVRO_SCHEMA, T2
                )
            ],
        },
    )
    got = {
        r["k"]: r["v"]
        for r in read_hudi_mor(spark, root, as_of_instant=T1).collect()
    }
    assert got == {1: 1.0}


def test_logsonly_group_merges_beside_based_group(spark, tmp_path):
    """A MIXED table: one normal base+log file group plus one logs-only
    group — both must appear in the snapshot, merged independently."""
    root = str(tmp_path / "mixed")
    _mk_table(
        spark,
        root,
        {T2: [encode_avro_data_block([_rec(0, 100.0)], AVRO_SCHEMA, T2)]},
    )
    log_rel = f".f9_{T1}.log.1_0-1-0"
    with open(os.path.join(root, log_rel), "wb") as fh:
        fh.write(
            write_log_blocks(
                [encode_avro_data_block([_rec(77, 7.5)], AVRO_SCHEMA, T3)]
            )
        )
    meta = {"partitionToWriteStats": {"": [{"fileId": "f9", "path": log_rel}]}}
    with open(os.path.join(root, ".hoodie", f"{T3}.deltacommit"), "w") as fh:
        json.dump(meta, fh)
    got = {r["k"]: r["v"] for r in read_hudi_mor(spark, root).collect()}
    assert got[0] == 100.0  # log upsert over the base group
    assert got[77] == 7.5  # logs-only group's insert
    assert len(got) == 11  # 10 base rows + 1 logs-only row


def test_logsonly_schema_skips_rolled_back_first_block(spark, tmp_path):
    """The schema block must be the first LIVE block: a rollback command
    targeting T1 removes the first data block, so the schema comes from
    the T2 block, and T1's records must not resurface."""
    narrow_schema = {
        "type": "record",
        "name": "narrow",
        "fields": [
            {"name": "_hoodie_record_key", "type": "string"},
            {"name": "k", "type": ["null", "long"], "default": None},
            {"name": "v", "type": ["null", "double"], "default": None},
            {"name": "_hoodie_is_deleted", "type": "boolean", "default": False},
        ],
    }
    root = _mk_logsonly_table(
        spark,
        str(tmp_path / "lo_rb"),
        {
            T1: [encode_avro_data_block([_rec(1, 1.0)], narrow_schema, T1)],
            T2: [
                {
                    "type": _BLK_COMMAND,
                    "header": {_HDR_INSTANT: T2, _HDR_TARGET_INSTANT: T1},
                    "content": b"",
                },
                encode_avro_data_block([_rec(5, 5.0)], AVRO_SCHEMA, T2),
            ],
        },
    )
    got = {r["k"]: r["v"] for r in read_hudi_mor(spark, root).collect()}
    assert got == {5: 5.0}


def test_logsonly_no_live_block_gates(spark, tmp_path):
    root = _mk_logsonly_table(
        spark,
        str(tmp_path / "lo_none"),
        {
            T1: [encode_avro_data_block([_rec(1, 1.0)], AVRO_SCHEMA, T1)],
            T2: [
                {
                    "type": _BLK_COMMAND,
                    "header": {_HDR_INSTANT: T2, _HDR_TARGET_INSTANT: T1},
                    "content": b"",
                }
            ],
        },
    )
    with pytest.raises(HudiProtocolError, match="no live data block"):
        read_hudi_mor(spark, root)


def test_logsonly_complex_avro_type_gates(spark, tmp_path):
    arr_schema = {
        "type": "record",
        "name": "cplx",
        "fields": [
            {"name": "_hoodie_record_key", "type": "string"},
            {
                "name": "tags",
                "type": {"type": "array", "items": "string"},
            },
            {"name": "_hoodie_is_deleted", "type": "boolean", "default": False},
        ],
    }
    root = _mk_logsonly_table(
        spark,
        str(tmp_path / "lo_cplx"),
        {
            T1: [
                encode_avro_data_block(
                    [
                        {
                            "_hoodie_record_key": "1",
                            "tags": ["a"],
                            "_hoodie_is_deleted": False,
                        }
                    ],
                    arr_schema,
                    T1,
                )
            ]
        },
    )
    with pytest.raises(HudiProtocolError, match="unsupported Avro field type"):
        read_hudi_mor(spark, root)


# ---------------------------------------------------------------------------
# VIRTUAL-KEY tables (r14: hoodie.populate.meta.fields=false)
# ---------------------------------------------------------------------------

VK_SCHEMA = {
    "type": "record",
    "name": "vk_rows",
    "fields": [
        {"name": "k", "type": ["null", "long"], "default": None},
        {"name": "v", "type": ["null", "double"], "default": None},
        {"name": "_hoodie_is_deleted", "type": "boolean", "default": False},
    ],
}


def _vk_rec(k: int, v: float, deleted: bool = False) -> dict:
    return {"k": k, "v": v, "_hoodie_is_deleted": deleted}


def _mk_vk_table(spark, root: str, blocks_by_instant, rk="k", extra_props=""):
    """MoR table WITHOUT meta columns: base parquet (k=0..9, v=k), key
    derived from hoodie.table.recordkey.fields."""
    import glob
    import shutil

    os.makedirs(os.path.join(root, ".hoodie"))
    base = spark.range(0, 10).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    stage = os.path.join(root, ".stage")
    base.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    base_rel = f"f1_0-1-0_{T1}.parquet"
    os.replace(part, os.path.join(root, base_rel))
    shutil.rmtree(stage, ignore_errors=True)

    def commit(instant, action, rel):
        meta = {"partitionToWriteStats": {"": [{"fileId": "f1", "path": rel}]}}
        with open(os.path.join(root, ".hoodie", f"{instant}.{action}"), "w") as fh:
            json.dump(meta, fh)

    commit(T1, "commit", base_rel)
    for i, (instant, blocks) in enumerate(sorted(blocks_by_instant.items())):
        log_rel = f".f1_{T1}.log.{i + 1}_0-1-0"
        with open(os.path.join(root, log_rel), "wb") as fh:
            fh.write(write_log_blocks(blocks))
        commit(instant, "deltacommit", log_rel)
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write(
            "hoodie.table.name=t\nhoodie.table.type=MERGE_ON_READ\n"
            f"hoodie.table.recordkey.fields={rk}\n" + extra_props
        )
    return root


def test_virtual_key_merge_upsert_and_delete(spark, tmp_path):
    root = _mk_vk_table(
        spark,
        str(tmp_path / "vk"),
        {
            T2: [
                encode_avro_data_block(
                    [_vk_rec(3, 30.0), _vk_rec(7, 7.0, deleted=True)],
                    VK_SCHEMA,
                    T2,
                )
            ]
        },
    )
    df = read_hudi_mor(spark, root)
    assert df.columns == ["k", "v"]
    got = {r["k"]: r["v"] for r in df.collect()}
    assert got[3] == 30.0 and 7 not in got and len(got) == 9


def test_virtual_key_missing_declaration_gates(spark, tmp_path):
    root = _mk_vk_table(spark, str(tmp_path / "vk_none"), {}, rk="")
    with pytest.raises(HudiProtocolError, match="recordkey"):
        read_hudi_mor(spark, root)


def test_virtual_key_float_field_gates(spark, tmp_path):
    root = _mk_vk_table(spark, str(tmp_path / "vk_float"), {}, rk="v")
    with pytest.raises(HudiProtocolError, match="string/integral"):
        read_hudi_mor(spark, root)


def test_virtual_key_unknown_field_gates(spark, tmp_path):
    root = _mk_vk_table(spark, str(tmp_path / "vk_bad"), {}, rk="zz")
    with pytest.raises(HudiProtocolError, match="not present"):
        read_hudi_mor(spark, root)


def test_virtual_composite_key_sentinels(spark, tmp_path):
    """Composite ComplexKeyGenerator rendering f1:v1,f2:v2 — the base row
    and the log upsert must collide on the SAME derived key."""
    schema = {
        "type": "record",
        "name": "ck",
        "fields": [
            {"name": "a", "type": ["null", "string"], "default": None},
            {"name": "k", "type": ["null", "long"], "default": None},
            {"name": "v", "type": ["null", "double"], "default": None},
            {"name": "_hoodie_is_deleted", "type": "boolean", "default": False},
        ],
    }
    import glob
    import shutil

    root = str(tmp_path / "vk_comp")
    os.makedirs(os.path.join(root, ".hoodie"))
    base = spark.createDataFrame(
        [("x", 1, 1.0), (None, 2, 2.0), ("", 3, 3.0)],
        "a string, k long, v double",
    )
    stage = os.path.join(root, ".stage")
    base.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    base_rel = f"f1_0-1-0_{T1}.parquet"
    os.replace(part, os.path.join(root, base_rel))
    shutil.rmtree(stage, ignore_errors=True)

    def commit(instant, action, rel):
        meta = {"partitionToWriteStats": {"": [{"fileId": "f1", "path": rel}]}}
        with open(os.path.join(root, ".hoodie", f"{instant}.{action}"), "w") as fh:
            json.dump(meta, fh)

    commit(T1, "commit", base_rel)
    # upsert all three identities through the log, one per sentinel case
    recs = [
        {"a": "x", "k": 1, "v": 10.0, "_hoodie_is_deleted": False},
        {"a": None, "k": 2, "v": 20.0, "_hoodie_is_deleted": False},
        {"a": "", "k": 3, "v": 30.0, "_hoodie_is_deleted": False},
    ]
    log_rel = f".f1_{T1}.log.1_0-1-0"
    with open(os.path.join(root, log_rel), "wb") as fh:
        fh.write(write_log_blocks([encode_avro_data_block(recs, schema, T2)]))
    commit(T2, "deltacommit", log_rel)
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write(
            "hoodie.table.name=t\nhoodie.table.type=MERGE_ON_READ\n"
            "hoodie.table.recordkey.fields=a,k\n"
        )
    got = {r["k"]: r["v"] for r in read_hudi_mor(spark, root).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 30.0}
