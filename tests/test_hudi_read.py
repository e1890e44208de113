"""External Hudi COW read path (sources/hudi.py) on a hand-generated
table — no hudi bundle ships in this environment, so the tests write the
open table layout directly (timeline + commit JSON per hudi.apache.org
docs), which also keeps the reader honest against the FORMAT."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from connected_data_lake_spark.sources.hudi import (
    HudiProtocolError,
    hudi_timeline,
    read_hudi,
)

PROPS = """#Properties saved on write
#Thu Jan 01 00:00:00 UTC 2026
hoodie.table.name=tbl
hoodie.table.type=COPY_ON_WRITE
hoodie.table.version=6
hoodie.timeline.layout.version=1
"""


def _write_slice(root, part, file_id, instant, ids, vs, commit_time):
    """One parquet file slice with the real Hudi meta columns."""
    name = f"{file_id}_0-1-0_{instant}.parquet"
    rel = os.path.join(part, name) if part else name
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    n = len(ids)
    pq.write_table(
        pa.table(
            {
                "_hoodie_commit_time": pa.array([commit_time] * n, pa.string()),
                "_hoodie_commit_seqno": pa.array(
                    [f"{commit_time}_0_{i}" for i in range(n)], pa.string()
                ),
                "_hoodie_record_key": pa.array([str(i) for i in ids], pa.string()),
                "_hoodie_partition_path": pa.array([part] * n, pa.string()),
                "_hoodie_file_name": pa.array([name] * n, pa.string()),
                "id": pa.array(ids, pa.int64()),
                "v": pa.array(vs, pa.float64()),
            }
        ),
        full,
    )
    return rel


def _commit(root, instant, part_stats, action="commit", replaced=None):
    meta = {
        "partitionToWriteStats": {
            part: [{"fileId": fid, "path": rel} for fid, rel in stats]
            for part, stats in part_stats.items()
        },
        "operationType": "UPSERT",
    }
    if replaced is not None:
        meta["partitionToReplaceFileIds"] = replaced
    with open(os.path.join(root, ".hoodie", f"{instant}.{action}"), "w") as fh:
        json.dump(meta, fh)


def _make_table(root):
    """t1: groups f1 (ids 1,2 — STALE values) + f2 (ids 3,4);
    t2: COW rewrite of f1 (corrected values). Latest = corrected."""
    os.makedirs(os.path.join(root, ".hoodie"))
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write(PROPS)
    t1, t2 = "20260101000000000", "20260102000000000"
    a1 = _write_slice(root, "", "f1", t1, [1, 2], [-1.0, -2.0], t1)
    b1 = _write_slice(root, "", "f2", t1, [3, 4], [3.0, 4.0], t1)
    a2 = _write_slice(root, "", "f1", t2, [1, 2], [1.0, 2.0], t2)
    _commit(root, t1, {"": [("f1", a1), ("f2", b1)]})
    _commit(root, t2, {"": [("f1", a2)]})
    # pending instants must be invisible
    open(os.path.join(root, ".hoodie", "20260103000000000.commit.requested"), "w").close()
    open(os.path.join(root, ".hoodie", "20260103000000000.commit.inflight"), "w").close()
    return root, t1, t2


def test_snapshot_latest_slice_per_group(spark, tmp_path):
    root, _t1, _t2 = _make_table(str(tmp_path / "tbl"))
    got = read_hudi(spark, root)
    assert got.columns == ["id", "v"]  # _hoodie_* dropped
    assert {(r.id, r.v) for r in got.collect()} == {
        (1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0),
    }


def test_time_travel_inclusive_instant(spark, tmp_path):
    root, t1, t2 = _make_table(str(tmp_path / "tbl"))
    at1 = read_hudi(spark, root, as_of_instant=t1)
    assert {(r.id, r.v) for r in at1.collect()} == {
        (1, -1.0), (2, -2.0), (3, 3.0), (4, 4.0),
    }
    # inclusive ceiling between instants resolves to the older one
    mid = read_hudi(spark, root, as_of_instant="20260101120000000")
    assert {r.v for r in mid.collect()} == {-1.0, -2.0, 3.0, 4.0}
    at2 = read_hudi(spark, root, as_of_instant=t2)
    assert {r.v for r in at2.collect()} == {1.0, 2.0, 3.0, 4.0}
    with pytest.raises(ValueError, match="archived"):
        read_hudi(spark, root, as_of_instant="19990101000000000")
    assert [t["instant"] for t in hudi_timeline(root)] == [t1, t2]


def test_meta_columns_kept_on_request(spark, tmp_path):
    root, _t1, t2 = _make_table(str(tmp_path / "tbl"))
    got = read_hudi(spark, root, keep_meta_columns=True)
    assert "_hoodie_commit_time" in got.columns
    rows = {(r.id, r._hoodie_commit_time) for r in got.collect()}
    assert (1, t2) in rows and (3, "20260101000000000") in rows


def test_replacecommit_kills_file_group(spark, tmp_path):
    """Clustering: a replacecommit replaces groups f1+f2 with ONE new
    group; time travel BEFORE it still sees the originals."""
    root, t1, t2 = _make_table(str(tmp_path / "tbl"))
    t3 = "20260103000000001"
    c1 = _write_slice(root, "", "c1", t3, [1, 2, 3, 4], [1.0, 2.0, 3.0, 4.0], t3)
    _commit(
        root, t3, {"": [("c1", c1)]},
        action="replacecommit", replaced={"": ["f1", "f2"]},
    )
    got = read_hudi(spark, root)
    assert {(r.id, r.v) for r in got.collect()} == {
        (1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0),
    }
    # exactly one file scanned: replaced groups contribute nothing
    assert read_hudi(spark, root).inputFiles() == [
        f for f in read_hudi(spark, root).inputFiles() if "c1_" in f
    ]
    before = read_hudi(spark, root, as_of_instant=t2)
    assert {f.split("/")[-1].split("_")[0] for f in before.inputFiles()} == {"f1", "f2"}


def test_partitioned_table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, ".hoodie"))
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write(PROPS)
    t1 = "20260101000000000"
    a = _write_slice(root, "dt=2026-01-01", "p1", t1, [1], [1.0], t1)
    b = _write_slice(root, "dt=2026-01-02", "p2", t1, [2], [2.0], t1)
    _commit(root, t1, {"dt=2026-01-01": [("p1", a)], "dt=2026-01-02": [("p2", b)]})
    got = read_hudi(spark, root)
    assert {r.id for r in got.collect()} == {1, 2}


def test_mor_table_gate(spark, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, ".hoodie"))
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write(PROPS.replace("COPY_ON_WRITE", "MERGE_ON_READ"))
    with pytest.raises(HudiProtocolError, match="MERGE_ON_READ"):
        read_hudi(spark, root)


def test_deltacommit_gate(spark, tmp_path):
    root, _t1, _t2 = _make_table(str(tmp_path / "tbl"))
    open(os.path.join(root, ".hoodie", "20260104000000000.deltacommit"), "w").close()
    with pytest.raises(HudiProtocolError, match="deltacommit"):
        read_hudi(spark, root)


def test_not_a_hudi_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="hoodie.properties"):
        read_hudi(spark, str(tmp_path))


def test_one_x_timeline_dir(spark, tmp_path):
    """Hudi 1.x keeps the timeline under .hoodie/timeline/ and suffixes
    the completion time onto the file name."""
    root = str(tmp_path / "tbl")
    tdir = os.path.join(root, ".hoodie", "timeline")
    os.makedirs(tdir)
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write(PROPS)
    t1 = "20260101000000000"
    a = _write_slice(root, "", "f1", t1, [7], [7.0], t1)
    meta = {"partitionToWriteStats": {"": [{"fileId": "f1", "path": a}]}}
    with open(os.path.join(tdir, f"{t1}_20260101000000500.commit"), "w") as fh:
        json.dump(meta, fh)
    got = read_hudi(spark, root)
    assert [(r.id, r.v) for r in got.collect()] == [(7, 7.0)]


# ---------------------------------------------------------------------------
# incremental query: read_hudi_incremental
# ---------------------------------------------------------------------------


def test_incremental_reads_rows_written_in_range(spark, tmp_path):
    from pyspark.sql import functions as F

    from connected_data_lake_spark.sources.hudi import (
        read_hudi_incremental,
        write_hudi,
    )

    p = str(tmp_path / "inc")
    mk = lambda lo, hi, m=1.5: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * m).alias("v")
    )
    i1 = write_hudi(mk(0, 100), p, record_key="k")
    i2 = write_hudi(mk(100, 160), p, record_key="k", mode="insert")
    i3 = write_hudi(mk(20, 30, -1.0), p, record_key="k", mode="upsert")
    inc = read_hudi_incremental(spark, p, i1)
    assert inc.count() == 70
    per = {
        r["_hoodie_commit_time"]: r["n"]
        for r in inc.groupBy("_hoodie_commit_time")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per == {i2: 60, i3: 10}
    # an upsert surfaces ONCE, under the instant that wrote it, with the
    # new values — surviving old rows of the rewritten slice are dropped
    assert inc.filter(f"_hoodie_commit_time = '{i3}'").filter(
        "v <> -k"
    ).count() == 0
    assert read_hudi_incremental(spark, p, i2, i3).count() == 10
    assert read_hudi_incremental(spark, p, i3).count() == 0


def test_incremental_covers_mor_deltacommits(spark, tmp_path):
    """MoR increments decode log blocks by header instant; a key changed
    twice in the window surfaces ONCE at its newest state, soft deletes
    drop (or surface with include_deletes)."""
    from pyspark.sql import functions as F

    from connected_data_lake_spark.sources.hudi import (
        delete_from_hudi_mor,
        read_hudi_incremental,
        upsert_hudi_mor,
        write_hudi,
    )

    p = str(tmp_path / "incmor")
    mk = lambda lo, hi, m=1.5: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * m).alias("v")
    )
    i1 = write_hudi(
        mk(0, 50).coalesce(1), p, record_key="k", table_type="MERGE_ON_READ"
    )
    i2 = upsert_hudi_mor(spark, p, mk(5, 15, -1.0), record_key="k")
    i3 = upsert_hudi_mor(
        spark, p, mk(5, 8, 100.0).unionByName(mk(60, 65)), record_key="k"
    )
    i4 = delete_from_hudi_mor(spark, p, "k = 10")
    inc = read_hudi_incremental(spark, p, i1)
    got = {r["k"]: (r["v"], r["_hoodie_commit_time"]) for r in inc.collect()}
    assert len(got) == 9 + 5  # keys 5..14 minus deleted 10, plus 5 inserts
    assert all(got[k] == (float(-k), i2) for k in range(8, 15) if k != 10)
    assert all(got[k] == (k * 100.0, i3) for k in range(5, 8))
    assert all(got[k] == (k * 1.5, i3) for k in range(60, 65))
    assert 10 not in got
    dels = read_hudi_incremental(spark, p, i1, include_deletes=True).filter(
        "_hoodie_is_deleted"
    ).collect()
    assert [(r["k"], r["_hoodie_commit_time"]) for r in dels] == [(10, i4)]
    # sub-range excludes earlier deltacommits
    assert read_hudi_incremental(spark, p, i3).count() == 0


# ---------------------------------------------------------------------------
# archived timeline replay
# ---------------------------------------------------------------------------


def test_archived_timeline_time_travel(spark, tmp_path):
    """After archival moves early instants out of the active timeline,
    time travel to them must replay .hoodie/archived/ (HoodieLogFormat
    HoodieArchivedMetaEntry records) instead of raising."""
    import pytest

    from connected_data_lake_spark.sources.hudi import (
        archive_hudi_instants,
        read_hudi,
        write_hudi,
    )

    tbl = str(tmp_path / "t")
    df = spark.range(0, 60).selectExpr("id AS k", "id * 1.5 AS v")
    t1 = write_hudi(df.filter("k < 30"), tbl, record_key="k")
    t2 = write_hudi(df.filter("k >= 30"), tbl, record_key="k", mode="insert")
    t3 = write_hudi(
        spark.range(1, 6).selectExpr("id AS k", "id * -9.0 AS v"),
        tbl, record_key="k", mode="upsert",
    )
    assert archive_hudi_instants(tbl, t2) == 2
    # active timeline holds only t3 now; archived replay covers t1/t2
    assert read_hudi(spark, tbl, as_of_instant=t1).count() == 30
    old = read_hudi(spark, tbl, as_of_instant=t2)
    assert old.count() == 60
    assert old.filter("v < 0").count() == 0  # pre-upsert values
    # the latest snapshot merges BOTH timelines: t3's upsert applies to
    # a file group whose prior slice is archived
    latest = read_hudi(spark, tbl)
    assert latest.count() == 60
    assert latest.filter("v < 0").count() == 5
    # below the whole (archived-inclusive) timeline still gates
    with pytest.raises(ValueError, match="precedes the whole"):
        read_hudi(spark, tbl, as_of_instant=str(int(t1) - 1))


def test_archive_refuses_whole_timeline_and_non_log_layout(spark, tmp_path):
    import os

    import pytest

    from connected_data_lake_spark.sources.hudi import (
        HudiProtocolError,
        archive_hudi_instants,
        read_hudi,
        write_hudi,
    )

    tbl = str(tmp_path / "t")
    t1 = write_hudi(
        spark.range(0, 10).selectExpr("id AS k", "id * 1.0 AS v"),
        tbl, record_key="k",
    )
    with pytest.raises(ValueError, match="ENTIRE active timeline"):
        archive_hudi_instants(tbl, t1)
    # a non-HoodieLogFormat archive file (1.x LSM history) gates loudly
    arch = os.path.join(tbl, ".hoodie", "archived")
    os.makedirs(arch)
    with open(os.path.join(arch, "history.parquet"), "wb") as fh:
        fh.write(b"PAR1 not a log file")
    with pytest.raises(HudiProtocolError, match="not HoodieLogFormat"):
        read_hudi(spark, tbl, as_of_instant=t1)


def test_incremental_read_covers_archived_instants(spark, tmp_path):
    """Archival must never make an incremental range silently
    under-report: instants moved to .hoodie/archived/ still contribute
    their written rows to read_hudi_incremental."""
    from connected_data_lake_spark.sources.hudi import (
        archive_hudi_instants,
        read_hudi_incremental,
        write_hudi,
    )

    tbl = str(tmp_path / "t")
    df = spark.range(0, 90).selectExpr("id AS k", "id * 1.5 AS v")
    t1 = write_hudi(df.filter("k < 30"), tbl, record_key="k")
    t2 = write_hudi(df.filter("k >= 30 AND k < 60"), tbl, record_key="k",
                    mode="insert")
    write_hudi(df.filter("k >= 60"), tbl, record_key="k", mode="insert")
    before = read_hudi_incremental(spark, tbl, from_instant=t1).count()
    assert before == 60  # t2 + t3 rows
    assert archive_hudi_instants(tbl, t2) == 2
    after = read_hudi_incremental(spark, tbl, from_instant=t1)
    assert after.count() == 60, "archived t2 rows must not vanish"
    assert after.filter("k < 30").count() == 0  # t1 itself stays excluded
