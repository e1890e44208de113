"""Exactly-once streaming appends into the transactional table.

The invariant under test is the Delta txnAppId/txnVersion one: a micro-batch
commits its rows and its (app_id, batch_id) mark atomically, so an
at-least-once foreachBatch replay — crash before checkpoint, restart,
speculative re-run — can never double-append, while later batches and other
writers are unaffected.
"""

from __future__ import annotations

import os

from connected_data_lake_spark.sources import rootfs as R
from connected_data_lake_spark.sources.manifest import LocalFsStore, txn_ledger
from connected_data_lake_spark.streaming.sink import append_stream, stream_app_id


def _ledger(uri):
    return txn_ledger(LocalFsStore(os.path.join(uri, R._LOG_DIR)))


def test_replayed_batch_commits_once(spark, tmp_path):
    uri = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    v0 = R.write_table(df.coalesce(1), uri, mode="overwrite")
    assert v0 == 0

    batch = spark.createDataFrame([(2, "b")], "id long, v string").coalesce(1)
    v1 = R.write_table(batch, uri, txn=("app", 0))
    assert v1 == 1 and R.read_table(spark, uri).count() == 2
    # the replay: same app, same batch — skipped, nothing written
    assert R.write_table(batch, uri, txn=("app", 0)) is None
    assert R.read_table(spark, uri).count() == 2
    assert R.vacuum_table(uri) == 0  # the skip left no orphan data
    # an EARLIER batch id replayed late is also below the high-water mark
    assert R.write_table(batch, uri, txn=("app", -5)) is None
    # the next batch, and an unrelated app's batch 0, both land
    assert R.write_table(batch, uri, txn=("app", 1)) == 2
    assert R.write_table(batch, uri, txn=("other", 0)) == 3
    assert R.read_table(spark, uri).count() == 4
    assert _ledger(uri) == {"app": 1, "other": 0}


def test_ledger_survives_rewrites_and_overwrite(spark, tmp_path):
    from connected_data_lake_spark.sources import maintenance as M

    uri = str(tmp_path / "t")
    rows = spark.createDataFrame([(i, "x" * i) for i in range(8)], "id long, v string")
    R.write_table(rows.coalesce(4), uri, mode="overwrite")
    R.write_table(rows.coalesce(1), uri, txn=("app", 3))
    M.compact_table(spark, uri, target_bytes=1 << 30)  # rewrite commit
    assert _ledger(uri)["app"] == 3  # carried through the rewrite
    assert R.write_table(rows, uri, txn=("app", 3)) is None  # still skipped
    R.write_table(rows.coalesce(1), uri, mode="overwrite")
    # overwrite resets rows but NOT the ledger — otherwise a truncate
    # re-admits every replayed batch
    assert R.write_table(rows, uri, txn=("app", 2)) is None


def test_stream_restart_does_not_duplicate(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    uri = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(1).write.parquet(
        str(src / "f1")
    )
    stream = spark.readStream.schema("id long, v string").parquet(str(src / "*"))
    append_stream(stream, uri, ckpt).awaitTermination(120)
    assert {r["id"] for r in R.read_table(spark, uri).collect()} == {1, 2}

    # new source file; SAME checkpoint → restart picks up where it left off
    spark.createDataFrame([(3, "c")], "id long, v string").coalesce(1).write.parquet(
        str(src / "f2")
    )
    stream = spark.readStream.schema("id long, v string").parquet(str(src / "*"))
    append_stream(stream, uri, ckpt).awaitTermination(120)
    out = [r["id"] for r in R.read_table(spark, uri).collect()]
    assert sorted(out) == [1, 2, 3]  # no duplicates, nothing lost

    # simulate the crash-replay: re-run batch 0's foreachBatch body directly
    app = stream_app_id(ckpt)
    replay = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    assert R.write_table(replay, uri, txn=(app, 0)) is None
    assert sorted(r["id"] for r in R.read_table(spark, uri).collect()) == [1, 2, 3]
