"""Exactly-once lake → native sync (streaming/lakesync.py): the
incremental consumption loop over read_delta_changes /
read_iceberg_incremental / read_hudi_incremental, checkpointed by the
native table's own transactional ledger (the sink IS the checkpoint)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from connected_data_lake_spark.sources.rootfs import read_table
from connected_data_lake_spark.streaming.lakesync import (
    sync_from_delta,
    sync_from_hudi,
    sync_from_iceberg,
)


def _mk(spark, lo, hi, m=1.5):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * m).alias("v")
    )


def test_delta_sync_initial_incremental_replay(spark, tmp_path):
    from connected_data_lake_spark.sources.delta_write import write_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(_mk(spark, 0, 100), src, mode="error")
    v, sv = sync_from_delta(spark, src, dst)
    assert v is not None and sv == 0
    assert read_table(spark, dst).count() == 100
    # idle tick: exactly-once no-op
    assert sync_from_delta(spark, src, dst)[0] is None
    # two source commits consumed in ONE tick
    write_delta(_mk(spark, 100, 120), src, mode="append")
    write_delta(_mk(spark, 120, 150), src, mode="append")
    v2, sv2 = sync_from_delta(spark, src, dst)
    assert sv2 == 2 and read_table(spark, dst).count() == 150
    # replay of the same tick: skipped by the ledger, rows unchanged
    assert sync_from_delta(spark, src, dst)[0] is None
    assert read_table(spark, dst).count() == 150
    # rows are the source's rows
    assert read_table(spark, dst).agg(F.sum("k")).first()[0] == sum(range(150))


def test_delta_sync_delete_breaks_contract(spark, tmp_path):
    from connected_data_lake_spark.sources.delta_write import (
        delete_from_delta,
        write_delta,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(_mk(spark, 0, 50), src, mode="error")
    sync_from_delta(spark, src, dst)
    delete_from_delta(spark, src, "k = 7", mode="dv")
    with pytest.raises(ValueError, match="append-only sync contract"):
        sync_from_delta(spark, src, dst)
    # ignore mode consumes inserts only (a DV delete adds none)
    v, _sv = sync_from_delta(spark, src, dst, on_change="ignore")
    assert read_table(spark, dst).count() == 50


def test_iceberg_sync_across_compaction(spark, tmp_path):
    from connected_data_lake_spark.sources.iceberg_write import (
        compact_iceberg,
        write_iceberg,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_iceberg(_mk(spark, 0, 80), src, mode="error")
    sync_from_iceberg(spark, src, dst)
    compact_iceberg(spark, src)  # replace snapshot: invisible to the sync
    write_iceberg(_mk(spark, 80, 100), src, mode="append")
    sync_from_iceberg(spark, src, dst)
    got = read_table(spark, dst)
    assert got.count() == 100  # compaction re-emitted NOTHING
    assert got.agg(F.sum("k")).first()[0] == sum(range(100))
    assert sync_from_iceberg(spark, src, dst)[0] is None


def test_hudi_sync_initial_incremental(spark, tmp_path):
    from connected_data_lake_spark.sources.hudi import write_hudi

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_hudi(_mk(spark, 0, 60), src, record_key="k")
    sync_from_hudi(spark, src, dst)
    assert read_table(spark, dst).count() == 60
    write_hudi(_mk(spark, 60, 90), src, record_key="k", mode="insert")
    sync_from_hudi(spark, src, dst)
    assert read_table(spark, dst).count() == 90
    assert sync_from_hudi(spark, src, dst)[0] is None


def test_hudi_sync_mor_delete_gates(spark, tmp_path):
    from connected_data_lake_spark.sources.hudi import (
        delete_from_hudi_mor,
        write_hudi,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_hudi(
        _mk(spark, 0, 40).coalesce(1), src, record_key="k",
        table_type="MERGE_ON_READ",
    )
    sync_from_hudi(spark, src, dst)
    assert read_table(spark, dst).count() == 40
    delete_from_hudi_mor(spark, src, "k = 3")
    with pytest.raises(ValueError, match="append-only sync contract"):
        sync_from_hudi(spark, src, dst)
    sync_from_hudi(spark, src, dst, on_change="ignore")
    assert read_table(spark, dst).count() == 40
