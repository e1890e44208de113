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


def _remap_iceberg_snapshot_ids(path: str, mapping: dict[int, int]) -> None:
    """Rewrite an Iceberg table's snapshot ids in place (metadata JSON +
    manifest-list and manifest Avro) — test scaffolding to reproduce the
    REAL-WORLD shape where snapshot ids are random 64-bit values with no
    numeric ordering."""
    import glob
    import json

    from connected_data_lake_spark.sources.avro_ocf import read_ocf, write_ocf
    from connected_data_lake_spark.sources.iceberg import (
        IcebergStore,
        _latest_metadata_name,
    )

    store = IcebergStore(path)
    name = _latest_metadata_name(store, path)
    meta = json.loads(store.read_metadata_bytes(name))

    def m(v):
        return mapping.get(v, v)

    meta["current-snapshot-id"] = m(meta["current-snapshot-id"])
    for s in meta.get("snapshots", []):
        s["snapshot-id"] = m(s["snapshot-id"])
        if s.get("parent-snapshot-id") is not None:
            s["parent-snapshot-id"] = m(s["parent-snapshot-id"])
    for e in meta.get("snapshot-log", []):
        e["snapshot-id"] = m(e["snapshot-id"])
    with open(os.path.join(path, "metadata", os.path.basename(name)), "w") as fh:
        json.dump(meta, fh)
    for avro in glob.glob(os.path.join(path, "metadata", "*.avro")):
        with open(avro, "rb") as fh:
            schema, recs = read_ocf(fh.read())
        for r in recs:
            for k in ("added_snapshot_id", "snapshot_id"):
                if r.get(k) is not None:
                    r[k] = m(r[k])
        with open(avro, "wb") as fh:
            fh.write(write_ocf(schema, recs))


def test_iceberg_sync_survives_random_snapshot_ids(spark, tmp_path):
    """ADVICE r13: real Iceberg snapshot ids are random 64-bit values —
    a newer snapshot with a numerically SMALLER id must still be
    consumed (the ledger mark is the sequence number, never the id)."""
    from connected_data_lake_spark.sources.iceberg_write import write_iceberg

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_iceberg(_mk(spark, 0, 80), src, mode="error")
    _remap_iceberg_snapshot_ids(src, {1: 9_223_372_036_854_000_111})
    v1, seq1 = sync_from_iceberg(spark, src, dst)
    assert v1 is not None and seq1 == 1  # mark is the SEQUENCE number
    # the newer snapshot draws a numerically smaller id
    write_iceberg(_mk(spark, 80, 100), src, mode="append")
    _remap_iceberg_snapshot_ids(src, {2: 42})
    v2, seq2 = sync_from_iceberg(spark, src, dst)
    assert v2 is not None and seq2 == 2, "tick must consume, not no-op"
    got = read_table(spark, dst)
    assert got.count() == 100
    assert got.agg(F.sum("k")).first()[0] == sum(range(100))
    assert sync_from_iceberg(spark, src, dst)[0] is None  # idle no-op


def test_iceberg_sync_legacy_snapshot_id_mark_migrates(spark, tmp_path):
    """A ledger mark written by the pre-fix loop (a snapshot id) still
    resolves — by id — and the next tick re-checkpoints the sequence
    number."""
    from connected_data_lake_spark.sources.iceberg_write import write_iceberg
    from connected_data_lake_spark.sources.rootfs import write_table

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_iceberg(_mk(spark, 0, 50), src, mode="error")
    _remap_iceberg_snapshot_ids(src, {1: 777_000_111})
    # simulate the old loop: initial load checkpointed under the ID
    from connected_data_lake_spark.sources.iceberg import read_iceberg

    write_table(
        read_iceberg(spark, src), dst, txn=("iceberg-legacy", 777_000_111)
    )
    write_iceberg(_mk(spark, 50, 70), src, mode="append")
    v, seq = sync_from_iceberg(spark, src, dst, app_id="iceberg-legacy")
    assert v is not None and seq == 2
    assert read_table(spark, dst).count() == 70


def test_hudi_sync_upsert_of_synced_key_detected(spark, tmp_path):
    """ADVICE r13: an UPSERT touching an already-synced key must raise
    under on_change='error' (appending it would duplicate the key in
    the append-only sink), while an upsert-mode write of strictly NEW
    keys passes the exact key-overlap check and syncs."""
    from connected_data_lake_spark.sources.hudi import write_hudi

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_hudi(_mk(spark, 0, 40), src, record_key="k")
    sync_from_hudi(spark, src, dst)
    assert read_table(spark, dst).count() == 40
    # upsert-mode write of PURELY NEW keys: contract holds, tick syncs
    write_hudi(_mk(spark, 40, 60), src, record_key="k", mode="upsert")
    v, _ = sync_from_hudi(spark, src, dst)
    assert v is not None and read_table(spark, dst).count() == 60
    # upsert of an EXISTING key: detected even though nothing is deleted
    write_hudi(_mk(spark, 5, 6, m=9.0), src, record_key="k", mode="upsert")
    with pytest.raises(ValueError, match="already synced"):
        sync_from_hudi(spark, src, dst)
    # ignore mode appends the newest state anyway (documented behavior)
    sync_from_hudi(spark, src, dst, on_change="ignore")
    assert read_table(spark, dst).count() == 61


def test_hudi_sync_overwrite_is_destructive(spark, tmp_path):
    """INSERT_OVERWRITE removes rows the incremental read never
    re-emits — on_change='error' must refuse outright."""
    from connected_data_lake_spark.sources.hudi import write_hudi

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_hudi(_mk(spark, 0, 30), src, record_key="k")
    sync_from_hudi(spark, src, dst)
    write_hudi(_mk(spark, 100, 110), src, record_key="k", mode="overwrite")
    with pytest.raises(ValueError, match="OVERWRITE"):
        sync_from_hudi(spark, src, dst)
