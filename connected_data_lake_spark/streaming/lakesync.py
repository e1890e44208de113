"""Exactly-once incremental sync: external lake table → native table.

The consumption loop a migration or mirroring pipeline actually runs:
each call is one micro-batch tick that (1) reads the app's high-water
mark from the native table's transactional ledger
(``sources/manifest.py::txn_ledger`` — the same Delta txnAppId/
txnVersion pattern the streaming sink uses), (2) consumes ONLY what the
source committed since then — ``read_delta_changes`` /
``read_iceberg_incremental`` / ``read_hudi_incremental`` — and (3)
appends it with ``write_table(txn=(app_id, source_version))`` so the
data and the new high-water mark commit in ONE atomic manifest publish.

Crash anywhere and the replay is safe: a tick that died after the
publish is skipped on retry (batch ≤ high-water mark ⇒ ``write_table``
returns None and writes nothing); a tick that died before it re-runs
identically. No checkpoint files beyond the table's own ledger — the
sink IS the checkpoint, which is what makes the loop restartable from
any host.

The first tick of a fresh app is the INITIAL LOAD: the full source
snapshot lands under the source's current version, and every later tick
is purely incremental. Source deletes/updates are append-only-contract
violations and raise by default (the same stance as Spark's Delta
streaming source); ``on_change='ignore'`` consumes just the inserts.

Scale: each tick moves only the increment (metadata-planned on the
source side, one distributed append on the sink side). The 100 TB
initial load is one bounded job; steady state is proportional to churn.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _norm_uri(table_uri: str) -> str:
    """Destination as the plain path ``write_table`` speaks (the CdlFS
    ``local://`` dataset scheme is accepted and stripped)."""
    if table_uri.startswith("local://"):
        return "/" + table_uri[len("local://"):].lstrip("/")
    return table_uri


def _ledger_mark(table_uri: str, app_id: str) -> int | None:
    """The app's committed high-water mark, or None before the first
    tick (missing table and missing app both mean 'never synced')."""
    import os

    from connected_data_lake_spark.sources.manifest import (
        LocalFsStore,
        txn_ledger,
    )
    from connected_data_lake_spark.sources.rootfs import _LOG_DIR, _local_root

    root = _local_root(table_uri)
    if root is None:
        raise ValueError(
            f"lake sync needs a local destination table (got {table_uri})"
        )
    log_dir = os.path.join(root, _LOG_DIR)
    if not os.path.isdir(log_dir):
        return None
    return txn_ledger(LocalFsStore(log_dir)).get(app_id)


def _default_app(kind: str, src_path: str) -> str:
    return f"{kind}-sync-" + hashlib.sha256(src_path.encode()).hexdigest()[:16]


def _append(
    df: DataFrame, table_uri: str, app_id: str, version: int
) -> int | None:
    from connected_data_lake_spark.sources.rootfs import write_table

    return write_table(df, table_uri, txn=(app_id, version))


def sync_from_delta(
    spark: SparkSession,
    delta_path: str,
    table_uri: str,
    app_id: str | None = None,
    on_change: str = "error",
) -> tuple[int | None, int]:
    """One sync tick from an external Delta table. Returns
    ``(committed_manifest_version_or_None, source_version_consumed)`` —
    None means the tick was a no-op (nothing new, or an exactly-once
    replay skip).

    ``on_change``: ``'error'`` raises if the consumed range contains
    deletes (the source broke the append-only contract this sync
    assumes); ``'ignore'`` consumes only the inserts."""
    from connected_data_lake_spark.sources.delta import (
        delta_table_version,
        read_delta,
        read_delta_changes,
    )

    if on_change not in ("error", "ignore"):
        raise ValueError(f"unknown on_change {on_change!r}")
    table_uri = _norm_uri(table_uri)
    app_id = app_id or _default_app("delta", delta_path)
    latest = delta_table_version(delta_path)
    mark = _ledger_mark(table_uri, app_id)
    if mark is None:
        # initial load: the full current snapshot under its version
        return _append(read_delta(spark, delta_path), table_uri, app_id, latest), latest
    if mark >= latest:
        return None, latest
    ch = read_delta_changes(spark, delta_path, mark + 1, latest)
    if on_change == "error":
        bad = ch.filter(F.col("_change_type") != "insert").limit(1).count()
        if bad:
            raise ValueError(
                f"Delta versions {mark + 1}..{latest} contain deletes — "
                "the append-only sync contract is broken (use "
                "on_change='ignore' to consume inserts only, or re-seed)"
            )
    inserts = ch.filter(F.col("_change_type") == "insert").drop(
        "_change_type", "_commit_version", "_commit_timestamp"
    )
    return _append(inserts, table_uri, app_id, latest), latest


def sync_from_iceberg(
    spark: SparkSession,
    iceberg_path: str,
    table_uri: str,
    app_id: str | None = None,
) -> tuple[int | None, int]:
    """One sync tick from an external Iceberg table (append snapshots;
    ``read_iceberg_incremental`` already skips replace/compaction and
    raises on overwrite/delete snapshots — the append-only contract is
    enforced by the reader itself)."""
    from connected_data_lake_spark.sources.iceberg import (
        IcebergStore,
        _latest_metadata_name,
        read_iceberg,
        read_iceberg_incremental,
    )
    import json as _json

    table_uri = _norm_uri(table_uri)
    app_id = app_id or _default_app("iceberg", iceberg_path)
    store = IcebergStore(iceberg_path)
    meta = _json.loads(
        store.read_metadata_bytes(_latest_metadata_name(store, iceberg_path))
    )
    latest = meta.get("current-snapshot-id")
    if latest is None:
        return None, -1
    mark = _ledger_mark(table_uri, app_id)
    if mark is None:
        return (
            _append(read_iceberg(spark, iceberg_path), table_uri, app_id, latest),
            latest,
        )
    if mark >= latest:
        return None, latest
    inc = read_iceberg_incremental(
        spark, iceberg_path, from_snapshot_id=mark, to_snapshot_id=latest
    ).drop("_snapshot_id")
    return _append(inc, table_uri, app_id, latest), latest


def sync_from_hudi(
    spark: SparkSession,
    hudi_path: str,
    table_uri: str,
    app_id: str | None = None,
    on_change: str = "error",
) -> tuple[int | None, int]:
    """One sync tick from an external Hudi table. Instants are numeric
    timestamps, so the ledger mark IS the last consumed instant.
    ``on_change='error'`` raises when the range carries updates or soft
    deletes (rows whose key already synced would duplicate under an
    append-only sink); ``'ignore'`` appends whatever the incremental
    read returns (newest in-range state per key)."""
    from connected_data_lake_spark.sources.hudi import (
        _completed_instants,
        _local,
        read_hudi,
        read_hudi_incremental,
    )

    if on_change not in ("error", "ignore"):
        raise ValueError(f"unknown on_change {on_change!r}")
    table_uri = _norm_uri(table_uri)
    app_id = app_id or _default_app("hudi", hudi_path)
    instants = _completed_instants(_local(hudi_path), allow_delta=True)
    if not instants:
        return None, -1
    latest = int(instants[-1][0])
    mark = _ledger_mark(table_uri, app_id)
    if mark is None:
        import os as _os

        from connected_data_lake_spark.sources.hudi import (
            _read_properties,
            read_hudi_mor,
        )

        props_path = _os.path.join(
            _local(hudi_path), ".hoodie", "hoodie.properties"
        )
        with open(props_path, encoding="utf-8") as fh:
            ttype = _read_properties(fh.read()).get("hoodie.table.type")
        snap = (
            read_hudi_mor(spark, hudi_path)
            if ttype == "MERGE_ON_READ"
            else read_hudi(spark, hudi_path)
        )
        return _append(snap, table_uri, app_id, latest), latest
    if mark >= latest:
        return None, latest
    inc = read_hudi_incremental(
        spark,
        hudi_path,
        from_instant=str(mark),
        to_instant=str(latest),
        include_deletes=True,
    )
    if on_change == "error":
        bad = inc.filter(F.col("_hoodie_is_deleted")).limit(1).count()
        if bad:
            raise ValueError(
                f"Hudi instants ({mark}, {latest}] contain deletes — "
                "append-only sync contract broken (on_change='ignore' "
                "consumes surviving states only)"
            )
    rows = inc.filter(~F.coalesce(F.col("_hoodie_is_deleted"), F.lit(False))).drop(
        "_hoodie_commit_time", "_hoodie_is_deleted"
    )
    return _append(rows, table_uri, app_id, latest), latest
