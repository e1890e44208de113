"""Exactly-once streaming ingest into the transactional manifest table.

Structured Streaming's foreachBatch is at-least-once: after a crash between
"sink wrote batch N" and "checkpoint recorded batch N", restart REPLAYS
batch N. A plain parquet-append sink duplicates those rows; the fix every
transactional lake uses (Delta's txnAppId/txnVersion idempotent writes) is
to commit the batch and its (app_id, batch_id) mark in ONE atomic manifest
publish and skip any batch at or below the app's recorded high-water mark
(sources/manifest.py::publish_manifest, rootfs.write_table(txn=...)).

The reference's streaming story is the ingest pipeline (T1) feeding its
append-only table (crates/cdl-fs/src/lib.rs:822-853); this adds the
replay-safety leg its commit handler would give a streaming writer.

Scale notes: each micro-batch is one transactional append — data files go
to an invisible txn dir (executor-parallel parquet write, zone-map stats
from footers), then one conditional-put manifest publish; the idempotency
check is a single latest-manifest read, re-checked inside the commit retry
loop so it composes with concurrent writers. No per-row driver work.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

from ..sources.rootfs import write_table


def stream_app_id(checkpoint_path: str) -> str:
    """Stable idempotency key for a stream: derived from the checkpoint
    location, which IS the stream's identity across restarts (same
    checkpoint = same batch numbering = same replay semantics)."""
    return "stream-" + hashlib.sha256(checkpoint_path.encode()).hexdigest()[:16]


def append_stream(
    stream_df: DataFrame,
    table_uri: str,
    checkpoint_path: str,
    app_id: str | None = None,
    available_now: bool = True,
):
    """Start a streaming append into the manifest table at ``table_uri``.

    Returns the started StreamingQuery. Each micro-batch commits via
    ``write_table(..., txn=(app_id, batch_id))``; a replayed batch (crash
    before checkpoint, manual restart, speculative re-execution) is
    detected against the manifest's per-app ledger and skipped without
    writing data. ``available_now=False`` leaves the trigger continuous
    (caller manages the query's lifetime)."""
    app = app_id or stream_app_id(checkpoint_path)

    def _append(batch_df: DataFrame, epoch_id: int) -> None:
        write_table(batch_df, table_uri, mode="append", txn=(app, epoch_id))

    writer = stream_df.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
