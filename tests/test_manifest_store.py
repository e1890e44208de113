"""Commit-protocol correctness over BOTH store implementations.

The table-commit protocol (sources/manifest.py) is storage-agnostic: one
put-if-absent primitive carries all the concurrency correctness (reference
semantics: Lance commit handler with ``conditional_put: etag``,
crates/cdl-catalog/src/lib.rs:291). These tests drive the protocol against
the in-memory S3-style If-None-Match fake — the leg a local sandbox can't
exercise with a real bucket — and against the link(2) local store, with the
same assertions: no lost updates under contention, dense versions, readers
never observing partial state. No Spark session needed: the protocol is
pure metadata.
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import ThreadPoolExecutor

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from connected_data_lake_spark.sources.manifest import (
    ConditionalPutStore,
    InMemoryStore,
    LocalFsStore,
    latest_manifest,
    manifest_files,
    publish_manifest,
)


def _stores(tmp_path):
    return {
        "memory": InMemoryStore(),
        "local": LocalFsStore(str(tmp_path / "log")),
    }


@pytest.mark.parametrize("kind", ["memory", "local"])
def test_single_writer_versions_are_dense_and_layered(tmp_path, kind):
    store = _stores(tmp_path)[kind]
    assert latest_manifest(store) == (-1, [])
    assert publish_manifest(store, ["a1"], replace=False) == 0
    assert publish_manifest(store, ["b1", "b2"], replace=False) == 1
    assert latest_manifest(store) == (1, ["a1", "b1", "b2"])
    # overwrite replaces the snapshot; history stays readable (time travel)
    assert publish_manifest(store, ["c1"], replace=True) == 2
    assert latest_manifest(store) == (2, ["c1"])
    assert manifest_files(store, 1) == ["a1", "b1", "b2"]
    assert manifest_files(store, 0) == ["a1"]


@pytest.mark.parametrize("kind", ["memory", "local"])
def test_concurrent_appends_no_lost_update(tmp_path, kind):
    """16 racing appenders over the conditional put: every commit lands
    exactly once, versions come out dense, and the final snapshot is the
    union — the no-lost-update property the protocol exists for."""
    store = _stores(tmp_path)[kind]
    n = 16
    barrier = threading.Barrier(n)

    def _append(i: int) -> int:
        barrier.wait()  # maximize contention on the same version slot
        return publish_manifest(store, [f"w{i}.parquet"], replace=False)

    with ThreadPoolExecutor(max_workers=n) as pool:
        versions = list(pool.map(_append, range(n)))

    assert sorted(versions) == list(range(n))  # dense, one slot per writer
    final_version, files = latest_manifest(store)
    assert final_version == n - 1
    assert sorted(files) == sorted(f"w{i}.parquet" for i in range(n))


def test_if_none_match_semantics_of_fake_store():
    """The fake implements exactly S3's If-None-Match contract: first PUT
    creates, second PUT of the same key fails and leaves the original."""
    store = InMemoryStore()
    assert store.put_if_absent("00000000000000000000.json", b"first")
    assert not store.put_if_absent("00000000000000000000.json", b"second")
    assert store.get("00000000000000000000.json") == b"first"


def test_loser_retries_on_refreshed_snapshot():
    """A writer that loses the put must layer on the WINNER's snapshot, not
    its own stale read — interleaving forced deterministically by a store
    whose first put for writer B fails after A committed."""
    store = InMemoryStore()
    publish_manifest(store, ["base"], replace=False)  # version 0

    class FirstPutLoses(ConditionalPutStore):
        def __init__(self, inner):
            self.inner = inner
            self.lost_once = False

        def list_keys(self):
            return self.inner.list_keys()

        def get(self, key):
            return self.inner.get(key)

        def put_if_absent(self, key, data):
            if not self.lost_once:
                self.lost_once = True
                # concurrent winner takes the slot between read and put
                self.inner.put_if_absent(key, json.dumps(
                    {"version": 1, "files": ["base", "winner"]}
                ).encode())
                return False
            return self.inner.put_if_absent(key, data)

    v = publish_manifest(FirstPutLoses(store), ["loser"], replace=False)
    assert v == 2
    assert latest_manifest(store) == (2, ["base", "winner", "loser"])


def test_contention_exhaustion_raises():
    class AlwaysLoses(InMemoryStore):
        def put_if_absent(self, key, data):
            super().put_if_absent(key, data + b"")  # someone else always wins
            return False

    with pytest.raises(RuntimeError, match="contention"):
        publish_manifest(AlwaysLoses(), ["x"], replace=False, max_attempts=5)


@settings(max_examples=30, deadline=None)
@given(
    ops=st.lists(
        st.tuples(st.sampled_from(["append", "overwrite", "crash"]), st.integers(0, 999)),
        min_size=1,
        max_size=12,
    )
)
def test_crash_injected_history_matches_model(ops):
    """Property: a writer that dies between data write and publish (crash op
    = data files exist, manifest never published) leaves NO trace in any
    snapshot; the committed history equals a sequential model of only the
    published ops."""
    store = InMemoryStore()
    model: list[list[str]] = []  # snapshot per committed version
    for op, i in ops:
        fname = f"f{i}-{len(model)}.parquet"
        if op == "crash":
            continue  # data written, publish never reached: invisible
        publish_manifest(store, [fname], replace=(op == "overwrite"))
        prev = model[-1] if model else []
        model.append([fname] if op == "overwrite" else prev + [fname])
    version, files = latest_manifest(store)
    assert version == len(model) - 1
    if model:
        assert files == model[-1]
        for v, snap in enumerate(model):  # full history time-travels exactly
            assert manifest_files(store, v) == snap
