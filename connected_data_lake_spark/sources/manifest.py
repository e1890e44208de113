"""Manifest commit protocol over a put-if-absent blob store.

The reference publishes every table commit through one storage primitive: a
conditional put that fails if the key already exists (Lance commit handler
with ``conditional_put: etag`` — reference crates/cdl-catalog/src/lib.rs:291,
crates/cdl-fs/src/lib.rs:822-853). Everything else — optimistic retry,
snapshot layering, time travel — is protocol on top. This module states that
protocol once, over an abstract :class:`ConditionalPutStore`, so the SAME
commit code runs against:

- :class:`LocalFsStore` — ``link(2)``: creation fails with EEXIST when a
  concurrent writer took the slot (what the sandbox exercises end-to-end),
- an S3-style store — ``PUT`` with ``If-None-Match: *`` (HTTP 412 on loss);
  :class:`InMemoryStore` implements exactly those semantics for tests, so
  the object-store leg of the protocol is verified without a real bucket.

Commit = write immutable data files to an invisible txn dir, then publish
manifest version N+1 via put-if-absent. The loser of a race re-reads the
new latest snapshot and retries; readers resolve the highest manifest and
read exactly its file list, so a partial write is never observable.
"""

from __future__ import annotations

import abc
import json
import os
import threading
import uuid

#: manifest key pattern: zero-padded so lexicographic order == numeric order
#: (object stores list lexicographically; no parse-all-keys needed at scale)
_KEY_FMT = "{:020d}.json"


class ConditionalPutStore(abc.ABC):
    """Keyed blob store with one atomic primitive: put-if-absent."""

    @abc.abstractmethod
    def list_keys(self) -> list[str]:
        """All committed manifest keys (sorted ascending)."""

    @abc.abstractmethod
    def get(self, key: str) -> bytes:
        """Read a committed blob."""

    @abc.abstractmethod
    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Atomically create ``key`` iff it does not exist.

        Returns True when this caller created it, False when the key
        already existed (= lost the race). MUST be atomic with respect to
        concurrent callers — this is the commit protocol's entire
        correctness budget."""


class LocalFsStore(ConditionalPutStore):
    """Directory-backed store; put-if-absent via ``link(2)`` EEXIST."""

    def __init__(self, root: str):
        self.root = root

    def list_keys(self) -> list[str]:
        try:
            return sorted(f for f in os.listdir(self.root) if f.endswith(".json"))
        except FileNotFoundError:
            return []

    def get(self, key: str) -> bytes:
        with open(os.path.join(self.root, key), "rb") as f:
            return f.read()

    def put_if_absent(self, key: str, data: bytes) -> bool:
        os.makedirs(self.root, exist_ok=True)
        tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, os.path.join(self.root, key))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)


class InMemoryStore(ConditionalPutStore):
    """S3 ``If-None-Match: *`` semantics in memory — the fake object store
    the conditional-put leg of the protocol is tested against (reference
    semantics: crates/cdl-catalog/src/lib.rs:291)."""

    def __init__(self):
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def list_keys(self) -> list[str]:
        with self._lock:
            return sorted(k for k in self._objects if k.endswith(".json"))

    def get(self, key: str) -> bytes:
        with self._lock:
            return self._objects[key]

    def put_if_absent(self, key: str, data: bytes) -> bool:
        with self._lock:  # one atomic compare-and-create, as S3 guarantees
            if key in self._objects:
                return False  # HTTP 412 Precondition Failed
            self._objects[key] = bytes(data)
            return True


def latest_manifest(store: ConditionalPutStore) -> tuple[int, list[str]]:
    """(version, relative file list) of the newest manifest; (-1, []) if none."""
    keys = store.list_keys()
    if not keys:
        return -1, []
    key = keys[-1]
    return int(key[: -len(".json")]), json.loads(store.get(key))["files"]


def manifest_files(store: ConditionalPutStore, version: int) -> list[str]:
    """File list of snapshot ``version`` (time travel read)."""
    return json.loads(store.get(_KEY_FMT.format(version)))["files"]


def publish_manifest(
    store: ConditionalPutStore,
    new_files: list[str],
    replace: bool,
    max_attempts: int = 1000,
) -> int:
    """Optimistic-concurrency commit: retry the conditional put until this
    writer wins a version slot. Returns the committed version.

    Each attempt re-reads the latest snapshot, layers ``new_files`` on it
    (or replaces it), and tries to create version N+1. A lost put means a
    concurrent writer committed N+1 first; the retry layers on THAT
    snapshot, so no committed write is ever dropped (no lost update)."""
    for _ in range(max_attempts):
        version, files = latest_manifest(store)
        snapshot = list(new_files) if replace else files + list(new_files)
        blob = json.dumps({"version": version + 1, "files": snapshot}).encode()
        if store.put_if_absent(_KEY_FMT.format(version + 1), blob):
            return version + 1
    raise RuntimeError(f"commit contention: gave up after {max_attempts} attempts")
