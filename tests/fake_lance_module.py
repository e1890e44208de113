"""Deterministic stand-in for the ``lance`` package (NOT installed in
this environment), used by tests/test_lance_ingest.py.

Implements exactly the API surface sources/lance_ds.py and
CdlFS.to_lance_dataset consume — ``dataset(uri, version=)``,
``Dataset.schema / .version / .get_fragments() / .get_fragment(id)``,
``Fragment.fragment_id / .to_batches(columns=)``, ``write_dataset`` —
with storage as plain parquet under ``data/`` plus JSON manifests under
``_versions/`` (so ``is_lance_dataset``'s structural probe matches).
The file is shipped to Spark's Python workers via ``addPyFile`` so the
executor-side ``import lance`` inside ``mapInArrow`` resolves to it:
the Spark plumbing under test is fully real, only the storage library
is substituted.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


class _Fragment:
    def __init__(self, path: str, fid: int):
        self._path = path
        self.fragment_id = fid

    def to_batches(self, columns=None, batch_size: int = 8):
        table = pq.read_table(self._path, columns=columns)
        return table.to_batches(max_chunksize=batch_size)


def _versions(uri: str) -> list[int]:
    out = []
    for p in glob.glob(os.path.join(uri, "_versions", "manifest-*.json")):
        out.append(int(os.path.basename(p)[len("manifest-"):-len(".json")]))
    return sorted(out)


class _Dataset:
    def __init__(self, uri: str, version=None):
        self._uri = uri
        vs = _versions(uri)
        if not vs:
            raise ValueError(f"not a (fake) lance dataset: {uri}")
        self.version = vs[-1] if version is None else version
        man = os.path.join(uri, "_versions", f"manifest-{self.version}.json")
        with open(man) as fh:
            self._files = json.load(fh)["files"]
        if self._files:
            self.schema = pq.read_schema(
                os.path.join(uri, "data", self._files[0])
            )
        else:
            self.schema = pa.schema([])

    def get_fragments(self):
        return [
            _Fragment(os.path.join(self._uri, "data", f), i)
            for i, f in enumerate(self._files)
        ]

    def get_fragment(self, fid: int):
        return _Fragment(os.path.join(self._uri, "data", self._files[fid]), fid)

    def to_table(self):
        if not self._files:
            return pa.table({})
        return pa.concat_tables(
            pq.read_table(os.path.join(self._uri, "data", f)) for f in self._files
        )

    def count_rows(self) -> int:
        return self.to_table().num_rows


def dataset(uri: str, version=None) -> _Dataset:
    return _Dataset(uri, version)


def write_dataset(table, uri: str, mode: str = "create", **_kw) -> _Dataset:
    if hasattr(table, "to_arrow_table"):  # pandas/other readers not needed
        table = table.to_arrow_table()
    os.makedirs(os.path.join(uri, "data"), exist_ok=True)
    os.makedirs(os.path.join(uri, "_versions"), exist_ok=True)
    vs = _versions(uri)
    ver = (vs[-1] if vs else 0) + 1
    files: list[str] = []
    if mode == "append" and vs:
        with open(os.path.join(uri, "_versions", f"manifest-{vs[-1]}.json")) as fh:
            files = json.load(fh)["files"]
    # two fragments per write so fragment-parallel reads are exercised
    per = max(1, (table.num_rows + 1) // 2)
    for i, start in enumerate(range(0, max(table.num_rows, 1), per)):
        name = f"v{ver}-frag{i}.parquet"
        pq.write_table(table.slice(start, per), os.path.join(uri, "data", name))
        files = files + [name]
    with open(os.path.join(uri, "_versions", f"manifest-{ver}.json"), "w") as fh:
        json.dump({"files": files}, fh)
    return _Dataset(uri)
