"""Minimal Avro Object Container File codec (read + write, stdlib-only).

Iceberg's manifest lists and manifest files are Avro OCF — the one format
leg of the external-table story this environment has no library for (no
``fastavro`` / ``avro`` / ``pyiceberg``), so this module implements the
subset of the PUBLIC Avro 1.11 specification
(avro.apache.org/docs/1.11.1/specification/) that table-format metadata
needs:

- binary encoding for null / boolean / int / long / float / double /
  bytes / string / fixed / enum / array / map / union / record,
- named-type definitions and references (records nested in manifests
  reference earlier-defined types by name),
- Object Container Files with the ``null`` and ``deflate`` codecs
  (deflate = RAW deflate per the spec, no zlib header),
- reading with the embedded WRITER schema only (no reader-schema
  resolution) — correct for manifest replay, which always consumes
  whole records as written.

This is a metadata-plane codec: manifests are KBs-to-MBs read on the
driver during planning, never a per-row data path — the data files
themselves stay parquet read by Spark's native scan. The encoder exists
so tests can build REAL Iceberg metadata trees without pyiceberg; both
directions are pinned to byte-level vectors from the Avro spec in
``tests/test_avro_ocf.py``, not merely to each other.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"
_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


class AvroError(ValueError):
    """Malformed Avro data or an unsupported schema feature."""


# ---------------------------------------------------------------------------
# schema handling: normalize to dict/list/str forms, resolve named refs
# ---------------------------------------------------------------------------


def _full_name(schema: dict) -> str:
    name = schema["name"]
    ns = schema.get("namespace")
    if "." in name or not ns:
        return name
    return f"{ns}.{name}"


def _collect_names(schema, names: dict) -> None:
    """Pre-register every named type so later references resolve."""
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)
    elif isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "error", "enum", "fixed"):
            full = _full_name(schema)
            names[full] = schema
            names.setdefault(schema["name"], schema)  # short-name fallback
        if t in ("record", "error"):
            for f in schema.get("fields", []):
                _collect_names(f["type"], names)
        elif t == "array":
            _collect_names(schema["items"], names)
        elif t == "map":
            _collect_names(schema["values"], names)
        elif isinstance(t, (dict, list)):
            _collect_names(t, names)


def _resolve(schema, names: dict):
    """A schema node: primitive str, named ref str, or complex dict/list."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise AvroError(f"unresolved Avro type reference {schema!r}")
    if isinstance(schema, dict) and isinstance(schema.get("type"), str) \
            and schema["type"] in _PRIMITIVES and "logicalType" in schema:
        return schema["type"]  # logical types decode as their base type
    return schema


# ---------------------------------------------------------------------------
# binary decode
# ---------------------------------------------------------------------------


class _Reader:
    def __init__(self, data: bytes):
        self._b = data
        self._i = 0

    def eof(self) -> bool:
        return self._i >= len(self._b)

    def take(self, n: int) -> bytes:
        if self._i + n > len(self._b):
            raise AvroError("truncated Avro data")
        out = self._b[self._i:self._i + n]
        self._i += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.take(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 70:
                raise AvroError("varint too long")
        return (acc >> 1) ^ -(acc & 1)  # zigzag


def _read_value(schema, r: _Reader, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return r.take(1) == b"\x01"
        if schema in ("int", "long"):
            return r.read_long()
        if schema == "float":
            return struct.unpack("<f", r.take(4))[0]
        if schema == "double":
            return struct.unpack("<d", r.take(8))[0]
        if schema == "bytes":
            return bytes(r.take(r.read_long()))
        if schema == "string":
            return r.take(r.read_long()).decode("utf-8")
        raise AvroError(f"unsupported Avro type {schema!r}")
    if isinstance(schema, list):  # union: long branch index, then value
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return _read_value(schema[idx], r, names)
    t = schema["type"]
    if t in ("record", "error"):
        return {
            f["name"]: _read_value(f["type"], r, names)
            for f in schema["fields"]
        }
    if t == "enum":
        symbols = schema["symbols"]
        idx = r.read_long()
        if not 0 <= idx < len(symbols):
            raise AvroError(f"enum index {idx} out of range")
        return symbols[idx]
    if t == "fixed":
        return bytes(r.take(schema["size"]))
    if t == "array":
        out = []
        while True:
            count = r.read_long()
            if count == 0:
                return out
            if count < 0:  # block with byte size prefix (skippable form)
                count = -count
                r.read_long()
            for _ in range(count):
                out.append(_read_value(schema["items"], r, names))
    if t == "map":
        out = {}
        while True:
            count = r.read_long()
            if count == 0:
                return out
            if count < 0:
                count = -count
                r.read_long()
            for _ in range(count):
                key = r.take(r.read_long()).decode("utf-8")
                out[key] = _read_value(schema["values"], r, names)
    # {"type": <nested schema or union list or primitive name>} wrapper:
    # recurse on the attribute directly. (A membership test against
    # _PRIMITIVES here would raise TypeError for dict/list-typed "type"
    # attributes — legal Avro like {"type": ["null","long"]} — and the
    # primitive-str case decodes identically through the recursion.)
    return _read_value(t, r, names)


# ---------------------------------------------------------------------------
# binary encode
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> bytes:
    acc = (n << 1) if n >= 0 else (((-n - 1) << 1) | 1)
    out = bytearray()
    while True:
        bits = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _union_branch(schema: list, value, names: dict) -> int:
    """Writer-side union branch pick, sufficient for metadata fixtures:
    ``null`` matches None; otherwise the first non-null branch whose base
    type is plausible for the python value."""
    for i, branch in enumerate(schema):
        if _resolve(branch, names) == "null" and value is None:
            return i
    plausible = []
    for i, branch in enumerate(schema):
        b = _resolve(branch, names)
        if b == "null":
            continue
        if isinstance(b, str):
            ok = {
                "boolean": isinstance(value, bool),
                "int": isinstance(value, int) and not isinstance(value, bool),
                "long": isinstance(value, int) and not isinstance(value, bool),
                "float": isinstance(value, float),
                "double": isinstance(value, float),
                "bytes": isinstance(value, (bytes, bytearray)),
                "string": isinstance(value, str),
            }.get(b, False)
        elif isinstance(b, list):
            ok = True
        else:
            bt = b["type"]
            ok = (
                (bt in ("record", "error") and isinstance(value, dict))
                or (bt == "map" and isinstance(value, dict))
                or (bt == "array" and isinstance(value, (list, tuple)))
                or (bt == "enum" and isinstance(value, str))
                or (bt == "fixed" and isinstance(value, (bytes, bytearray)))
            )
        if ok:
            plausible.append(i)
    if not plausible:
        raise AvroError(f"no union branch for {type(value).__name__}")
    return plausible[0]


def _write_value(schema, value, out: io.BytesIO, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, str):
        if schema == "null":
            if value is not None:
                raise AvroError("non-None for null type")
            return
        if schema == "boolean":
            out.write(b"\x01" if value else b"\x00")
        elif schema in ("int", "long"):
            out.write(_zigzag(int(value)))
        elif schema == "float":
            out.write(struct.pack("<f", float(value)))
        elif schema == "double":
            out.write(struct.pack("<d", float(value)))
        elif schema == "bytes":
            out.write(_zigzag(len(value)))
            out.write(bytes(value))
        elif schema == "string":
            raw = value.encode("utf-8")
            out.write(_zigzag(len(raw)))
            out.write(raw)
        else:
            raise AvroError(f"unsupported Avro type {schema!r}")
        return
    if isinstance(schema, list):
        idx = _union_branch(schema, value, names)
        out.write(_zigzag(idx))
        _write_value(schema[idx], value, out, names)
        return
    t = schema["type"]
    if t in ("record", "error"):
        for f in schema["fields"]:
            if f["name"] not in value and "default" in f:
                _write_value(f["type"], f["default"], out, names)
            else:
                _write_value(f["type"], value[f["name"]], out, names)
        return
    if t == "enum":
        out.write(_zigzag(schema["symbols"].index(value)))
        return
    if t == "fixed":
        if len(value) != schema["size"]:
            raise AvroError("fixed size mismatch")
        out.write(bytes(value))
        return
    if t == "array":
        if value:
            out.write(_zigzag(len(value)))
            for item in value:
                _write_value(schema["items"], item, out, names)
        out.write(_zigzag(0))
        return
    if t == "map":
        if value:
            out.write(_zigzag(len(value)))
            for k, v in value.items():
                raw = k.encode("utf-8")
                out.write(_zigzag(len(raw)))
                out.write(raw)
                _write_value(schema["values"], v, out, names)
        out.write(_zigzag(0))
        return
    _write_value(t, value, out, names)


# ---------------------------------------------------------------------------
# Object Container Files
# ---------------------------------------------------------------------------


def read_ocf(data: bytes) -> tuple[dict | list | str, list]:
    """Parse an OCF: returns (writer schema JSON, decoded records)."""
    r = _Reader(data)
    if r.take(4) != _MAGIC:
        raise AvroError("not an Avro object container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _read_value(meta_schema, r, {})
    sync = r.take(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported OCF codec {codec!r}")
    names: dict = {}
    _collect_names(schema, names)
    records = []
    while not r.eof():
        count = r.read_long()
        size = r.read_long()
        block = r.take(size)
        if codec == "deflate":
            block = zlib.decompressobj(-15).decompress(block)
        br = _Reader(block)
        for _ in range(count):
            records.append(_read_value(schema, br, names))
        if r.take(16) != sync:
            raise AvroError("OCF sync marker mismatch")
    return schema, records


def write_ocf(schema, records, codec: str = "deflate") -> bytes:
    """Serialize records to OCF bytes under the given writer schema.

    The sync marker is derived from the schema (deterministic output for
    reproducible test fixtures — uniqueness across files is irrelevant
    for whole-file reads)."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported OCF codec {codec!r}")
    schema_json = json.dumps(schema)
    names: dict = {}
    _collect_names(schema, names)
    body = io.BytesIO()
    for rec in records:
        _write_value(schema, rec, body, names)
    block = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    import hashlib

    sync = hashlib.md5(schema_json.encode("utf-8")).digest()
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_value({"type": "map", "values": "bytes"}, meta, out, {})
    out.write(sync)
    if records:
        out.write(_zigzag(len(records)))
        out.write(_zigzag(len(block)))
        out.write(block)
        out.write(sync)
    return out.getvalue()


def encode_record(schema, record) -> bytes:
    """RAW Avro binary encoding of one record (no OCF container) — the
    per-record payload format inside Hudi log-file Avro data blocks."""
    names: dict = {}
    _collect_names(schema, names)
    out = io.BytesIO()
    _write_value(schema, record, out, names)
    return out.getvalue()


def decode_record(schema, data: bytes):
    """RAW Avro binary decode of one record (no OCF container)."""
    names: dict = {}
    _collect_names(schema, names)
    return _read_value(schema, _Reader(data), names)
