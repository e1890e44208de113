"""Avro OCF codec (sources/avro_ocf.py) pinned to PUBLIC spec vectors.

The encoder and decoder must not merely agree with each other — that
would let a shared misreading of the spec pass silently. The byte-level
vectors below come straight from the Avro 1.11 specification's own
examples (zigzag table, the {"a": 27, "b": "foo"} record, the [3, 27]
array), so each direction is independently pinned to the wire format a
real Iceberg writer produces.
"""

from __future__ import annotations

import io
import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from connected_data_lake_spark.sources.avro_ocf import (
    AvroError,
    _Reader,
    _collect_names,
    _read_value,
    _write_value,
    _zigzag,
    read_ocf,
    write_ocf,
)


def _enc(schema, value) -> bytes:
    names: dict = {}
    _collect_names(schema, names)
    out = io.BytesIO()
    _write_value(schema, value, out, names)
    return out.getvalue()


def _dec(schema, data: bytes):
    names: dict = {}
    _collect_names(schema, names)
    return _read_value(schema, _Reader(data), names)


# -- spec vectors -----------------------------------------------------------

ZIGZAG_TABLE = [  # Avro spec "Binary Encoding > Primitive Types" table
    (0, b"\x00"),
    (-1, b"\x01"),
    (1, b"\x02"),
    (-2, b"\x03"),
    (2, b"\x04"),
    (-64, b"\x7f"),
    (64, b"\x80\x01"),
]


@pytest.mark.parametrize("value,raw", ZIGZAG_TABLE)
def test_zigzag_long_spec_table(value, raw):
    assert _zigzag(value) == raw
    assert _dec("long", raw) == value


def test_record_spec_example():
    """Spec: record {"a": 27, "b": "foo"} -> 36 06 66 6f 6f."""
    schema = {
        "type": "record",
        "name": "test",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    raw = bytes([0x36, 0x06, 0x66, 0x6F, 0x6F])
    assert _enc(schema, {"a": 27, "b": "foo"}) == raw
    assert _dec(schema, raw) == {"a": 27, "b": "foo"}


def test_array_spec_example():
    """Spec: array<long> [3, 27] -> 04 06 36 00."""
    schema = {"type": "array", "items": "long"}
    raw = bytes([0x04, 0x06, 0x36, 0x00])
    assert _enc(schema, [3, 27]) == raw
    assert _dec(schema, raw) == [3, 27]


def test_union_null_string_spec_example():
    """Spec: union ["null","string"]: null -> 00; "a" -> 02 02 61."""
    schema = ["null", "string"]
    assert _enc(schema, None) == b"\x00"
    assert _dec(schema, b"\x00") is None
    assert _enc(schema, "a") == bytes([0x02, 0x02, 0x61])
    assert _dec(schema, bytes([0x02, 0x02, 0x61])) == "a"


def test_negative_array_block_count_with_size():
    """Readers must accept the size-prefixed block form (negative count)."""
    schema = {"type": "array", "items": "long"}
    # one block: count -2 (=> 2 items, size follows), size 2, items 3, 27
    raw = _zigzag(-2) + _zigzag(2) + _zigzag(3) + _zigzag(27) + _zigzag(0)
    assert _dec(schema, raw) == [3, 27]


def test_map_enum_fixed_round_trip():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "m", "type": {"type": "map", "values": "int"}},
            {
                "name": "e",
                "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]},
            },
            {"name": "f", "type": {"type": "fixed", "name": "Fx", "size": 3}},
            {"name": "d", "type": "double"},
            {"name": "fl", "type": "float"},
            {"name": "bo", "type": "boolean"},
            {"name": "by", "type": "bytes"},
        ],
    }
    value = {
        "m": {"x": 1, "y": -5},
        "e": "B",
        "f": b"abc",
        "d": 2.5,
        "fl": -0.5,
        "bo": True,
        "by": b"\x00\xff",
    }
    assert _dec(schema, _enc(schema, value)) == value


def test_named_type_reference_resolves():
    """A record type defined once and referenced by name later — the
    pattern Iceberg manifests use for nested structs."""
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {
                "name": "first",
                "type": {
                    "type": "record",
                    "name": "point",
                    "fields": [{"name": "x", "type": "long"}],
                },
            },
            {"name": "second", "type": "point"},  # by-name reference
        ],
    }
    value = {"first": {"x": 1}, "second": {"x": 2}}
    assert _dec(schema, _enc(schema, value)) == value


def test_record_field_default_used_when_missing():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "long"], "default": None},
        ],
    }
    assert _dec(schema, _enc(schema, {"a": 7})) == {"a": 7, "b": None}


# -- object container files -------------------------------------------------

MANIFESTISH_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                ],
            },
        },
    ],
}


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_round_trip(codec):
    records = [
        {
            "status": 1,
            "snapshot_id": 42,
            "data_file": {
                "file_path": "data/f1.parquet",
                "file_format": "PARQUET",
                "record_count": 10,
            },
        },
        {
            "status": 2,
            "snapshot_id": None,
            "data_file": {
                "file_path": "data/f2.parquet",
                "file_format": "PARQUET",
                "record_count": 3,
            },
        },
    ]
    blob = write_ocf(MANIFESTISH_SCHEMA, records, codec=codec)
    schema, got = read_ocf(blob)
    assert got == records
    assert schema["name"] == "manifest_entry"


def test_ocf_empty_file_round_trip():
    blob = write_ocf(MANIFESTISH_SCHEMA, [])
    _schema, got = read_ocf(blob)
    assert got == []


def test_ocf_rejects_unknown_codec_and_bad_magic():
    with pytest.raises(AvroError):
        write_ocf(MANIFESTISH_SCHEMA, [], codec="snappy")
    with pytest.raises(AvroError):
        read_ocf(b"PAR1not-avro")
    blob = bytearray(write_ocf(MANIFESTISH_SCHEMA, []))
    # corrupt the codec metadata value in place
    blob = bytes(blob).replace(b"deflate", b"zstandd")
    with pytest.raises(AvroError):
        read_ocf(blob)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "status": st.integers(min_value=-(2**31), max_value=2**31 - 1),
                "snapshot_id": st.one_of(
                    st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)
                ),
                "data_file": st.fixed_dictionaries(
                    {
                        "file_path": st.text(max_size=40),
                        "file_format": st.sampled_from(["PARQUET", "ORC", "AVRO"]),
                        "record_count": st.integers(
                            min_value=0, max_value=2**62
                        ),
                    }
                ),
            }
        ),
        max_size=20,
    )
)
def test_ocf_property_round_trip(records):
    _schema, got = read_ocf(write_ocf(MANIFESTISH_SCHEMA, records))
    assert got == records


def test_schema_survives_json_round_trip():
    blob = write_ocf(MANIFESTISH_SCHEMA, [])
    schema, _ = read_ocf(blob)
    assert json.loads(json.dumps(schema)) == MANIFESTISH_SCHEMA
