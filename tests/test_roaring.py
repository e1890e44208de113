"""RoaringBitmapArray codec (sources/roaring.py) — the Delta deletion-
vector serialization. The encoder emits array containers only (fixture
support), so the run- and bitmap-container decode paths are exercised
against HAND-BUILT portable bytes per the Roaring format spec."""

from __future__ import annotations

import random
import struct

import pytest

from connected_data_lake_spark.sources.roaring import (
    MAGIC,
    RoaringFormatError,
    decode_rbm_array,
    encode_rbm_array,
)


def test_roundtrip_random():
    rng = random.Random(42)
    for _ in range(10):
        vals = sorted(rng.sample(range(0, 1 << 20), rng.randint(0, 3000)))
        vals += [(2 << 32) + v for v in sorted(rng.sample(range(0, 999), 17))]
        assert decode_rbm_array(encode_rbm_array(vals)) == vals


def test_empty_and_errors():
    assert decode_rbm_array(encode_rbm_array([])) == []
    with pytest.raises(RoaringFormatError):
        decode_rbm_array(b"\x00" * 4)
    with pytest.raises(RoaringFormatError):
        decode_rbm_array(struct.pack("<iq", 123, 0))  # bad magic
    with pytest.raises(RoaringFormatError):
        encode_rbm_array([-1])


def _wrap_array(bitmap_bytes: bytes, n: int = 1) -> bytes:
    return struct.pack("<iq", MAGIC, n) + bitmap_bytes


def test_run_container_decode():
    """Run-container bitmap: cookie 12347 with size-1 in the upper bits,
    run flag set, one container of two runs [5..8] and [100..100]."""
    size = 1
    cookie = ((size - 1) << 16) | 12347
    buf = struct.pack("<i", cookie)
    buf += bytes([0b1])  # run flag bitset: container 0 is a run
    buf += struct.pack("<HH", 0, 5 - 1)  # key 0, cardinality 5
    # size < 4 and has_run -> NO offset header
    buf += struct.pack("<H", 2)  # two runs
    buf += struct.pack("<HH", 5, 3)  # 5..8
    buf += struct.pack("<HH", 100, 0)  # 100
    assert decode_rbm_array(_wrap_array(buf)) == [5, 6, 7, 8, 100]


def test_bitmap_container_decode():
    """Bitmap container: cardinality > 4096 forces the 8 KiB bitset."""
    vals = list(range(0, 2 * 4097, 2))  # 4097 even values in block 0
    words = [0] * 1024
    for v in vals:
        words[v >> 6] |= 1 << (v & 63)
    buf = struct.pack("<ii", 12346, 1)  # no-run cookie, one container
    buf += struct.pack("<HH", 0, len(vals) - 1)
    buf += struct.pack("<I", 4 + 4 + 4 + 4)  # offset header (one entry)
    buf += struct.pack("<1024Q", *words)
    assert decode_rbm_array(_wrap_array(buf)) == vals


def test_multi_bitmap_high_bits():
    """Bitmap index i contributes the high 32 bits: values round-trip
    across the 2^32 boundary."""
    vals = [3, (1 << 32) + 7]
    enc = encode_rbm_array(vals)
    assert decode_rbm_array(enc) == vals


def test_bitmap_container_encode_roundtrip():
    """Encoder emits an 8 KiB bitmap container above 4096 values per
    2^16 block (the sf0.1 delta_dv_read fixture shape: ~15k deleted
    positions in block 0) and array containers at or below the bound —
    mixed blocks round-trip through the decoder's independent paths."""
    dense = list(range(0, 2 * 8000, 2))  # 8000 values in block 0
    sparse = [65536 * 2 + v for v in (1, 9, 4096)]  # array path, block 2
    high = [(1 << 32) + 65536 * 3 + 4097]  # second 32-bit bitmap
    vals = sorted(dense + sparse + high)
    assert decode_rbm_array(encode_rbm_array(vals)) == vals


def test_bitmap_container_encode_boundaries():
    """4096 values stay an array container; 4097 flip to bitmap; a full
    2^16 block (cardinality 65536, card-1 still fits uint16) decodes."""
    for n in (4096, 4097, 65536):
        vals = list(range(n))
        assert decode_rbm_array(encode_rbm_array(vals)) == vals


def test_encode_deduplicates():
    """Duplicate inputs collapse: the serialized cardinality is the
    distinct count, so the decoder never over-reads."""
    assert decode_rbm_array(encode_rbm_array([5, 5, 9, 9, 9])) == [5, 9]


# ---------------------------------------------------------------------------
# Iceberg v3 `deletion-vector-v1` Puffin blob codec
# ---------------------------------------------------------------------------


def test_iceberg_dv_blob_roundtrip_sparse_highs():
    from connected_data_lake_spark.sources.roaring import (
        decode_iceberg_dv_blob,
        encode_iceberg_dv_blob,
    )

    # sparse high words (keys are EXPLICIT, unlike Delta's dense array)
    vals = [5, 70000, (7 << 32) | 3, (7 << 32) | 99999, (1 << 40) + 12]
    assert decode_iceberg_dv_blob(encode_iceberg_dv_blob(vals)) == sorted(vals)


def test_iceberg_dv_blob_bitmap_container_and_crc():
    import struct

    import pytest

    from connected_data_lake_spark.sources.roaring import (
        RoaringFormatError,
        decode_iceberg_dv_blob,
        encode_iceberg_dv_blob,
    )

    vals = list(range(10_000))  # >4096 in one 2^16 block: bitmap container
    blob = encode_iceberg_dv_blob(vals)
    assert decode_iceberg_dv_blob(blob) == vals
    # flip one payload bit: the CRC frame must catch it
    corrupted = bytearray(blob)
    corrupted[20] ^= 0x01
    with pytest.raises(RoaringFormatError, match="CRC"):
        decode_iceberg_dv_blob(bytes(corrupted))
    # truncated length field must refuse, not overread
    bad_len = struct.pack(">i", len(blob) * 2) + blob[4:]
    with pytest.raises(RoaringFormatError, match="length"):
        decode_iceberg_dv_blob(bad_len)
