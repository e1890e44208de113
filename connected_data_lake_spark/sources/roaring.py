"""RoaringBitmapArray codec (stdlib-only) for Delta deletion vectors.

Delta Lake serializes a deletion vector's row indexes as a
"RoaringBitmapArray" (delta PROTOCOL.md "Deletion Vector Format"): a
4-byte little-endian magic number (1681511377), an 8-byte little-endian
count of 32-bit RoaringBitmaps, then each bitmap in the standard
"portable" Roaring serialization (github.com/RoaringBitmap/
RoaringFormatSpec) — bitmap ``i`` holds the low 32 bits of the 64-bit
row indexes in ``[i·2³², (i+1)·2³²)``.

The DECODER handles all three portable container types (array, bitmap,
run). The ENCODER exists for fixtures and tests — it emits array
containers for cardinality ≤ 4096 per 2^16 block and 8 KiB bitmap
containers above that, exactly as the format spec prescribes (run
containers are a pure space optimization the encoder never needs); at
sf0.1 the delta_dv_read fixture deletes ~15k positions per block, so
the bitmap path is exercised by a driver-green query.

Scale note: decoding runs DRIVER-side on delete metadata whose total
cardinality is gated by the caller (see ``read_delta``'s
``delete_broadcast_max_rows``) — the data plane never flows through
Python. The upgrade path for larger delete sets is executor-side decode
via ``mapInArrow`` over the DV file bytes, which changes this module's
callers only.
"""

from __future__ import annotations

import struct

MAGIC = 1681511377

_SERIAL_COOKIE = 12347  # run containers present
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4


class RoaringFormatError(ValueError):
    """The bytes are not a valid portable RoaringBitmap(Array)."""


def _decode_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One standard portable 32-bit RoaringBitmap at ``buf[pos:]`` →
    (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        has_run = True
        nbytes = (size + 7) // 8
        run_flags = buf[pos:pos + nbytes]
        pos += nbytes
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        has_run = False
        run_flags = b""
    else:
        raise RoaringFormatError(f"bad RoaringBitmap cookie {cookie}")
    keys_cards = []
    for _ in range(size):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))
    if (not has_run) or size >= _NO_OFFSET_THRESHOLD:
        pos += 4 * size  # offset header: containers follow in order anyway
    out: list[int] = []
    for idx, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = has_run and bool(run_flags[idx // 8] & (1 << (idx % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(range(base + start, base + start + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for w_i, w in enumerate(words):
                while w:
                    low = w & -w
                    out.append(base + (w_i << 6) + low.bit_length() - 1)
                    w ^= low
    return out, pos


def decode_rbm_array(buf: bytes) -> list[int]:
    """Serialized RoaringBitmapArray → sorted 64-bit values."""
    if len(buf) < 12:
        raise RoaringFormatError("RoaringBitmapArray too short")
    (magic,) = struct.unpack_from("<i", buf, 0)
    if magic != MAGIC:
        raise RoaringFormatError(f"bad RoaringBitmapArray magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<q", buf, 4)
    pos = 12
    out: list[int] = []
    for i in range(n_bitmaps):
        vals, pos = _decode_rb32(buf, pos)
        high = i << 32
        out.extend(high | v for v in vals)
    return out


def encode_rbm_array(values: list[int]) -> bytes:
    """Sorted 64-bit values → serialized RoaringBitmapArray (array and
    bitmap containers — fixture/test support; see module docstring)."""
    by_high: dict[int, dict[int, set[int]]] = {}
    for v in values:
        if v < 0:
            raise RoaringFormatError("negative row index")
        by_high.setdefault(v >> 32, {}).setdefault((v >> 16) & 0xFFFF, set()).add(
            v & 0xFFFF
        )
    n_bitmaps = (max(by_high) + 1) if by_high else 0
    parts = [struct.pack("<iq", MAGIC, n_bitmaps)]
    for i in range(n_bitmaps):
        containers = {k: sorted(s) for k, s in by_high.get(i, {}).items()}
        keys = sorted(containers)
        parts.append(struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys)))
        for k in keys:
            parts.append(struct.pack("<HH", k, len(containers[k]) - 1))
        # offset header (always emitted under the no-run cookie)
        off = 4 + 4 + 4 * len(keys) + 4 * len(keys)
        for k in keys:
            parts.append(struct.pack("<I", off))
            off += 8192 if len(containers[k]) > 4096 else 2 * len(containers[k])
        for k in keys:
            vals = containers[k]
            if len(vals) > 4096:
                words = [0] * 1024
                for v in vals:
                    words[v >> 6] |= 1 << (v & 63)
                parts.append(struct.pack("<1024Q", *words))
            else:
                parts.append(struct.pack(f"<{len(vals)}H", *vals))
    return b"".join(parts)


# ---------------------------------------------------------------------------
# Iceberg v3 deletion vectors (Puffin blob type `deletion-vector-v1`)
# ---------------------------------------------------------------------------
#
# Iceberg format-version 3 replaces position-delete FILES with deletion
# vectors stored in Puffin files (spec "Deletion vectors" + Puffin spec
# `deletion-vector-v1`). The blob layout:
#
#   | len (4 B, big-endian: bytes of magic+vector) | magic D1 D3 39 64 |
#   | vector | crc32 of magic+vector (4 B, big-endian) |
#
# and the vector is the "portable 64-bit" Roaring serialization: an
# 8-byte little-endian count of 32-bit bitmaps, then per bitmap a
# 4-byte little-endian KEY (the high 32 bits) + the standard portable
# 32-bit serialization. Unlike Delta's RoaringBitmapArray (above),
# keys are EXPLICIT and sparse — an empty high-word is simply absent.

_ICEBERG_DV_MAGIC = b"\xd1\xd3\x39\x64"


def decode_iceberg_dv_blob(buf: bytes) -> list[int]:
    """One `deletion-vector-v1` Puffin blob → sorted 64-bit positions.
    CRC-checked; raises :class:`RoaringFormatError` on any mismatch."""
    import zlib

    if len(buf) < 12:
        raise RoaringFormatError("deletion-vector-v1 blob too short")
    (length,) = struct.unpack_from(">i", buf, 0)
    if length < 4 or 4 + length + 4 > len(buf):
        raise RoaringFormatError(
            f"deletion-vector-v1 length {length} exceeds blob ({len(buf)} B)"
        )
    body = buf[4 : 4 + length]  # magic + vector
    if body[:4] != _ICEBERG_DV_MAGIC:
        raise RoaringFormatError(
            f"bad deletion-vector-v1 magic {body[:4].hex()}"
        )
    (crc,) = struct.unpack_from(">I", buf, 4 + length)
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise RoaringFormatError("deletion-vector-v1 CRC mismatch")
    vec = body[4:]
    (n_bitmaps,) = struct.unpack_from("<q", vec, 0)
    pos = 8
    out: list[int] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<I", vec, pos)
        pos += 4
        vals, pos = _decode_rb32(vec, pos)
        high = key << 32
        out.extend(high | v for v in vals)
    return sorted(out)


def encode_iceberg_dv_blob(values: list[int]) -> bytes:
    """Sorted 64-bit positions → one `deletion-vector-v1` blob
    (fixture/test support, mirroring :func:`encode_rbm_array`)."""
    import zlib

    by_high: dict[int, dict[int, set[int]]] = {}
    for v in values:
        if v < 0:
            raise RoaringFormatError("negative row index")
        by_high.setdefault(v >> 32, {}).setdefault((v >> 16) & 0xFFFF, set()).add(
            v & 0xFFFF
        )
    vec_parts = [struct.pack("<q", len(by_high))]
    for high in sorted(by_high):
        vec_parts.append(struct.pack("<I", high))
        containers = {k: sorted(s) for k, s in by_high[high].items()}
        keys = sorted(containers)
        vec_parts.append(struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys)))
        for k in keys:
            vec_parts.append(struct.pack("<HH", k, len(containers[k]) - 1))
        off = 4 + 4 + 4 * len(keys) + 4 * len(keys)
        for k in keys:
            vec_parts.append(struct.pack("<I", off))
            off += 8192 if len(containers[k]) > 4096 else 2 * len(containers[k])
        for k in keys:
            vals = containers[k]
            if len(vals) > 4096:
                words = [0] * 1024
                for v in vals:
                    words[v >> 6] |= 1 << (v & 63)
                vec_parts.append(struct.pack("<1024Q", *words))
            else:
                vec_parts.append(struct.pack(f"<{len(vals)}H", *vals))
    body = _ICEBERG_DV_MAGIC + b"".join(vec_parts)
    return (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )
