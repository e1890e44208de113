"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct — the same
pattern as rootfs payloads (SURVEY §1.1): metadata prunes independently of
bytes, so planning/filtering never touches payload pages.

The decode/resize/frame-sample kernels run as Arrow-batched ``mapInPandas``
transforms (the only place Python belongs: per-byte codec work). The real
codec libraries (PIL/ffmpeg/librosa) are NOT installed in this environment,
so decodes are STUBBED:

- payloads carrying the deterministic FAKE header (see make_fake_media) are
  "decoded" from the header — full plumbing (schema, batching, partitioning)
  is real and tested;
- any other payload raises NotImplementedError naming the missing codec.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: FAKE media header: magic(4s) + format(4s) + width(u32 BE) + height(u32 BE)
#: + n_frames(u32 BE); payload follows.
_MAGIC = b"FAKE"
_HEADER = ">4s4sIII"
_HEADER_LEN = struct.calcsize(_HEADER)

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def make_fake_media(fmt: str, width: int, height: int, n_frames: int, payload: bytes) -> bytes:
    """Deterministic fake media blob (tests/fixtures)."""
    return struct.pack(_HEADER, _MAGIC, fmt.encode()[:4].ljust(4), width, height, n_frames) + payload


def decode_media(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Decode header metadata from a binary media column → adds a ``meta``
    struct column. Arrow-batched mapInPandas; schema = input + meta."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("meta", MEDIA_META_SCHEMA, True)])
    idx = df.columns.index(media_col)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for blob in pdf.iloc[:, idx]:
                if blob is None:
                    metas.append(None)
                    continue
                blob = bytes(blob)
                if blob[:4] == _MAGIC:
                    _, fmt, w, h, nf = struct.unpack(_HEADER, blob[:_HEADER_LEN])
                    metas.append(
                        {
                            "format": fmt.decode().strip(),
                            "width": w,
                            "height": h,
                            "n_frames": nf,
                            "n_bytes": len(blob) - _HEADER_LEN,
                        }
                    )
                else:
                    # real codecs (PIL / ffmpeg / librosa) are not available
                    # in this environment — the Spark-side plumbing is real,
                    # the codec call is the single stubbed line.
                    raise NotImplementedError(
                        "real media decoding requires an image/audio codec "
                        "library not present in this environment"
                    )
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def resize_media(df: DataFrame, width: int, height: int, media_col: str = "media") -> DataFrame:
    """'Resize' stub: rewrites the FAKE header with new dimensions and
    deterministically truncates the payload pro-rata — exercising the
    binary-rewrite batch shape a real resize kernel would use."""
    schema = df.schema
    idx = df.columns.index(media_col)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf.iloc[:, idx]:
                if blob is None:
                    out.append(None)
                    continue
                blob = bytes(blob)
                if blob[:4] != _MAGIC:
                    raise NotImplementedError("real resize requires a codec library")
                _, fmt, w, h, nf = struct.unpack(_HEADER, blob[:_HEADER_LEN])
                payload = blob[_HEADER_LEN:]
                scale = (width * height) / max(w * h, 1)
                new_len = max(int(len(payload) * min(scale, 1.0)), 0)
                out.append(
                    struct.pack(_HEADER, _MAGIC, fmt, width, height, nf) + payload[:new_len]
                )
            pdf = pdf.copy()
            pdf.iloc[:, idx] = out
            yield pdf

    return df.mapInPandas(_resize, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling: one output row per kept frame (id, frame_id, frame).
    Payload is interpreted as n_frames equal slices (a real video kernel
    would demux; the slicing/explode plumbing is identical)."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("frame_id", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )
    id_idx = df.columns.index(id_col)
    m_idx = df.columns.index(media_col)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, frames = [], [], []
            for rid, blob in zip(pdf.iloc[:, id_idx], pdf.iloc[:, m_idx]):
                if blob is None:
                    continue
                blob = bytes(blob)
                if blob[:4] != _MAGIC:
                    raise NotImplementedError("real demux requires a codec library")
                _, _, w, h, nf = struct.unpack(_HEADER, blob[:_HEADER_LEN])
                payload = blob[_HEADER_LEN:]
                if nf <= 0:
                    continue
                frame_len = len(payload) // nf
                for fid in range(0, nf, every_n):
                    ids.append(int(rid))
                    fids.append(fid)
                    frames.append(payload[fid * frame_len : (fid + 1) * frame_len])
            yield pd.DataFrame({"id": ids, "frame_id": fids, "frame": frames})

    return df.mapInPandas(_sample, schema=out_schema)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test/fixture helper: build a deterministic FAKE media blob per row
    from existing columns (JVM-side concat — no UDF)."""
    header = F.concat(
        F.lit(_MAGIC),
        F.lit(b"img "),
        _be32(F.pmod(F.col(id_col), F.lit(64)) + 16),
        _be32(F.pmod(F.col(id_col), F.lit(32)) + 16),
        _be32(F.pmod(F.col(id_col), F.lit(8)) + 1),
    )
    return df.withColumn("media", F.concat(header, F.encode(F.col(text_col), "UTF-8")))


def _be32(col):
    """uint32 big-endian bytes of a small non-negative int column."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), 8, "0"))
