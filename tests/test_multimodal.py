"""Multimodal binary-column plumbing: fake-codec decode/resize/frame-sample
through Arrow-batched mapInPandas (real codec libs absent — the decode line
is the stub, everything around it is real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connected_data_lake_spark.operators import multimodal as MM


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, MM.make_fake_media("img", 32, 16, 4, b"x" * 64)),
        (2, MM.make_fake_media("vid", 8, 8, 3, b"abcdef")),
        (3, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, media binary")


def test_decode_media_header_roundtrip(media_df):
    got = {r.doc_id: r.meta for r in MM.decode_media(media_df).collect()}
    assert got[1].format == "img" and (got[1].width, got[1].height) == (32, 16)
    assert got[1].n_frames == 4 and got[1].n_bytes == 64
    assert got[2].format == "vid" and got[2].n_bytes == 6
    assert got[3] is None


def test_decode_unknown_codec_raises(spark):
    df = spark.createDataFrame([(1, b"JPEGnotreally")], "doc_id long, media binary")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        MM.decode_media(df).collect()


def test_resize_rewrites_header_and_truncates(media_df):
    out = MM.resize_media(media_df.filter("doc_id = 1"), width=16, height=8)
    meta = MM.decode_media(out).first().meta
    assert (meta.width, meta.height) == (16, 8)
    # quarter the pixel area -> quarter the payload
    assert meta.n_bytes == 16


def test_sample_frames_every_second(media_df):
    got = MM.sample_frames(media_df, every_n=2).orderBy("id", "frame_id").collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.id, []).append(r)
    # doc 1: 4 frames of 16 bytes -> frames 0,2
    assert [r.frame_id for r in by_id[1]] == [0, 2]
    assert all(len(r.frame) == 16 for r in by_id[1])
    # doc 2: 3 frames of 2 bytes -> frames 0,2
    assert [r.frame_id for r in by_id[2]] == [0, 2]
    assert bytes(by_id[2][0].frame) == b"ab" and bytes(by_id[2][1].frame) == b"ef"
    # doc 3 (NULL media) contributes nothing
    assert 3 not in by_id


def test_attach_fake_media_matches_generator_arithmetic(spark):
    df = spark.createDataFrame([(70, "hi")], "doc_id long, text string")
    meta = MM.decode_media(MM.attach_fake_media(df)).first().meta
    assert meta.width == 16 + 70 % 64
    assert meta.height == 16 + 70 % 32
    assert meta.n_frames == 1 + 70 % 8
    assert meta.n_bytes == 2
