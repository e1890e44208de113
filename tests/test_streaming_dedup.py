"""Streaming incremental dedup (streaming/dedup.py): a document stream is
classified per micro-batch against a static offline-built corpus index and
must agree with the batch classifier on the same rows."""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from connected_data_lake_spark.operators import dedup as DD
from connected_data_lake_spark.streaming.dedup import classify_stream

RNG = random.Random(20260814)


def _text(n_tokens: int) -> str:
    return " ".join(
        "".join(RNG.choice(string.ascii_lowercase) for _ in range(RNG.randint(2, 8)))
        for _ in range(n_tokens)
    )


@pytest.fixture()
def corpus_and_index(spark, tmp_path):
    rows = [(i, _text(25)) for i in range(10)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    from connected_data_lake_spark.functions import text as TX

    idx = tmp_path / "index"
    corpus.groupBy(TX.fingerprint("text").alias("fp")).agg(
        F.min("doc_id").alias("e_match")
    ).write.parquet(str(idx / "fp"))
    sh_c = DD.shingle_relation(corpus)
    DD.minhash_bands(sh_c).write.parquet(str(idx / "bands"))
    sh_c.write.parquet(str(idx / "shingles"))
    sh_c.unpersist()
    fp = spark.read.parquet(str(idx / "fp"))
    bands = spark.read.parquet(str(idx / "bands"))
    shingles = spark.read.parquet(str(idx / "shingles"))
    return rows, fp, bands, shingles


def test_stream_matches_batch_classifier(spark, tmp_path, corpus_and_index):
    rows, fp, bands, shingles = corpus_and_index
    near = rows[5][1].split(" ")
    near[10] = "zzzedit"
    new_rows = [
        (103, rows[3][1]),  # exact copy of corpus doc 3
        (105, " ".join(near)),  # one-token edit of corpus doc 5
        (200, _text(25)),  # novel
    ]
    src = tmp_path / "stream_src"
    src.mkdir()
    # two source files + maxFilesPerTrigger=1 => at least two micro-batches
    spark.createDataFrame(new_rows[:2], "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(src / "f1"))
    spark.createDataFrame(new_rows[2:], "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = classify_stream(
        stream,
        fp,
        bands,
        shingles,
        out_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.status, r.match_id)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {
        103: ("exact_dup", 3),
        105: ("near_dup", 5),
        200: ("novel", None),
    }

    # parity with the batch classifier over the same rows
    batch = spark.createDataFrame(new_rows, "doc_id long, text string")
    want = {
        r.doc_id: (r.status, r.match_id)
        for r in DD.incremental_classify(batch, fp, bands, shingles).collect()
    }
    assert got == want
