"""Env-gated REAL object-store integration (VERDICT r8 "Next round" #5).

Every other manifest test drives the commit protocol against the in-memory
If-None-Match fake; this one talks to an actual S3-compatible endpoint
(MinIO or AWS) so the conditional-put leg and the S3A session wiring are
not the only untested branches. Skipped cleanly unless the environment
provides an endpoint:

    CDL_TEST_S3_ENDPOINT=http://localhost:9000 \
    CDL_TEST_S3_BUCKET=cdl-test \
    AWS_ACCESS_KEY_ID=minioadmin AWS_SECRET_ACCESS_KEY=minioadmin \
    pytest tests/test_s3_integration.py
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from connected_data_lake_spark.sources.manifest import (
    S3HttpStore,
    latest_manifest,
    manifest_files,
    publish_manifest,
)

_ENDPOINT = os.environ.get("CDL_TEST_S3_ENDPOINT")
_BUCKET = os.environ.get("CDL_TEST_S3_BUCKET")

pytestmark = pytest.mark.skipif(
    not (_ENDPOINT and _BUCKET),
    reason="no S3 endpoint configured (set CDL_TEST_S3_ENDPOINT + "
    "CDL_TEST_S3_BUCKET + AWS_ACCESS_KEY_ID/AWS_SECRET_ACCESS_KEY)",
)


@pytest.fixture()
def store():
    return S3HttpStore(
        endpoint=_ENDPOINT,
        bucket=_BUCKET,
        prefix=f"it-{uuid.uuid4().hex[:12]}",
        access_key=os.environ["AWS_ACCESS_KEY_ID"],
        secret_key=os.environ["AWS_SECRET_ACCESS_KEY"],
        region=os.environ.get("AWS_REGION", "us-east-1"),
    )


def test_publish_read_time_travel_against_real_store(store):
    v1 = publish_manifest(store, ["a.parquet"], replace=False)
    v2 = publish_manifest(store, ["b.parquet"], replace=False)
    assert (v1, v2) == (1, 2)
    version, files = latest_manifest(store)
    assert version == 2 and sorted(files) == ["a.parquet", "b.parquet"]
    # time travel reads the OLD snapshot byte-for-byte from the store
    assert manifest_files(store, 1) == ["a.parquet"]


def test_conditional_put_loses_on_existing_key(store):
    payload = json.dumps({"v": 1}).encode()
    key = "00000000000000000001.json"
    assert store.put_if_absent(key, payload) is True
    # the second writer must observe HTTP 412 -> False, never overwrite
    assert store.put_if_absent(key, b"{}") is False
    assert store.get(key) == payload


def test_s3a_session_wiring(store):
    """catalog.apply() must land the endpoint/credential confs on the
    live session's Hadoop configuration (the reader path Spark uses)."""
    from connected_data_lake_spark import Cdl

    cdl = Cdl(
        s3_endpoint=_ENDPOINT,
        access_key=os.environ["AWS_ACCESS_KEY_ID"],
        secret_key=os.environ["AWS_SECRET_ACCESS_KEY"],
    )
    hconf = cdl.spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == _ENDPOINT
    assert hconf.get("fs.s3a.path.style.access") == "true"
