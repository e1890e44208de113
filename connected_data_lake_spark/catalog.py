"""Dataset catalog + path model.

Re-expresses the reference's ``DatasetCatalog`` (reference:
crates/cdl-catalog/src/lib.rs:34-147 — S3 endpoint/credentials, chunking and
buffering knobs) and ``GlobalPath``/``DatasetPath`` (reference:
crates/cdl-fs/src/lib.rs:192-229, scheme parsing at :343-373 where ``s3a://``
aliases ``s3``) as plain Python dataclasses that translate to Spark/Hadoop
S3A configuration instead of an object-store client.

The reference URL shapes:

    local://<abs-path>         (also bare /abs/path)
    s3://<dataset-name>/<rel>  (s3a:// accepted as alias)

For Spark, a dataset name maps to a table root ``s3a://<name>/rootfs`` (the
reference stores the Lance table at ``s3://<name>/rootfs``, reference:
crates/cdl-fs/src/lib.rs:343-353); locally it maps to a directory holding a
parquet/delta ``rootfs`` table next to raw files.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field, fields

from pyspark.sql import SparkSession

#: table name the file tree is registered under (reference DIR_ROOTFS,
#: crates/cdl-fs/src/lib.rs:898)
ROOTFS_TABLE = "rootfs"

_URL_RE = re.compile(r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<rest>.*)$", re.IGNORECASE)


@dataclass
class DatasetCatalog:
    """Connection + ingestion knobs (reference crates/cdl-catalog/src/lib.rs).

    Defaults mirror the reference: chunking off (``max_chunk_size = 0``,
    reference :183-188), 1 GiB write buffer (:171-175). S3 fields become
    Hadoop S3A confs via :meth:`apply`.
    """

    # S3-compatible endpoint (MinIO in the reference deployment)
    s3_endpoint: str | None = None
    access_key: str | None = None
    secret_key: str | None = None
    region: str = "us-east-1"
    allow_http: bool = True  # MinIO endpoints are commonly plain HTTP
    # ingestion knobs (reference crates/cdl-catalog/src/lib.rs:171-199)
    max_buffer_size: int = 1 << 30
    max_chunk_size: int = 0
    min_cache_object_size: int = 64 << 20
    extra: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls, **overrides: object) -> "DatasetCatalog":
        """Build from AWS_* / CDL_* environment, then keyword overrides
        (mirrors the reference's env-or-flag catalog parsing)."""
        cat = cls(
            s3_endpoint=os.environ.get("AWS_ENDPOINT_URL"),
            access_key=os.environ.get("AWS_ACCESS_KEY_ID"),
            secret_key=os.environ.get("AWS_SECRET_ACCESS_KEY"),
            region=os.environ.get("AWS_REGION", "us-east-1"),
        )
        for key, value in overrides.items():
            cat.merge(key, value)
        return cat

    def merge(self, key: str, value: object) -> None:
        """String-keyed merge (reference DatasetCatalog::merge,
        crates/cdl-catalog/src/lib.rs:211-226)."""
        names = {f.name for f in fields(self)}
        if key in names and key != "extra":
            current = getattr(self, key)
            if isinstance(current, bool):
                value = str(value).lower() in ("1", "true", "yes")
            elif isinstance(current, int):
                value = int(value)  # type: ignore[arg-type]
            setattr(self, key, value)
        else:
            self.extra[key] = str(value)

    def apply(self, spark: SparkSession) -> SparkSession:
        """Translate to Hadoop S3A confs on a live session.

        The reference builds object-store client options per dataset
        (crates/cdl-catalog/src/lib.rs:257-293: endpoint, path-style access,
        credentials, allow_http, etag conditional put). S3A equivalents are
        set on the shared Hadoop conf; conditional put and read-through
        caching are native S3A/committer behavior.
        """
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        if self.s3_endpoint:
            hconf.set("fs.s3a.endpoint", self.s3_endpoint)
            hconf.set("fs.s3a.path.style.access", "true")
            hconf.set(
                "fs.s3a.connection.ssl.enabled",
                "false" if self.allow_http else "true",
            )
        if self.access_key:
            hconf.set("fs.s3a.access.key", self.access_key)
        if self.secret_key:
            hconf.set("fs.s3a.secret.key", self.secret_key)
        hconf.set("fs.s3a.endpoint.region", self.region)
        # Readahead ~ the reference's metadata_size_hint (cdl-fs/src/lib.rs:255)
        hconf.set("fs.s3a.readahead.range", str(min(self.max_buffer_size, 1 << 20)))
        for key, value in self.extra.items():
            hconf.set(key, value)
        return spark


@dataclass(frozen=True)
class GlobalPath:
    """``scheme://name/rel`` triple (reference GlobalPath,
    crates/cdl-fs/src/lib.rs:192-229)."""

    scheme: str  # "local" | "s3"
    name: str  # dataset name (s3 bucket) or "" for local
    rel: str  # path relative to the dataset root, no leading slash

    @classmethod
    def parse(cls, url: str) -> "GlobalPath":
        if not url.strip():
            # an empty bare path would otherwise resolve to the local ROOT
            # ("/": lstrip of "" is "") and an auto-load CLI invocation
            # would try to ingest the whole filesystem
            raise ValueError("empty dataset URL")
        match = _URL_RE.match(url)
        if match is None:
            # bare path = local (the reference accepts plain paths)
            return cls(scheme="local", name="", rel=url.lstrip("/"))
        scheme = match.group("scheme").lower()
        rest = match.group("rest")
        if scheme in ("s3", "s3a"):  # s3a alias, reference lib.rs:364-373
            name, _, rel = rest.partition("/")
            if not name:
                raise ValueError(f"s3 URL must carry a dataset name: {url!r}")
            return cls(scheme="s3", name=name, rel=rel)
        if scheme in ("local", "file"):
            return cls(scheme="local", name="", rel=rest.lstrip("/"))
        raise ValueError(f"unsupported scheme {scheme!r} in {url!r}")

    @property
    def uri(self) -> str:
        """Full URI of this path for Spark readers."""
        if self.scheme == "s3":
            return f"s3a://{self.name}/{self.rel}" if self.rel else f"s3a://{self.name}"
        return "/" + self.rel

    @property
    def table_uri(self) -> str:
        """Where the ``rootfs`` table lives for this dataset (reference
        stores at ``s3://<name>/rootfs``, crates/cdl-fs/src/lib.rs:343-353;
        locally we keep ``<root>/.rootfs`` so the table never collides with
        user files)."""
        if self.scheme == "s3":
            return f"s3a://{self.name}/{ROOTFS_TABLE}"
        return "/" + self.rel.rstrip("/") + "/." + ROOTFS_TABLE
