"""Cdl / CdlFS — the reference's public Python API, Spark-backed.

API parity targets (reference python/cdlake/filesystem.py + python/src/lib.rs):

==================  =========================================================
reference           here
==================  =========================================================
``Cdl(**catalog)``  :class:`Cdl` — catalog kwargs → Spark/S3A config
``cdl.open(url)``   :meth:`Cdl.open` → :class:`CdlFS`
``fs.sql(sql)``     :meth:`CdlFS.sql` → DataFrame (lazy; ``.toArrow()`` /
                    ``.toPandas()`` give the reference's materialized batch)
``fs.sql_as_pandas``:meth:`CdlFS.sql_as_pandas`
``fs.read_dir``     :meth:`CdlFS.read_dir` (canned P1/P3/P4/O1 query)
``fs.read_dir_all`` :meth:`CdlFS.read_dir_all`
``fs.read_files``   :meth:`CdlFS.read_files` (condition splice, P5)
``fs.copy_to``      :meth:`CdlFS.copy_to` (S6: load_all → dump_all)
``fs.to_torch``     :meth:`CdlFS.to_torch_dataset` (S11; gated import)
==================  =========================================================

The reference materializes query results into ONE Arrow RecordBatch before
crossing into Python (python/src/lib.rs:153-165); here results stay lazy
DataFrames and the caller picks the materialization point — at 100 TB a
forced driver-side concat is exactly the wrong default.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connected_data_lake_spark.catalog import ROOTFS_TABLE, DatasetCatalog, GlobalPath
from connected_data_lake_spark.functions import register_all
from connected_data_lake_spark.session import get_spark, prepare_session
from connected_data_lake_spark.sources import rootfs as rootfs_source


class Cdl:
    """Entry object: catalog + session (reference ``cdlake.Cdl``)."""

    def __init__(self, spark: SparkSession | None = None, **catalog: object) -> None:
        self.catalog = DatasetCatalog.from_env(**catalog)
        self.spark = prepare_session(spark) if spark is not None else get_spark()
        self.catalog.apply(self.spark)
        register_all(self.spark)

    def open(self, url: str) -> "CdlFS":
        """Open a dataset by URL (reference ``cdl.open``)."""
        return CdlFS(self, GlobalPath.parse(url))


class CdlFS:
    """A dataset view: the ``rootfs`` table plus canned queries."""

    def __init__(self, cdl: Cdl, path: GlobalPath) -> None:
        self.cdl = cdl
        self.path = path
        self._registered = False

    @property
    def spark(self) -> SparkSession:
        return self.cdl.spark

    # -- table lifecycle ----------------------------------------------------

    def load(self, max_chunk_size: int | None = None) -> "CdlFS":
        """Ingest the dataset's file tree into the rootfs table (reference
        ``load_all``: local glob → rows, lib.rs:593-715; chunking per the
        catalog's max_chunk_size, default off)."""
        chunk = self.cdl.catalog.max_chunk_size if max_chunk_size is None else max_chunk_size
        df = rootfs_source.ingest_dir(self.spark, self.path.uri, max_chunk_size=chunk)
        rootfs_source.write_table(df, self.path.table_uri, mode="overwrite")
        self._register()
        return self

    def _register(self) -> None:
        """Register the rootfs table as a SQL view (reference lib.rs:112-118)."""
        df = rootfs_source.read_table(self.spark, self.path.table_uri)
        df.createOrReplaceTempView(ROOTFS_TABLE)
        self._registered = True

    def table(self) -> DataFrame:
        if not self._registered:
            self._register()
        return self.spark.table(ROOTFS_TABLE)

    # -- query surface (the whole point of the reference) -------------------

    def sql(self, stmt: str) -> DataFrame:
        """Arbitrary SQL over the registered table — the reference's single
        query entry point (``CdlFS::query`` → SessionContext::sql,
        reference lib.rs:78-81). Catalyst plays DataFusion's role."""
        if not self._registered:
            self._register()
        return self.spark.sql(stmt)

    def sql_as_pandas(self, stmt: str):
        """Materialized variant (reference sql_as_pandas,
        python/cdlake/filesystem.py:44-50); Arrow-backed collect."""
        return self.sql(stmt).toPandas()

    def read_dir(self, path: str) -> DataFrame:
        """List one directory, one row per file: the reference's canned
        ``SELECT …, x'' AS data FROM rootfs WHERE parent LIKE '<p>' AND
        size IS NOT NULL ORDER BY name ASC`` (lib.rs:84-95, 120-131)."""
        p = "/" + path.strip("/") if path.strip("/") else "/"
        df = self.table()
        return (
            df.filter(F.col("parent").like(p) & F.col("size").isNotNull())
            .select(
                "name",
                "parent",
                "atime",
                "ctime",
                "mtime",
                "mode",
                "size",
                "chunk_id",
                "chunk_offset",
                "chunk_size",
                F.lit(b"").alias("data"),  # P1: zero-byte literal drops payload
            )
            .orderBy(F.col("name").asc())
        )

    def read_dir_all(self) -> DataFrame:
        """List every file (reference read_dir_all: parent LIKE '%',
        ORDER BY parent, name — lib.rs:92-95)."""
        df = self.table()
        return (
            df.filter(F.col("size").isNotNull())
            .select(
                "name",
                "parent",
                "atime",
                "ctime",
                "mtime",
                "mode",
                "size",
                "chunk_id",
                "chunk_offset",
                "chunk_size",
                F.lit(b"").alias("data"),
            )
            .orderBy(F.col("parent").asc(), F.col("name").asc())
        )

    def read_files(self, condition: str) -> DataFrame:
        """Condition splice (P5): ``SELECT * FROM rootfs WHERE {condition}``
        (reference lib.rs:167-176). The fragment goes through Catalyst's
        parser via filter(expr) — same dialect as the rest of our surface,
        never string-concatenated into a larger statement."""
        return self.table().filter(F.expr(condition))

    def take(
        self,
        indices: list[int],
        columns: tuple[str, ...] = ("parent", "name", "data"),
    ) -> DataFrame:
        """Random row access by ordinal (reference S12: Lance
        ``ds.take(indices, columns)``, python/examples/cdlake_lance_dataset.py:26-36).

        Spark has no native row-ordinal point read, so ordinals are defined
        over the table's canonical order (parent, name, chunk_id) and
        assigned with ``zipWithIndex`` — the sorted DataFrame is
        range-partitioned, and zipWithIndex numbers rows contiguously
        across partitions WITHOUT funneling data to one task (a global
        row_number() window would). The IN-list filter then prunes.
        Repeated point reads should persist the indexed table once
        (``fs.take`` re-derives it per call — the Lance analogue keeps a
        persistent index too)."""
        from pyspark.sql.types import LongType, StructField, StructType

        df = self.table().orderBy("parent", "name", "chunk_id")
        schema = StructType(
            [StructField("_rowid", LongType(), False), *df.schema.fields]
        )
        indexed = df.rdd.zipWithIndex().map(lambda t: (t[1], *t[0]))
        out = self.spark.createDataFrame(indexed, schema=schema).filter(
            F.col("_rowid").isin([int(i) for i in indices])
        )
        return out.select("_rowid", *columns).orderBy("_rowid")

    # -- copy pipeline (S5/S6) ----------------------------------------------

    def copy_to(self, dst_url: str) -> "CdlFS":
        """Dataset copy (reference copy_to = load_all → dump_all,
        lib.rs:72-76, 270-316): read the table (or tree) and materialize at
        the destination; local destinations get real files back on disk."""
        dst = GlobalPath.parse(dst_url)
        df = self.table()
        if dst.scheme == "local":
            os.makedirs(dst.uri, exist_ok=True)
            rootfs_source.dump_to_dir(df, dst.uri)
        else:
            rootfs_source.write_table(df, dst.table_uri, mode="overwrite")
        return CdlFS(self.cdl, dst)

    # -- ML export (S11) ----------------------------------------------------

    def to_arrow(self, stmt: str = f"SELECT * FROM {ROOTFS_TABLE}"):
        """Single Arrow table, the reference's Python interchange (S10)."""
        return self.sql(stmt).toArrow()

    def to_torch_dataset(self, batch_size: int = 64, columns: tuple[str, ...] = ("name", "data")):
        """Torch loader over the table (reference to_torch_dataset,
        python/cdlake/filesystem.py:66-74). torch isn't installed in this
        environment — the import is gated; the Arrow path is tested."""
        try:
            import torch  # noqa: F401
            from torch.utils.data import Dataset
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "torch is not available in this environment; use to_arrow()"
            ) from exc

        table = self.sql(f"SELECT {', '.join(columns)} FROM {ROOTFS_TABLE}").toArrow()

        class _ArrowDataset(Dataset):  # pragma: no cover
            def __len__(self) -> int:
                return table.num_rows

            def __getitem__(self, idx: int):
                return {c: table.column(c)[idx].as_py() for c in columns}

        return _ArrowDataset()
