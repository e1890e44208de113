"""File-format readers beyond parquet: CSV, JSON, ORC, and Arrow IPC.

Reference parity: the reference compiles arrow's ``csv``, ``ipc`` and
``json`` features (Cargo.toml:47-53) so those formats are reachable through
DataFusion's ``register_csv``-style APIs, though no in-repo call site uses
them (SURVEY.md §2.1 S13). We expose the same capability Spark-first:

- CSV / JSON: the native DataSource V2 readers (distributed, predicate
  pushdown, schema inference or explicit schema).
- ORC: the native DataSource V2 reader/writer — like parquet it carries
  its own schema, column statistics (predicate pushdown works the same
  way: min/max stripe skipping), and vectorized decode.
- Arrow IPC: Spark has no built-in reader, so files are ingested as
  ``binaryFile`` rows and decoded executor-side with ``mapInArrow`` —
  each task parses its own files' RecordBatches; nothing funnels through
  the driver except one schema probe of a single file footer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """Distributed CSV read (native reader; schema inferred unless given)."""
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    multiline: bool = False,
    **options: str,
) -> DataFrame:
    """Distributed JSON-lines read (set ``multiline`` for whole-file docs)."""
    reader = spark.read.options(multiLine=str(multiline).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Distributed ORC read (native vectorized reader; schema from the file
    footer, filters pushed down to stripe/row-group statistics exactly as
    with parquet)."""
    return spark.read.options(**options).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "error", **options: str) -> None:
    """Write a DataFrame as ORC files (one file per partition — the same
    layout contract as the parquet sink)."""
    df.write.options(**options).mode(mode).orc(path)


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Arrow IPC (Feather v2 / stream) read.

    ``binaryFile`` lists + loads each ``.arrow``/``.ipc`` file as one row;
    ``mapInArrow`` then yields the file's RecordBatches executor-side, so
    decode parallelism = number of files and bytes never collect to the
    driver. One driver-side read of a single file provides the schema.
    Per-file memory = whole file (binaryFile contract) — for >1 GiB inputs
    convert upstream or split; typical IPC exports are many small files.
    """
    import pyarrow as pa

    files = spark.read.format("binaryFile").load(path).select("content")
    probe = files.limit(1).collect()
    if not probe:
        raise FileNotFoundError(f"no Arrow IPC files under {path}")
    arrow_schema = _open_ipc(pa, probe[0]["content"]).schema

    try:
        from pyspark.sql.pandas.types import from_arrow_schema

        spark_schema = from_arrow_schema(arrow_schema)
    except ImportError:  # pragma: no cover - fallback for API drift
        spark_schema = spark.createDataFrame(
            arrow_schema.empty_table().to_pandas()
        ).schema

    def decode(batches):
        import pyarrow as pa  # re-import inside the serialized closure

        for batch in batches:
            for row in range(batch.num_rows):
                content = batch.column(0)[row].as_py()
                reader = _open_ipc(pa, content)
                if hasattr(reader, "num_record_batches"):  # file format
                    for i in range(reader.num_record_batches):
                        yield reader.get_batch(i)
                else:  # stream format
                    yield from reader

    return files.mapInArrow(decode, spark_schema)


def _open_ipc(pa, content: bytes):
    """Open bytes as Arrow IPC file format, falling back to stream format."""
    buf = pa.BufferReader(content)
    try:
        return pa.ipc.open_file(buf)
    except pa.ArrowInvalid:
        return pa.ipc.open_stream(pa.BufferReader(content))
