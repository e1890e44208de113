"""Parquet loaders for the driver's synthetic tables.

All declared queries read through :func:`load_table` so semantics fixes live
in exactly one place. The one real fix: ``events.ts`` is parquet
TIMESTAMP(NANOS, isAdjustedToUTC=false), a type Spark has no native support
for (PARQUET_TYPE_ILLEGAL on read). With
``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as raw int64
nanoseconds; we expose:

- ``ts``     TIMESTAMP_NTZ — microsecond truncation of the raw value
- ``ts_us``  LONG          — epoch microseconds (exact, for bucket math that
                             must hash-match DuckDB's ``epoch_us``)

Everything is integer arithmetic (``DIV``) — int64 nanoseconds do not fit a
double's 53-bit mantissa, so float division would silently corrupt values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connected_data_lake_spark.session import prepare_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ts arrives as int64 nanoseconds (legacy.parquet.nanosAsLong)
    return raw.select(
        "event_id",
        F.expr("ts DIV 1000").alias("ts_us"),
        F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table with canonical column types."""
    prepare_session(spark)
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view (for spark.sql(...) query shapes —
    the reference's single entry point is SQL over a registered table,
    reference: crates/cdl-fs/src/lib.rs:112-118)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
