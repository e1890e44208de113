"""SQL function registration (SURVEY §2.9).

The reference ships exactly one custom scalar UDF: ``len(BINARY…) → Int64``
(reference crates/cdl-fs/src/functions/len.rs:20-84, registered at
lib.rs:261). Spark already has the semantics as ``octet_length``; we register
``len`` as a SQL-defined function (Spark SQL UDF, inlined by Catalyst at
analysis time) so reference queries run verbatim — it never becomes a
row-at-a-time Python UDF.

``date_bin`` (DataFusion datetime family, absent from Spark) is registered
as an emulation over integer epoch arithmetic.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_all(spark: SparkSession) -> None:
    """Register every reference-parity SQL function on the session."""
    register_len(spark)
    register_date_bin(spark)


def register_len(spark: SparkSession) -> None:
    """``len(BINARY) → byte length`` (reference len.rs:36-74 computes
    offsets-diff for the array path, b.len() for scalars — i.e.
    octet_length). Spark 4 ships a built-in ``len`` whose BINARY overload
    is exactly that (verified: len(X'010203') = 3), and built-ins can't be
    replaced by SQL UDFs — so registration is a no-op when it exists."""
    try:
        spark.sql("SELECT len(X'01')").collect()
        return  # built-in covers the reference semantics
    except Exception:
        pass
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION len(x BINARY)
        RETURNS BIGINT
        RETURN CAST(octet_length(x) AS BIGINT)
        """
    )


def register_date_bin(spark: SparkSession) -> None:
    """``date_bin_epoch(width_seconds, ts)`` → bucket start in epoch
    seconds. Declared emulated form of DataFusion's date_bin (SURVEY §2.8).
    Integer DIV keeps int64 precision — a double mantissa cannot hold an
    epoch in microseconds."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION date_bin_epoch(width BIGINT, ts TIMESTAMP_NTZ)
        RETURNS BIGINT
        RETURN (unix_micros(to_utc_timestamp(ts, 'UTC')) DIV (width * 1000000)) * width
        """
    )
