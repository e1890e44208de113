"""JVM-cheap driver-local relations.

``spark.createDataFrame(list_of_tuples)`` parallelizes the rows into a
PICKLED Python RDD: every execution of the resulting plan round-trips a
Python worker per partition just to deserialize a handful of
planning-sized rows. Measured in a WARM 32-thread local session: ~0.4 s
per execution for a 25-row relation (32 worker round-trips), ~2-3 s when
the worker pool is cold — paid again on every re-execution because the
scan is the plan's leaf, not a one-off. The pyarrow path hands the rows
to the JVM as ONE Arrow batch; executing the plan scans a JVM-side local
relation, no Python workers anywhere (~0.1 s warm, of which ~all is
ordinary job latency).

This is the generalization of ``sources/delta.py::fp_pos_df`` (the
round-14 Arrow-batch delete-position transfer) for every operator that
embeds planning-sized driver state in a plan — k-means centroids,
PageRank's sub-cut finish, IVF/PQ probe routing, range-partition base
offsets.

Rows are positional sequences (tuples or ``Row``s). The declared schema
is authoritative: values are coerced by pyarrow to the matching Arrow
type, ``None`` stays NULL (never NaN — the pandas detour would lose that
distinction for float columns). Any Arrow conversion failure falls back
to the plain ``createDataFrame`` path, correctness first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["local_df"]


def local_df(
    spark: SparkSession,
    rows: Sequence[Sequence],
    schema: str | T.StructType,
) -> DataFrame:
    """``createDataFrame`` for planning-sized driver rows, via one Arrow
    batch (module notes). ``schema`` is a DDL string or ``StructType``."""
    st = (
        T._parse_datatype_string(schema)
        if isinstance(schema, str)
        else schema
    )
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        pa_schema = to_arrow_schema(st)
        cols = [
            pa.array([r[i] for r in rows], type=field.type)
            for i, field in enumerate(pa_schema)
        ]
        return spark.createDataFrame(
            pa.Table.from_arrays(cols, schema=pa_schema)
        )
    except Exception:  # noqa: BLE001 — Arrow is an optimization, never a gate
        return spark.createDataFrame(list(rows), st)
