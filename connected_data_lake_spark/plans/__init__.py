"""Declared-query registry.

Every capability row in SURVEY.md §2 is "declared" by a :class:`QuerySpec`:
a named PySpark query plus (when SQL-expressible) the equivalent ANSI SQL a
DuckDB oracle runs on the identical parquet files. The driver's correctness
gate runs both and compares row-count + schema + order-insensitive value
hash, so every spec obeys the canonicalization discipline (FIXTURES.md):

- explicit ORDER BY with a unique tiebreak on every query,
- explicit NULLS FIRST/LAST on nullable sort keys,
- floats rounded in-query (both sides) so fp association order can't flip a
  hash bit,
- aggregates/computed columns aliased identically on both sides,
- DuckDB ``SUM(integer)`` → HUGEINT cast back to BIGINT explicitly,
- regex restricted to the POSIX-safe subset shared by Java and RE2.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One declared query: Spark implementation + DuckDB oracle SQL."""

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None => non-SQL-expressible (weaker check)
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
):
    """Decorator: register a (spark, sf_dir) -> DataFrame query function."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        register(QuerySpec(name=name, spark=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""))
        return fn

    return wrap


def all_specs() -> dict[str, QuerySpec]:
    """Name → spec for every declared query (imports all plan modules)."""
    # import for side effect of registration
    from connected_data_lake_spark.plans import (  # noqa: F401
        events,
        extensions,
        relational,
        rootfs_queries,
    )

    return dict(_REGISTRY)
