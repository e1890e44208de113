"""Scale-safe exact percentiles: pre-aggregated counts + window interpolation.

Spark's exact ``percentile()`` aggregate buffers a value→count OpenHashMap
per group **in the aggregation buffer** (ObjectHashAggregate): grouping a
near-all-distinct column by a low-cardinality key concentrates one group's
entire distinct-value set in a single reducer's memory — at 100× data that
is an executor OOM, not a slow query. (Reference parity: DataFusion's
``approx_percentile_cont`` sidesteps this with a t-digest; the exact form
has the same buffering hazard there.)

This operator computes the identical linearly-interpolated quantile
(SQL ``percentile_cont`` / type-7, the definition Spark ``percentile()``
and DuckDB ``quantile_cont()`` share) from a memory-bounded plan:

1. ``GROUP BY (group, value) → count`` — the shuffle is bounded by the
   number of *distinct* values per map partition (map-side combine), and
   the hash-agg state per task is one long per distinct value it sees,
   spillable by Spark's ordinary agg spill path.
2. One window pass per group ordered by value: running cumulative count,
   total count, and the next distinct value (``lead``). The per-group sort
   is an EXTERNAL sort — it spills to disk instead of growing a buffer —
   so the reducer holding a hot group degrades to IO, never OOM.
3. For each requested fraction ``p``: the target 0-based position
   ``h = (n-1)·p`` falls inside exactly one distinct value's cumulative
   span ``[cum-cnt, cum-1]``; that row emits
   ``v_lo + (h - floor(h)) · (v_hi - v_lo)`` where ``v_hi`` is the same
   value when ``floor(h)+1`` is still inside the span, else the lead
   value. A final tiny max-aggregate per group collapses the one non-null
   candidate per (group, fraction).

Cost: one count-shuffle + one sort-shuffle, both on keys, no per-group
in-memory value map anywhere in the plan (the physical plan shows
HashAggregate → Window(sort) → HashAggregate, no ObjectHashAggregate).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    fractions: Sequence[float],
    out_cols: Sequence[str],
) -> DataFrame:
    """Per-group exact interpolated percentiles of ``value_col``.

    Returns one row per group with ``out_cols[i]`` = the ``fractions[i]``
    quantile (double, linear interpolation, NULLs ignored — the same
    result as ``percentile(value_col, p)`` / ``quantile_cont(v, p)``).
    A group whose values are all NULL yields NULL quantiles, exactly as
    the aggregate functions behave under GROUP BY.
    """
    if len(fractions) != len(out_cols):
        raise ValueError("fractions and out_cols must pair 1:1")
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    # NULLs keep their (group, NULL) count row through the pipeline — an
    # all-NULL group must still emit a result row — but contribute 0 to the
    # cumulative/total counts, and (sorting NULLS FIRST at cum = 0) can
    # never satisfy the in-span predicate below. One scan, no second pass.
    cnt = df.groupBy(*g, v.alias("_v")).agg(F.count("*").alias("_c"))
    nn = F.when(F.col("_v").isNotNull(), F.col("_c")).otherwise(F.lit(0))
    wsort = Window.partitionBy(*g).orderBy(F.asc_nulls_first("_v"))
    wall = Window.partitionBy(*g)
    marked = (
        cnt.withColumn("_cum", F.sum(nn).over(wsort))
        .withColumn("_n", F.sum(nn).over(wall))
        .withColumn("_nxt", F.lead("_v").over(wsort))
    )
    aggs = []
    for p, out in zip(fractions, out_cols):
        h = (F.col("_n") - F.lit(1)) * F.lit(float(p))
        lo = F.floor(h)
        frac = h - lo
        in_span = (lo >= F.col("_cum") - F.col("_c")) & (lo < F.col("_cum"))
        v_hi = F.when(lo + 1 < F.col("_cum"), F.col("_v")).otherwise(
            F.coalesce(F.col("_nxt"), F.col("_v"))
        )
        cand = F.when(in_span, F.col("_v") + frac * (v_hi - F.col("_v")))
        aggs.append(F.max(cand).alias(out))
    return marked.groupBy(*g).agg(*aggs)
