"""Lakehouse mutation semantics as pure relational operators.

The reference's storage layer appends immutable chunk batches and rewrites
manifests (cdl-fs lib.rs: append sink + manifest swap); it has no
row-level MERGE. A training-data lake needs one — refreshing a curated
table from a changeset (new crawl snapshot, label fixes, takedown
deletions) is a MERGE, and slowly-changing history over an event stream is
the SCD2 build. Both are expressed here as pure DataFrame transforms that
yield the post-mutation relation; the caller persists it through the
transactional append sink.

Scale notes:
- ``merge_into`` is one full-outer shuffle join on the merge key. Spark
  cannot broadcast a full-outer build side, so at 100 TB the lever is
  bucketing both sides on the key (exchange-free SMJ) — the same layout
  the repo's bucketed-join query demonstrates. No driver-side state.
- ``scd2_history`` is two window passes over ``(key, ts)`` — one shuffle
  on the key, no self-join (the naive form joins the table to itself per
  boundary).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    *,
    update_set: dict[str, Column] | None = None,
    delete_when: Column | None = None,
    insert_values: dict[str, Column] | None = None,
) -> DataFrame:
    """Delta-style MERGE: returns the target relation after applying the
    changeset.

    - matched & ``delete_when`` → row removed;
    - matched otherwise → ``update_set`` columns replaced (expressions may
      reference ``t.<col>`` / ``s.<col>``), others kept;
    - source-only → inserted from ``insert_values`` (required to insert;
      when omitted, unmatched source rows are ignored);
    - target-only → kept verbatim.

    Output schema is exactly the target schema.
    """
    t = target.withColumn("_tm", F.lit(1)).alias("t")
    s = source.withColumn("_sm", F.lit(1)).alias("s")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in on],
    )
    j = t.join(s, cond, "full_outer")
    matched = F.col("t._tm").isNotNull() & F.col("s._sm").isNotNull()
    t_only = F.col("s._sm").isNull()
    s_only = F.col("t._tm").isNull()

    update_set = update_set or {}
    keep = ~matched | ~(delete_when if delete_when is not None else F.lit(False))
    if insert_values is None:
        keep = keep & ~s_only
    out_cols = []
    for c in target.columns:
        upd = update_set.get(c, F.col(f"t.{c}"))
        expr = F.when(matched, upd).when(t_only, F.col(f"t.{c}"))
        if insert_values is not None:
            expr = expr.when(s_only, insert_values[c])
        out_cols.append(expr.alias(c))
    return j.filter(keep).select(*out_cols)


def scd2_history(
    df: DataFrame,
    key: str,
    change_col: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Type-2 slowly-changing history: collapse consecutive equal
    ``change_col`` runs per ``key`` (gaps-and-islands) into validity
    intervals.

    Output: ``(key, version_n, <change_col>, valid_from, valid_to,
    n_events, is_current)`` — ``valid_to`` is the next version's
    ``valid_from`` (NULL on the open current version). Two window passes,
    one shuffle on ``key``; total order within a key is
    ``(ts_col, tiebreak)``.
    """
    w_ord = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    brk = (
        F.when(
            F.lag(change_col).over(w_ord) == F.col(change_col), F.lit(0)
        ).otherwise(F.lit(1))
    )
    grp = F.sum("_brk").over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = (
        df.withColumn("_brk", brk)
        .withColumn("_grp", grp)
        .groupBy(key, "_grp")
        .agg(
            F.first(change_col).alias(change_col),
            F.min(ts_col).alias("valid_from"),
            F.count("*").alias("n_events"),
        )
    )
    w_ver = Window.partitionBy(key).orderBy("_grp")
    return (
        islands.withColumn("version_n", F.row_number().over(w_ver))
        .withColumn("valid_to", F.lead("valid_from").over(w_ver))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            key,
            "version_n",
            change_col,
            "valid_from",
            "valid_to",
            "n_events",
            "is_current",
        )
    )
