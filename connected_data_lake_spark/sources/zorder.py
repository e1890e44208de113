"""Z-order (Morton) clustering expression for multi-column data skipping.

Zone maps (sources/zonemap.py) skip a file only when the file's min/max
range for a filtered column is tight. A table sorted by one column has
tight ranges for THAT column and full-width ranges for every other — so a
100 TB table laid out by `date` answers `user_id = ?` by scanning
everything. The classic fix (Delta OPTIMIZE ZORDER, Iceberg sort orders
over truncated keys) is to order rows along a space-filling curve: bucket
each clustered column into 2^bits quantile ranks, interleave the rank bits
into one Morton code, and range-partition + sort the rewrite by that code.
Each output file then covers a small hyper-rectangle of the key space, so
a selective predicate on ANY clustered column prunes most files.

Everything row-wise is a JVM Column expression (a fold over the broadcast
quantile-cut array + shift/mask interleave — whole-stage codegen, no
Python in the path); the only driver-side data is one row of ~2^bits
quantile cuts per column from a SINGLE `percentile_approx` aggregate over
all clustering columns.

Resolution is deliberately coarse: clustering quality only needs the zone
count (2^(bits*ncols) cells) to exceed the file count by a healthy margin,
and the per-row rank cost is the 2^bits-element fold — so the default is
64 buckets/column (4096 cells for 2 columns), not the 1M+ a fine-grained
sort would use. Rank ties within one bucket are broken by the pre-curve
row order, which is irrelevant to zone-map bounds.

The reference's layout story stops at Lance fragment ordering =
append order (crates/cdl-fs/src/lib.rs:822-853 commits fragments as
written); this module is the beyond-reference layout-maintenance leg that
makes the zone maps useful on more than the lead column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: 2^6 quantile buckets per column — see module docstring for why coarse.
DEFAULT_BITS = 6


def _base_expr(df: DataFrame, col: str) -> Column:
    """``col`` as an order-preserving double, for quantile ranking.

    Strings rank by their first-7-byte big-endian integer (order-preserving
    on the prefix — the same truncation trick Iceberg's `truncate`
    transform uses); date/timestamp/numeric cast directly."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.StringType):
        # hex of the utf8 prefix, zero-padded so shorter strings sort first
        return F.conv(F.rpad(F.hex(F.substring(col, 1, 7)), 14, "0"), 16, 10).cast("double")
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType, T.NumericType, T.BooleanType)):
        return F.col(col).cast("double")
    raise ValueError(f"cannot z-order by {col!r}: unsupported type {dt.simpleString()}")


def _rank_expr(base: Column, cuts: list[float]) -> Column:
    """Quantile rank of ``base`` against sorted ``cuts``: #cuts STRICTLY
    below the value, folded JVM-side over the (≤2^bits-element) literal
    array. Strict comparison keeps ranks in [0, 2^bits) — `<=` would
    yield 1..2^bits, whose top value carries an extra bit and shifts every
    z-cell off the power-of-two quadrant grid, so range-partition
    boundaries stop being aligned hyper-rectangles (observed: no pruning
    at all on a clean 2-D grid). NULLs rank 0 — they cluster together at
    the curve's origin."""
    if not cuts:  # all-null / constant column: every row ranks 0
        return F.lit(0).cast("long")
    arr = F.array(*[F.lit(c) for c in cuts])
    return F.coalesce(
        F.aggregate(arr, F.lit(0), lambda acc, cut: acc + F.when(base > cut, 1).otherwise(0)),
        F.lit(0),
    ).cast("long")


def morton_code(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> Column:
    """One interleaved-bit Z-curve position over ``cols``.

    bit i of column c lands at output bit ``i*len(cols) + c`` — the
    standard Morton interleave, built from shift/mask Column terms so the
    whole computation stays inside codegen. ``bits*len(cols)`` must fit a
    signed long (≤63); the default 6 bits allows 10 columns, far beyond
    where z-ordering stops helping (each extra dimension halves every
    file's per-column bounding-box resolution).

    Planning cost: ONE `percentile_approx` aggregate job over the
    clustering columns (a driver-small row of cut lists); execution cost:
    pure codegen per row."""
    if not cols:
        raise ValueError("z-order needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} columns exceeds a signed long")
    n = 1 << bits
    probs = F.array(*[F.lit((i + 1) / n) for i in range(n - 1)])
    bases = {c: _base_expr(df, c) for c in cols}
    cut_row = df.agg(
        *[F.percentile_approx(b, probs, 10_000).alias(f"c{i}") for i, (c, b) in enumerate(bases.items())]
    ).first()
    code = F.lit(0).cast("long")
    for ci, (c, base) in enumerate(bases.items()):
        cuts = sorted({v for v in (cut_row[f"c{ci}"] or []) if v is not None})
        rank = _rank_expr(base, cuts)
        for bi in range(bits):
            code = code + F.shiftleft(
                F.shiftright(rank, bi).bitwiseAND(F.lit(1)), bi * len(cols) + ci
            )
    return code
