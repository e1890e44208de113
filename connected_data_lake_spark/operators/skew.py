"""Skew-resilient join helpers.

AQE's skew-join optimization (`spark.sql.adaptive.skewJoin.enabled`, on in
our sessions) splits oversized shuffle partitions at runtime and is the
first line of defense. Salting is the explicit fallback for the cases AQE
can't fix — a single hot key whose rows must still meet ALL of the other
side's rows for that key (AQE can split the big side's partition, but the
build side's hot-key rows land in one task's hash table regardless).

``salted_join`` implements the standard recipe: the skewed (large) side
gets a uniform random salt in [0, buckets); the small side is exploded
``buckets`` times so every (key, salt) combination exists; the join key
becomes (key, salt). Each hot key's rows then spread across ``buckets``
tasks. Cost: small side replicated ``buckets``×  — keep buckets modest
(8-32) and the small side genuinely small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join resilient to hot keys in ``large``.

    ``rand(seed)`` salts deterministically per run plan; the salt column
    never escapes the join. Supported join types: inner / left (the
    preserved side must be the salted large side — a right/full variant
    would need null-extension dedup across salt buckets).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_large = large.withColumn(SALT, (F.rand(seed) * buckets).cast("int"))
    exploded_small = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted_large.join(exploded_small, [*on, SALT], how).drop(SALT)


def top_keys(df: DataFrame, key_cols: list[str], n: int = 10) -> DataFrame:
    """Key-frequency probe for deciding whether salting is needed:
    the n heaviest join keys with counts (one aggregation, no collect)."""
    return df.groupBy(*key_cols).count().orderBy(F.col("count").desc()).limit(n)
