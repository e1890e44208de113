"""Declared relational operator suite (SURVEY.md §2.2-§2.8).

The reference's effective operator surface is "any SQL DataFusion 41
accepts" (the passthrough at reference crates/cdl-fs/src/lib.rs:78-81 plus
the expression feature flags in its Cargo.toml:59-69). Each spec here
declares one capability row with a Spark implementation (DataFrame API for
plan-shaped operators, spark.sql for SQL-syntax surface) and the DuckDB
oracle SQL. Semantics traps (NULL order, fp association, type widening,
dialect drift) are resolved per FIXTURES.md canonicalization rules — see
inline notes on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connected_data_lake_spark.plans import query
from connected_data_lake_spark.sources.tables import load_table, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _sql(spark: SparkSession, sf_dir: str, stmt: str, tables: tuple[str, ...]) -> DataFrame:
    register_views(spark, sf_dir, tables)
    return spark.sql(stmt)


# ---------------------------------------------------------------------------
# Scans / filter / projection (P1-P8, S1-S2) + flagship aggregation
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                           AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                      AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)   AS sum_disc_price,
           ROUND(AVG(l_quantity), 6)                           AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)                      AS avg_price,
           ROUND(AVG(l_discount), 6)                           AS avg_disc,
           COUNT(*)                                            AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: scan→filter→hash-agg→sort.

    Scale notes: partial aggregation happens map-side automatically; the
    shuffle carries only |returnflag × linestatus| groups per partition.
    Filter + column pruning reach the parquet scan (verified via explain).
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.expr("l_shipdate <= CAST('1998-09-01' AS TIMESTAMP_NTZ)"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * l_discount, 6) AS disc_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scan", "filter"),
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown + projection pruning (reference P3-P6 shapes).

    Per-row arithmetic on stored doubles is bitwise-identical across
    engines, so only the explicit ROUND is needed for hash stability.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.expr(
                "l_shipdate >= CAST('1997-01-01' AS TIMESTAMP_NTZ)"
                " AND l_shipdate < CAST('1998-01-01' AS TIMESTAMP_NTZ)"
            )
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("disc_revenue"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "agg_sum_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 25
    """,
    tags=("agg", "scan"),
)
def agg_sum_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped global aggregate (single-row result)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.expr(
            "l_shipdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)"
            " AND l_shipdate < CAST('1997-01-01' AS TIMESTAMP_NTZ)"
        )
        & F.col("l_discount").between(0.04, 0.06)
        & (F.col("l_quantity") < 25)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort", "limit"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT fuses to TakeOrderedAndProject (no global sort) —
    SURVEY §2.6 O4. Unique tiebreak (o_orderkey) makes the top-k stable."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 10
    """,
    tags=("sort", "limit"),
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET support (SURVEY §2.6 O5; Spark 3.4+)."""
    return _sql(
        spark,
        sf_dir,
        "SELECT o_orderkey, o_orderpriority FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 10",
        ("orders",),
    )


@query(
    "orderby_nulls",
    oracle="""
    WITH t AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    SELECT c_custkey, bal
    FROM t
    ORDER BY bal DESC NULLS FIRST, c_custkey
    LIMIT 40
    """,
    tags=("sort",),
)
def orderby_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL ordering (engine defaults differ — SURVEY §2.6 O2)."""
    cust = _t(spark, sf_dir, "customer")
    t = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    return t.orderBy(F.col("bal").desc_nulls_first(), F.col("c_custkey")).limit(40)


# ---------------------------------------------------------------------------
# Joins (J1-J7)
# ---------------------------------------------------------------------------


@query(
    "join_inner_broadcast",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join",),
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, dimension side broadcast (J1).

    At 100 TB the customer dim is small relative to the orders fact —
    broadcasting avoids shuffling the fact table entirely.
    """
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "join_multiway_q5",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("join", "agg"),
)
def join_multiway_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped star join: fact × 4 dims, all dims broadcast (J1 at
    scale: one shuffle-free pass over lineitem after broadcasts)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)"
            " AND o_orderdate < CAST('1998-01-01' AS TIMESTAMP_NTZ)"
        )
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .orderBy("n_name")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0.0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders (J2)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT DISTINCT c_nationkey AS nkey FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nkey FROM supplier)
    SELECT COALESCE(cn.nkey, sn.nkey) AS nkey,
           (cn.nkey IS NOT NULL) AS has_customer,
           (sn.nkey IS NOT NULL) AS has_supplier
    FROM cn FULL OUTER JOIN sn ON cn.nkey = sn.nkey
    ORDER BY nkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with NULL fill on both sides (J2)."""
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey")).distinct()
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey")).distinct()
    joined = cn.alias("cn").join(sn.alias("sn"), F.col("cn.nkey") == F.col("sn.nkey"), "full_outer")
    return joined.select(
        F.coalesce(F.col("cn.nkey"), F.col("sn.nkey")).alias("nkey"),
        F.col("cn.nkey").isNotNull().alias("has_customer"),
        F.col("sn.nkey").isNotNull().alias("has_supplier"),
    ).orderBy("nkey")


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join = EXISTS (J3)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join = NOT EXISTS (J4; declared as NOT EXISTS, never
    NOT IN, to dodge the NULL-semantics trap). The subquery filter keeps
    the result non-trivial at every scale factor."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product on two tiny dims (J5)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name").orderBy("r_name", "n_name")


@query(
    "join_theta_range",
    oracle="""
    SELECT a.p_brand AS brand, COUNT(*) AS n_pairs
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size < b.p_size
    GROUP BY a.p_brand
    ORDER BY brand
    """,
    tags=("join",),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality (theta) self-join (J6). The equi-key (p_brand) keeps it a
    hash join with a residual range predicate — never a full BNLJ. Only
    the pair COUNT survives, so both sides collapse to (brand, size, cnt)
    BEFORE the join (25 brands x 50 sizes vs one row per part) and the
    count becomes sum(cnt_a * cnt_b) — the theta probe runs on the
    size-histogram, not the row population."""
    g = (
        _t(spark, sf_dir, "part")
        .groupBy("p_brand", "p_size")
        .agg(F.count("*").alias("cnt"))
    )
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand")) & (F.col("a.p_size") < F.col("b.p_size")),
        )
        .groupBy(F.col("a.p_brand").alias("brand"))
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("n_pairs"))
        .orderBy("brand")
    )


@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    tags=("join", "subquery"),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (J7)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50
        """,
        ("orders",),
    )


@query(
    "subquery_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
    ORDER BY c_custkey
    """,
    tags=("join", "subquery"),
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (J7; subquery side has no NULLs by construction)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
        ORDER BY c_custkey
        """,
        ("customer", "orders"),
    )


@query(
    "subquery_correlated_exists",
    oracle="""
    SELECT c_custkey
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    ORDER BY c_custkey
    """,
    tags=("join", "subquery"),
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (J7) — decorrelates to a semi join in Catalyst."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        ORDER BY c_custkey
        """,
        ("customer", "orders"),
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
    SELECT c_custkey,
           (SELECT ROUND(MAX(o_totalprice), 2) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS max_order
    FROM customer c
    ORDER BY c_custkey
    """,
    tags=("join", "subquery"),
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (J7); NULL for customers without orders."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey,
               (SELECT ROUND(MAX(o_totalprice), 2) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order
        FROM customer c
        ORDER BY c_custkey
        """,
        ("customer", "orders"),
    )


# ---------------------------------------------------------------------------
# Aggregations (A1-A11)
# ---------------------------------------------------------------------------


@query(
    "agg_global_stats",
    oracle="""
    SELECT COUNT(*)                                   AS n_rows,
           COUNT(DISTINCT l_suppkey)                  AS n_supp,
           ROUND(SUM(l_quantity), 2)                  AS sum_qty,
           ROUND(AVG(l_extendedprice), 6)             AS avg_price,
           MIN(l_extendedprice)                       AS min_price,
           MAX(l_extendedprice)                       AS max_price,
           CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR) AS first_ship,
           CAST(CAST(MAX(l_shipdate) AS DATE) AS VARCHAR) AS last_ship
    FROM lineitem
    """,
    tags=("agg",),
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global COUNT/COUNT DISTINCT/SUM/AVG/MIN/MAX (A1-A2)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct(F.col("l_suppkey")).alias("n_supp"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").cast("date").cast("string").alias("first_ship"),
        F.max("l_shipdate").cast("date").cast("string").alias("last_ship"),
    )


@query(
    "agg_group_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def agg_group_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) per group (A2) — Spark expands distinct
    aggregates; AQE handles the extra shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_distinct(F.col("l_suppkey")).alias("n_supp"),
            F.count_distinct(F.col("l_partkey")).alias("n_part"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_stddev_var",
    oracle="""
    SELECT l_linestatus,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_samp,
           ROUND(STDDEV_POP(l_quantity), 6)  AS sd_pop,
           ROUND(VAR_SAMP(l_quantity), 6)    AS v_samp,
           ROUND(VAR_POP(l_quantity), 6)     AS v_pop
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("agg",),
)
def agg_stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (A3), fp-tolerant via in-query rounding."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_samp"),
            F.round(F.stddev_pop("l_quantity"), 6).alias("sd_pop"),
            F.round(F.var_samp("l_quantity"), 6).alias("v_samp"),
            F.round(F.var_pop("l_quantity"), 6).alias("v_pop"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 6)       AS corr_qp,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS cov_samp,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 4)  AS cov_pop
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORR / COVAR (A4)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_samp"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("cov_pop"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_median_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_quantity, 0.5), 6)       AS median_qty,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 6) AS p25_price,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 6) AS p95_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (A7's exact cousin — approx variants are never
    hash-compared), in the scale-safe shape: Spark's ``percentile()``
    buffers a per-group value→count map in the aggregation buffer, and
    grouping a near-all-distinct column (l_extendedprice) by a 3-value key
    concentrates a whole group's distinct set in one reducer's memory —
    an executor OOM at 100×, not a slow query. The
    :mod:`operators.percentile` plan pre-aggregates (group, value)→count
    (shuffle bounded by per-partition distinct values, map-side combine)
    and interpolates over an external-sort window, so the plan's only
    per-group state is spillable sort runs. Result is bit-identical to
    ``percentile()`` / DuckDB ``quantile_cont()`` (same type-7 linear
    interpolation)."""
    from connected_data_lake_spark.operators.percentile import exact_percentiles

    li = _t(spark, sf_dir, "lineitem")
    # Both measure columns melt into one (flag, which, value) relation so
    # the whole query is ONE scan + ONE count shuffle + ONE window pass
    # (the two-call form scanned lineitem twice — measured 1.9x slower);
    # the irrelevant (column, fraction) combinations cost only a few extra
    # candidate expressions in the window projection.
    melted = li.select(
        "l_returnflag",
        F.explode(
            F.array(
                F.struct(
                    F.lit("q").alias("w"),
                    F.col("l_quantity").cast("double").alias("v"),
                ),
                F.struct(
                    F.lit("p").alias("w"),
                    F.col("l_extendedprice").cast("double").alias("v"),
                ),
            )
        ).alias("x"),
    ).select("l_returnflag", F.col("x.w").alias("w"), F.col("x.v").alias("v"))
    # strategy='bucket': l_extendedprice is near-all-distinct, so the
    # counts pre-aggregation shuffles ~every row and the per-group window
    # sorts whole columns on #groups tasks; the histogram-narrowing pass
    # shuffles only (group, log-bucket) counts and sorts only the span
    # buckets' rows (measured 2.62 s -> see OPTIMIZATION_r14.md; plan gate
    # in tests/test_plan_quality.py keeps the narrow broadcast shape)
    pct = exact_percentiles(
        melted,
        ["l_returnflag", "w"],
        "v",
        [0.5, 0.25, 0.95],
        ["_p50", "_p25", "_p95"],
        strategy="bucket",
    )
    return (
        pct.groupBy("l_returnflag")
        .agg(
            F.round(F.max(F.when(F.col("w") == "q", F.col("_p50"))), 6).alias(
                "median_qty"
            ),
            F.round(F.max(F.when(F.col("w") == "p", F.col("_p25"))), 6).alias(
                "p25_price"
            ),
            F.round(F.max(F.when(F.col("w") == "p", F.col("_p95"))), 6).alias(
                "p95_price"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_d,
           TRUE                      AS approx_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch cardinality (A7, approx_distinct). Approx outputs are
    never hash-compared (FIXTURES.md rule); instead the query itself
    asserts an error contract — |approx - exact| ≤ 5% with a 2% rsd
    sketch (2.5 standard deviations of headroom; the default 5% rsd
    sketch itself exceeded 5% on one group, and the 1% rsd sketch used
    through round 13 costs 3-4x the wall purely in register-array init +
    merge — measured 0.34 s vs 0.11 s for the aggregate alone — for
    headroom the contract does not need). HLL++ is deterministic for a
    given input, so the boolean is stable run-to-run; the 2% sketch's
    actual error was verified ≤ 0.9% on every group at sf0.001/0.01/0.1.
    At scale the sketch is the point: it shuffles O(sketch) per group
    where COUNT(DISTINCT) shuffles every distinct key.

    Plan shape: dedupe (group, key) FIRST, then run both aggregates over
    the deduped set — COUNT(*) there IS the exact distinct count, and the
    sketch over a distinct set estimates the same cardinality. Mixing
    count_distinct with a non-distinct aggregate in one agg forces
    Catalyst's Expand-based rewrite (every row doubled) — measured 2.3x
    slower than the two-step shape."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderpriority", "o_custkey")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("exact_d"),
            F.approx_count_distinct("o_custkey", 0.02).alias("_approx"),
        )
        .select(
            "o_orderpriority",
            "exact_d",
            (
                F.abs(F.col("_approx") - F.col("exact_d"))
                <= 0.05 * F.col("exact_d")
            ).alias("approx_within_5pct"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS exact_p50,
           TRUE AS approx_within_1pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7's sketch half for quantiles: percentile_approx (GK summary,
    accuracy 10000 → rank error ≤ 0.01% of the group) next to the exact
    interpolated median, shipping the error contract as a boolean the
    oracle states as TRUE — the same pattern as agg_approx_distinct.
    At scale the sketch is the default: O(accuracy) state per group in
    the aggregation buffer regardless of distinct values, where the
    exact form needs the counts+window plan (operators/percentile.py).
    The exact side here reuses that scale-safe operator, so this one
    query exhibits both halves of the trade."""
    from connected_data_lake_spark.operators.percentile import exact_percentiles

    li = _t(spark, sf_dir, "lineitem")
    exact = exact_percentiles(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        [0.5],
        ["_exact"],
        strategy="bucket",
    )
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_approx")
    )
    return (
        exact.join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            F.round("_exact", 6).alias("exact_p50"),
            (
                F.abs(F.col("_approx") - F.col("_exact")) <= 0.01 * F.abs(F.col("_exact"))
            ).alias("approx_within_1pct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + GROUPING() (A8)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (A8)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (A8)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        ("lineitem",),
    )


@query(
    "agg_filter_having",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
           CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    HAVING COUNT(*) > 10
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def agg_filter_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER (WHERE ...) clause + HAVING (A9, A10)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
               CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        HAVING COUNT(*) > 10
        ORDER BY l_returnflag
        """,
        ("lineitem",),
    )


@query(
    "agg_array_sorted",
    oracle="""
    SELECT n_regionkey, ARRAY_TO_STRING(LIST_SORT(LIST(n_name)), ',') AS names
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("agg", "array"),
)
def agg_array_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY_AGG with order pinned via array_sort (A6 — collect order is
    nondeterministic in every engine, so it's always sorted before compare).
    The result array is projected through array_join so the boundary type is
    a hashable scalar (the driver's pandas canonicalizer can't sort
    ndarray-typed cells); array semantics stay fully exercised upstream."""
    nation = _t(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names"))
        .orderBy("n_regionkey")
    )


@query(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-level DISTINCT (A11)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Window functions (W1-W5)
# ---------------------------------------------------------------------------


@query(
    "window_row_number",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
      FROM customer) t
    WHERE rn <= 5
    ORDER BY c_mktsegment, rn
    """,
    tags=("window",),
)
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ROW_NUMBER (W1). Unique order key (tiebreak on
    c_custkey) makes assignment deterministic."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           CAST(RANK()       OVER w AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_size DESC)
    ORDER BY p_brand, p_size DESC, p_partkey
    """,
    tags=("window",),
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK/DENSE_RANK with real ties (integer p_size) (W1)."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return part.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
    ).orderBy("p_brand", F.col("p_size").desc(), "p_partkey")


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice - LAG(o_totalprice) OVER w, 6)  AS delta_prev,
           ROUND(LEAD(o_totalprice, 1, 0.0) OVER w, 6)        AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD with default (W2)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 6).alias("delta_prev"),
        F.round(F.lead("o_totalprice", 1, 0.0).over(w), 6).alias("next_price"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate over explicit ROWS frame (W4, W5)."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_sliding_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg3
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
)
def window_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (W5)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 6).alias("avg3"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_ntile_pct",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS INT)      AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6)   AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6)      AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
    tags=("window",),
)
def window_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE / PERCENT_RANK / CUME_DIST (W1). Global window — fine for a
    declared semantics test; large-scale ranking partitions by key."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("o_orderkey")


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey)  OVER w AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST/LAST/NTH_VALUE with the frame spelled out (W3 — the default
    frame ends at CURRENT ROW, which makes LAST_VALUE a trap; never rely
    on it)."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey,
           COUNT(*) OVER (
             ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_close
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric order key (W5). RANGE includes peers, so
    ties in o_totalprice don't break determinism."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               COUNT(*) OVER (
                 ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_close
        FROM orders
        ORDER BY o_orderkey
        """,
        ("orders",),
    )


# ---------------------------------------------------------------------------
# Set operations (§2.7)
# ---------------------------------------------------------------------------


@query(
    "setop_union_all",
    oracle="""
    SELECT c_custkey AS key, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_suppkey AS key, 'supplier' AS src FROM supplier
    ORDER BY src, key
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (DSL union == UNION ALL)."""
    cust = (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("key"))
        .withColumn("src", F.lit("customer"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("key"))
        .withColumn("src", F.lit("supplier"))
    )
    return cust.union(supp).orderBy("src", "key")


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    UNION
    SELECT s_nationkey AS nkey FROM supplier
    ORDER BY nkey
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct)."""
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return cn.union(sn).distinct().orderBy("nkey")


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nkey FROM supplier
    ORDER BY nkey
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct)."""
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return cn.intersect(sn).orderBy("nkey")


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nkey FROM supplier
    ORDER BY nkey
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct)."""
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return cn.subtract(sn).orderBy("nkey")


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity < 3
    INTERSECT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.08
    ORDER BY k
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each key kept min(multiplicity_left,
    multiplicity_right) times (both engines agree)."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") < 3).select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_discount") > 0.08).select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(b).orderBy("k")


@query(
    "setop_except_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity < 4
    EXCEPT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.1
    ORDER BY k
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics: multiplicity_left - multiplicity_right,
    floored at zero."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") < 4).select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_discount") > 0.1).select(F.col("l_suppkey").alias("k"))
    return a.exceptAll(b).orderBy("k")


# ---------------------------------------------------------------------------
# Scalar function families (§2.8)
# ---------------------------------------------------------------------------


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                    AS up,
           LOWER(p_brand)                   AS lo,
           SUBSTR(p_name, 1, 8)             AS sub,
           CAST(LENGTH(p_name) AS INT)      AS len_name,
           REPLACE(p_type, 'O', '0')        AS rep,
           CONCAT_WS('|', p_brand, p_type)  AS cw,
           p_brand || '/' || p_type         AS cat,
           SPLIT_PART(p_name, ' ', 1)       AS first_word,
           LPAD(p_brand, 12, '*')           AS lp,
           RPAD(p_brand, 12, '.')           AS rp,
           TRIM('  ' || p_brand || ' ')     AS trimmed,
           REVERSE(p_name)                  AS rev,
           LEFT(p_name, 3)                  AS l3,
           RIGHT(p_name, 3)                 AS r3,
           REPEAT(LEFT(p_brand, 2), 3)      AS rep3,
           TRANSLATE(p_name, 'aeiou', 'AEIOU') AS tr,
           CAST(INSTR(p_name, 'widget') AS INT) AS pos_widget
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (§2.8 string_expressions)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey,
               UPPER(p_name)                    AS up,
               LOWER(p_brand)                   AS lo,
               SUBSTR(p_name, 1, 8)             AS sub,
               LENGTH(p_name)                   AS len_name,
               REPLACE(p_type, 'O', '0')        AS rep,
               CONCAT_WS('|', p_brand, p_type)  AS cw,
               p_brand || '/' || p_type         AS cat,
               SPLIT_PART(p_name, ' ', 1)       AS first_word,
               LPAD(p_brand, 12, '*')           AS lp,
               RPAD(p_brand, 12, '.')           AS rp,
               TRIM('  ' || p_brand || ' ')     AS trimmed,
               REVERSE(p_name)                  AS rev,
               LEFT(p_name, 3)                  AS l3,
               RIGHT(p_name, 3)                 AS r3,
               REPEAT(LEFT(p_brand, 2), 3)      AS rep3,
               TRANSLATE(p_name, 'aeiou', 'AEIOU') AS tr,
               INSTR(p_name, 'widget')          AS pos_widget
        FROM part
        ORDER BY p_partkey
        """,
        ("part",),
    )


@query(
    "fn_unicode",
    oracle="""
    SELECT p_partkey,
           CAST(LEVENSHTEIN(p_brand, 'Brand#13') AS INT) AS lev,
           CAST(ASCII(p_name) AS INT)                    AS first_cp,
           CHR(65 + p_size % 26)                         AS ch,
           CAST(LENGTH(p_name) AS INT)                   AS clen,
           CAST(COALESCE(LIST_POSITION(
             STRING_SPLIT('Brand#11,Brand#13,Brand#22', ','), p_brand), 0) AS INT) AS fis
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def fn_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode family: levenshtein / ascii / chr / char_length / find_in_set
    (§2.8 — DuckDB lacks find_in_set, so the oracle states it as
    list_position over the split set-string, 0 when absent)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey,
               LEVENSHTEIN(p_brand, 'Brand#13')  AS lev,
               ASCII(p_name)                     AS first_cp,
               CHAR(65 + p_size % 26)            AS ch,
               CHAR_LENGTH(p_name)               AS clen,
               FIND_IN_SET(p_brand, 'Brand#11,Brand#13,Brand#22') AS fis
        FROM part
        ORDER BY p_partkey
        """,
        ("part",),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g')        AS novowel,
           REGEXP_EXTRACT(p_name, '([a-z]+)', 1)             AS first_word,
           REGEXP_MATCHES(p_name, '^[a-m]')                  AS starts_am,
           REGEXP_REPLACE(p_type, '[A-Z]{2}', 'XX', 'g')     AS masked
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "regex"),
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family on POSIX-safe patterns only (Java vs RE2 dialects agree
    on classes, anchors, bounded repeats — no lookaheads, no \\d shorthand).
    NOTE: Spark regexp_replace replaces ALL matches; DuckDB needs the 'g'
    flag to match that."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey,
               REGEXP_REPLACE(p_name, '[aeiou]', '')   AS novowel,
               REGEXP_EXTRACT(p_name, '([a-z]+)', 1)   AS first_word,
               p_name RLIKE '^[a-m]'                   AS starts_am,
               REGEXP_REPLACE(p_type, '[A-Z]{2}', 'XX') AS masked
        FROM part
        ORDER BY p_partkey
        """,
        ("part",),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05)                         AS absdiff,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT)         AS ceil7,
           CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS floor_k,
           ROUND(SQRT(l_extendedprice), 6)                AS sq,
           ROUND(POWER(l_quantity, 2.0), 6)               AS pw,
           ROUND(LN(l_extendedprice), 6)                  AS ln_p,
           ROUND(LOG10(l_extendedprice), 6)               AS log10_p,
           ROUND(EXP(l_discount), 6)                      AS exp_d,
           ROUND(SIN(l_quantity), 6)                      AS sin_q,
           ROUND(ATAN2(l_quantity, 3.0), 6)               AS at2,
           CAST(SIGN(l_discount - 0.05) AS INT)           AS sgn,
           l_orderkey % 7                                 AS mod7,
           GREATEST(l_quantity, l_discount * 100)         AS gr,
           LEAST(l_quantity, l_discount * 100)            AS ls
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (§2.8). libm-backed functions rounded to 1e-6; exact ops
    (abs/ceil/floor/sign/mod) compared raw with type-width casts (Spark
    CEIL(double)->BIGINT vs DuckDB ->DOUBLE). The key-sampled WHERE bounds
    the deterministic global ORDER BY the oracle discipline requires — the
    sort is harness overhead, not operator cost (VERDICT r01 perf note);
    every function still evaluates over the full key range."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT l_orderkey, l_linenumber,
               ABS(l_discount - 0.05)                          AS absdiff,
               CAST(CEIL(l_quantity / 7.0) AS BIGINT)          AS ceil7,
               CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS floor_k,
               ROUND(SQRT(l_extendedprice), 6)                 AS sq,
               ROUND(POWER(l_quantity, 2.0D), 6)               AS pw,
               ROUND(LN(l_extendedprice), 6)                   AS ln_p,
               ROUND(LOG10(l_extendedprice), 6)                AS log10_p,
               ROUND(EXP(l_discount), 6)                       AS exp_d,
               ROUND(SIN(l_quantity), 6)                       AS sin_q,
               ROUND(ATAN2(l_quantity, 3.0D), 6)               AS at2,
               CAST(SIGNUM(l_discount - 0.05) AS INT)          AS sgn,
               l_orderkey % 7                                  AS mod7,
               GREATEST(l_quantity, l_discount * 100)          AS gr,
               LEAST(l_quantity, l_discount * 100)             AS ls
        FROM lineitem
        WHERE l_orderkey % 10 = 0
        ORDER BY l_orderkey, l_linenumber
        """,
        ("lineitem",),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS VARCHAR) AS trunc_month,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)                AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT)               AS mo,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INT)                 AS dy,
           CAST(QUARTER(o_orderdate) AS INT)                          AS qtr,
           CAST(DATE_DIFF('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT)          AS days_since,
           STRFTIME(o_orderdate, '%Y-%m')                             AS ym,
           CAST(MAKE_DATE(2020, 1 + CAST(o_orderkey % 12 AS INT), 15) AS VARCHAR) AS md,
           CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR)            AS plus30,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS VARCHAR)       AS eom
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family (§2.8): trunc/extract/diff/format/make_date.
    Formatting dialects differ (Spark 'yyyy-MM' vs strftime '%Y-%m') — each
    side spells its own pattern, outputs are identical strings. Calendar
    outputs are projected as strings: pandas/arrow round-trips disagree on
    DATE representation between engines, strings never do."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS STRING) AS trunc_month,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)            AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INT)           AS mo,
               CAST(EXTRACT(DAY FROM o_orderdate) AS INT)             AS dy,
               CAST(QUARTER(o_orderdate) AS INT)                      AS qtr,
               DATEDIFF(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS days_since,
               DATE_FORMAT(o_orderdate, 'yyyy-MM')                    AS ym,
               CAST(MAKE_DATE(2020, 1 + CAST(o_orderkey % 12 AS INT), 15) AS STRING) AS md,
               CAST(DATE_ADD(CAST(o_orderdate AS DATE), 30) AS STRING) AS plus30,
               CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS STRING)    AS eom
        FROM orders
        ORDER BY o_orderkey
        """,
        ("orders",),
    )


@query(
    "fn_date_bin",
    oracle="""
    SELECT (epoch_us(ts) // 600000000) * 600 AS bucket_s,
           COUNT(*) AS n,
           ROUND(AVG(value), 6) AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("scalar", "datetime", "events"),
)
def fn_date_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_bin emulation (SURVEY §2.8 datetime note): fixed-width 10-minute
    buckets via integer epoch arithmetic — the declared emulated form.
    Integer DIV (not float division): int64 epochs exceed double mantissa."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.expr("(ts_us DIV 600000000) * 600").alias("bucket_s"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .orderBy("bucket_s")
    )


@query(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           MD5(c_name)    AS h_md5,
           SHA256(c_name) AS h_sha256
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("scalar", "crypto"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crypto digests (§2.8 crypto_expressions) — lowercase hex on both."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2("c_name", 256).alias("h_sha256"),
    ).orderBy("c_custkey")


@query(
    "fn_encoding",
    oracle="""
    SELECT c_custkey,
           BASE64(ENCODE(c_name))              AS b64,
           DECODE(FROM_BASE64(BASE64(ENCODE(c_name)))) AS rt,
           HEX(ENCODE(c_name))                 AS hx
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("scalar", "encoding"),
)
def fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64/hex encode-decode roundtrip (§2.8 encoding_expressions)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey,
               BASE64(CAST(c_name AS BINARY))                        AS b64,
               CAST(UNBASE64(BASE64(CAST(c_name AS BINARY))) AS STRING) AS rt,
               HEX(c_name)                                           AS hx
        FROM customer
        ORDER BY c_custkey
        """,
        ("customer",),
    )


@query(
    "fn_array",
    oracle="""
    SELECT p_partkey,
           ARRAY_TO_STRING([p_size, p_size * 2, 1], ',')               AS arr,
           LIST_CONTAINS([1, 5, 10], p_size % 11)                     AS has_sz,
           CAST(LEN(GENERATE_SERIES(1, 1 + p_size % 5)) AS INT)       AS seq_len,
           GENERATE_SERIES(1, 1 + p_size % 5)[2]                      AS second,
           ARRAY_TO_STRING(LIST_SORT([p_size % 7, p_size % 3, p_size % 5]), ',') AS sorted3,
           ARRAY_TO_STRING([p_brand, p_type], '/')                    AS joined,
           ARRAY_TO_STRING(GENERATE_SERIES(1, 1 + p_size % 5)[1:2], ',') AS first2,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT([1, p_size % 3, 1, p_size % 3])), ',') AS dedup,
           ARRAY_TO_STRING(FLATTEN([[1, 2], [p_size % 4]]), ',')       AS flat
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/nested family (§2.8): construct/contains/length/index/sort/
    join/slice/distinct/flatten. Spark sequence() args cast to BIGINT so the
    element type matches DuckDB's generate_series (BIGINT list); distinct
    results are order-pinned with array_sort. Array-typed outputs are
    projected through ARRAY_JOIN(TRANSFORM(.., cast to string)) so the
    driver's pandas canonicalizer receives hashable scalars — the array ops
    themselves still run; only the boundary type is a string."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey,
               ARRAY_JOIN(TRANSFORM(ARRAY(p_size, p_size * 2, 1), x -> CAST(x AS STRING)), ',') AS arr,
               ARRAY_CONTAINS(ARRAY(1, 5, 10), p_size % 11)              AS has_sz,
               SIZE(SEQUENCE(CAST(1 AS BIGINT), CAST(1 + p_size % 5 AS BIGINT))) AS seq_len,
               ELEMENT_AT(SEQUENCE(CAST(1 AS BIGINT), CAST(1 + p_size % 5 AS BIGINT)), 2) AS second,
               ARRAY_JOIN(TRANSFORM(ARRAY_SORT(ARRAY(p_size % 7, p_size % 3, p_size % 5)), x -> CAST(x AS STRING)), ',') AS sorted3,
               ARRAY_JOIN(ARRAY(p_brand, p_type), '/')                   AS joined,
               ARRAY_JOIN(TRANSFORM(SLICE(SEQUENCE(CAST(1 AS BIGINT), CAST(1 + p_size % 5 AS BIGINT)), 1, 2), x -> CAST(x AS STRING)), ',') AS first2,
               ARRAY_JOIN(TRANSFORM(ARRAY_SORT(ARRAY_DISTINCT(ARRAY(1, p_size % 3, 1, p_size % 3))), x -> CAST(x AS STRING)), ',') AS dedup,
               ARRAY_JOIN(TRANSFORM(FLATTEN(ARRAY(ARRAY(1, 2), ARRAY(p_size % 4))), x -> CAST(x AS STRING)), ',') AS flat
        FROM part
        ORDER BY p_partkey
        """,
        ("part",),
    )


@query(
    "fn_explode_unnest",
    oracle="""
    SELECT p_partkey, UNNEST(GENERATE_SERIES(1, 1 + p_size % 3)) AS x
    FROM part
    ORDER BY p_partkey, x
    """,
    tags=("scalar", "array"),
)
def fn_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST → LATERAL VIEW explode (§2.8 array family)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey, x
        FROM part
        LATERAL VIEW EXPLODE(SEQUENCE(CAST(1 AS BIGINT), CAST(1 + p_size % 3 AS BIGINT))) t AS x
        ORDER BY p_partkey, x
        """,
        ("part",),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k
    FROM events
    ORDER BY event_id
    """,
    tags=("scalar", "json", "events"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction (Spark get_json_object ↔ DuckDB
    json_extract_string) — our extension beyond DataFusion 41 core."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    ).orderBy("event_id")


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END                              AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open')     AS st,
           IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'LOW')  AS prio,
           LEAST(o_totalprice, 100000.0)                    AS capped,
           GREATEST(o_totalprice, 100000.0)                 AS floored
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("scalar", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/IFNULL/LEAST/GREATEST (P7)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 150000 THEN 'mid'
                    ELSE 'low' END                              AS bucket,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'open')     AS st,
               IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'LOW')  AS prio,
               LEAST(o_totalprice, 100000.0)                    AS capped,
               GREATEST(o_totalprice, 100000.0)                 AS floored
        FROM orders
        ORDER BY o_orderkey
        """,
        ("orders",),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice) AS BIGINT)       AS price_int,
           CAST(o_orderkey AS VARCHAR)               AS key_str,
           TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS INT) AS prio_int,
           TRY_CAST(o_orderstatus AS INT)            AS bad_int,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
    FROM orders
    WHERE o_orderkey <= 5000
    ORDER BY o_orderkey
    """,
    tags=("scalar", "cast"),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST / TRY_CAST (P8). double→int goes through FLOOR because the
    engines disagree on bare cast (Spark truncates, DuckDB rounds).
    TRY_CAST is shown succeeding (priority digit) AND returning NULL per
    row (status letter); the failing branch runs on a bounded key range —
    Spark's string→int try-cast failure path raises and catches a JVM
    exception PER ROW (~13 µs/row measured), an anti-pattern to keep off
    full-table hot paths."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice) AS BIGINT)      AS price_int,
               CAST(o_orderkey AS STRING)               AS key_str,
               TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS INT) AS prio_int,
               TRY_CAST(o_orderstatus AS INT)           AS bad_int,
               CAST(CAST(o_orderdate AS DATE) AS STRING) AS date_str
        FROM orders
        WHERE o_orderkey <= 5000
        ORDER BY o_orderkey
        """,
        ("orders",),
    )


# ---------------------------------------------------------------------------
# round-6 additions: TPC-H-shaped compositions + relational surface widening
# (pivot / unpivot / mode / histogram). All enter the driver window directly
# (the round-6 rotation freed 41 slots — plans/__init__.py).
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate  > TIMESTAMP '1997-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped shipping priority: segment-filtered customer dim
    broadcast into orders, orders into lineitem, revenue per open order,
    top 10. Scale shape: customer is the small filtered side (broadcast),
    the orders⋈lineitem join shuffles on the orderkey, the top-10 is
    TakeOrderedAndProject (no global sort materialization). Ordering uses
    the ROUNDED revenue with (o_orderdate, l_orderkey) tiebreaks so the
    engines' fp association order cannot flip ranks."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate < CAST('1997-06-01' AS TIMESTAMP_NTZ)")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate > CAST('1997-06-01' AS TIMESTAMP_NTZ)")
    )
    # dim-first join order: the broadcast segment filter shrinks orders
    # ~5x BEFORE the big shuffle join with lineitem (Catalyst keeps the
    # user's join tree without CBO stats, so state the cheap order
    # explicitly — measured 5.1 s -> 2.5 s at sf0.1)
    building_orders = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        li.join(building_orders, li.l_orderkey == building_orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "scan"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped forecast revenue: the pure pushdown showcase — a
    selective conjunctive filter and a global 2-column aggregate, no
    groupBy, no join. The plan must be scan(PushedFilters on shipdate) →
    partial agg → single-row final agg; the scan reads only 4 columns of
    lineitem (ReadSchema pruning)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.expr(
            "l_shipdate >= CAST('1997-01-01' AS TIMESTAMP_NTZ)"
            " AND l_shipdate < CAST('1998-01-01' AS TIMESTAMP_NTZ)"
        )
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "q12_late_lines",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_late,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_finished
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "agg", "datetime"),
)
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped late-shipment analysis (the fixture has no
    l_shipmode/l_receiptdate, so lateness is shipdate ≥ orderdate + 60
    days): join + cross-column INTERVAL predicate + conditional aggregate.
    The date comparison is a residual on the equi-join (never a join
    condition), so the plan stays a plain shuffled hash/merge join on the
    orderkey."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.expr("l_shipdate >= o_orderdate + INTERVAL 60 DAYS"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_late"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("n_finished"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_promo_items,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    tags=("join", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo-revenue share: month-sliced lineitem joined
    to the part dim (broadcast — parts are dimension-sized), conditional
    revenue ratio in one aggregate pass. Rounded at 4 decimals on a
    ~percent-scale ratio so double association order can't flip a bit."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= CAST('1997-03-01' AS TIMESTAMP_NTZ)"
            " AND l_shipdate < CAST('1997-04-01' AS TIMESTAMP_NTZ)"
        )
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
            F.sum(F.when(F.col("p_type") == "PROMO", 1).otherwise(0))
            .cast("bigint")
            .alias("n_promo_items"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "pivot_status_matrix",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2)
             AS f_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg", "pivot"),
)
def pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per (priority × status) as a wide matrix via
    DataFrame.pivot with EXPLICIT pivot values — the at-scale discipline
    (without them Spark runs an extra distinct-collect job over the pivot
    column before planning). The oracle states the equivalent conditional
    aggregation. One shuffle on the groupBy key; empty cells coalesce
    to 0 to match COUNT(CASE)."""
    orders = _t(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            # count(lit(1)): Pivot rejects the star form
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("n_p"),
        F.coalesce(F.col("F_total"), F.lit(0.0)).alias("f_total"),
    ).orderBy("o_orderpriority")


@query(
    "unpivot_nation_metrics",
    oracle="""
    WITH wide AS (
      SELECT n_nationkey, n_name,
             (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)
               AS n_customers,
             (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey)
               AS n_suppliers
      FROM nation
    )
    SELECT n_name, 'n_customers' AS metric, n_customers AS value FROM wide
    UNION ALL
    SELECT n_name, 'n_suppliers' AS metric, n_suppliers AS value FROM wide
    ORDER BY n_name, metric
    """,
    tags=("agg", "unpivot"),
)
def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: a wide per-nation metric row folded to long
    (n_name, metric, value) via DataFrame.unpivot — the inverse of pivot,
    used to normalize wide feature tables before pipeline stages. The wide
    relation itself comes from two broadcast-aggregate joins (counts per
    nation key), not correlated subqueries — the oracle states those as
    scalar subqueries because DuckDB decorrelates them to the same plan."""
    nation = _t(spark, sf_dir, "nation")
    ncust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_customers"))
    )
    nsupp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    wide = (
        nation.join(F.broadcast(ncust), nation.n_nationkey == ncust.k, "left")
        .join(F.broadcast(nsupp), nation.n_nationkey == nsupp.k, "left")
        .select(
            "n_name",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )
    return wide.unpivot(
        ["n_name"], ["n_customers", "n_suppliers"], "metric", "value"
    ).orderBy("n_name", "metric")


@query(
    "agg_mode_pergroup",
    oracle="""
    SELECT p_brand, p_size AS mode_size, cnt AS n_parts
    FROM (
      SELECT p_brand, p_size, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY COUNT(*) DESC, p_size) AS rn
      FROM part GROUP BY p_brand, p_size
    )
    WHERE rn = 1
    ORDER BY p_brand
    """,
    tags=("agg", "window"),
)
def agg_mode_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE per group (most frequent p_size per brand, smallest size wins
    ties): count-then-argmax — the distributed mode recipe, since a true
    mode aggregate can't partial-combine. Shape: one shuffle for the
    (brand, size) counts (map-side combine collapses duplicates first),
    then a window over the tiny counted relation."""
    part = _t(spark, sf_dir, "part")
    counted = part.groupBy("p_brand", "p_size").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("p_brand").orderBy(F.desc("cnt"), "p_size")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("p_size").alias("mode_size"), F.col("cnt").alias("n_parts"))
        .orderBy("p_brand")
    )


@query(
    "agg_histogram_buckets",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("agg",),
)
def agg_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (width_bucket semantics via FLOOR division):
    the single-pass distributed histogram — bucket id is a scan-local
    projection, the aggregate shuffles only |buckets| groups after map-side
    combine. Bucket arithmetic is the same double division in both engines,
    so boundary assignment is bit-identical."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "join_range_binned",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey, o_orderdate AS w_start,
             o_orderdate + INTERVAL 1 DAY AS w_end
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ), c AS (
      SELECT o_orderkey, COUNT(*) AS n_shipped
      FROM iv JOIN lineitem ON l_shipdate >= w_start AND l_shipdate < w_end
      GROUP BY o_orderkey
    )
    SELECT iv.o_orderkey, COALESCE(n_shipped, 0) AS n_shipped
    FROM iv LEFT JOIN c ON iv.o_orderkey = c.o_orderkey
    ORDER BY iv.o_orderkey
    """,
    tags=("join", "range"),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × point RANGE join, binned (operators.temporal.
    interval_point_join): corpus-wide shipments falling inside each 1997
    order's 1-day window — NO key equality, a pure time-range predicate.
    The naive ON-range formulation plans as BroadcastNestedLoop
    (O(orders × lineitem) — the scale-killer); binning to 1-day buckets
    makes it an equi-join on the bucket id with the exact range as a
    residual, the classic time-binned join. DuckDB's IEJoin provides the
    oracle. Left join back to the interval side zero-fills empty windows.
    The point side is pre-filtered to the intervals' total span (every
    interval lies in [1997-01-01, 1998-01-02)) — a semantics-free
    predicate that reaches the parquet scan and keeps out-of-span points
    (7x the span's rows here) off the shuffle entirely; at 100 TB this is
    the partition-pruning predicate an interval join should always
    carry."""
    from connected_data_lake_spark.operators import temporal as TP

    orders = _t(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= CAST('1997-01-01' AS TIMESTAMP_NTZ)"
            " AND o_orderdate < CAST('1998-01-01' AS TIMESTAMP_NTZ)"
        )
    )
    iv = orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("w_start"),
        F.expr("o_orderdate + INTERVAL 1 DAYS").alias("w_end"),
    )
    pts = _t(spark, sf_dir, "lineitem").select("l_shipdate").filter(
        F.expr(
            "l_shipdate >= CAST('1997-01-01' AS TIMESTAMP_NTZ)"
            " AND l_shipdate < CAST('1998-01-02' AS TIMESTAMP_NTZ)"
        )
    )
    # aggregate-before-shuffle: only COUNT survives the join downstream
    # and l_shipdate is day-granular, so collapsing the point side to
    # (distinct value, weight) BEFORE the bucket join shrinks it from
    # ~|lineitem-in-span| rows to ~365 — the range join itself (and its
    # residual filter) is unchanged, each surviving row now carries its
    # multiplicity
    pts = pts.groupBy("l_shipdate").agg(F.count("*").alias("_n"))
    joined = TP.interval_point_join(
        pts, iv, "l_shipdate", "w_start", "w_end", bin_seconds=86_400
    )
    counts = joined.groupBy("o_orderkey").agg(F.sum("_n").alias("n_shipped"))
    return (
        iv.select("o_orderkey")
        .join(counts, "o_orderkey", "left")
        .select("o_orderkey", F.coalesce("n_shipped", F.lit(0)).alias("n_shipped"))
        .orderBy("o_orderkey")
    )


@query(
    "gap_fill_daily",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n_events
      FROM events GROUP BY 1
    ), bounds AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
    ), cal AS (
      SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    )
    SELECT CAST(cal.day AS VARCHAR) AS day, COALESCE(d.n_events, 0) AS n_events
    FROM cal LEFT JOIN d ON cal.day = d.day
    ORDER BY day
    """,
    tags=("datetime", "agg"),
)
def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling / calendar resample: daily event counts
    with missing days zero-filled from a generated calendar spine —
    sequence(min_day, max_day) exploded, left-joined to the aggregate. No
    driver-side date loop: bounds come from a 1-row aggregate crossJoined
    (broadcast) into the explode, so the whole plan is distributed and the
    spine's length is data-driven."""
    ev = _t(spark, sf_dir, "events").select(F.to_date("ts").alias("day"))
    d = ev.groupBy("day").agg(F.count("*").alias("n_events"))
    # bounds straight off the scan: min/max over all days equals min/max
    # over the distinct-day aggregate, but partial-combines map-side with
    # NO day-hash exchange — the previous agg-over-d branch rebuilt the
    # whole per-day aggregation (column pruning made the two d subtrees
    # structurally different, so Catalyst could not ReuseExchange them)
    bounds = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    return (
        cal.join(d, "day", "left")
        # calendar outputs as strings (fn_datetime note): the engines'
        # pandas/arrow DATE round-trips disagree on representation
        .select(
            F.col("day").cast("string").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        .orderBy("day")
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    tags=("agg", "string"),
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered STRING_AGG / LISTAGG: per-region nation names joined in
    sorted order. Spark has no ordered string_agg aggregate — the declared
    recipe is collect_list → array_sort → array_join, which keeps the
    aggregation partial-combinable (lists merge map-side) and makes the
    ordering explicit rather than scan-order-dependent."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


@query(
    "window_cume_pctrank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6)    AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
    tags=("window",),
)
def window_cume_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK + CUME_DIST (SURVEY W1 family completion): relative
    standing of each customer's balance WITHIN its market segment — the
    partition keeps the window distributed (a global ORDER BY window would
    be single-partition, the at-scale antipattern; global quantiles go
    through approx_percentile instead). Unique (acctbal, custkey) ordering
    makes both engines' tie handling irrelevant."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("c_custkey")


@query(
    "topk_per_group",
    oracle="""
    SELECT lang, doc_id, n_chars, rnk
    FROM (
      SELECT lang, doc_id, n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY n_chars DESC, doc_id) AS INT) AS rnk
      FROM documents
    )
    WHERE rnk <= 3
    ORDER BY lang, rnk
    """,
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (3 longest documents per language): the windowed
    rank-filter form. Unlike global top-k (TakeOrderedAndProject), per-
    group top-k shuffles once on the group key and truncates within each
    partition — with AQE the rank<=k filter prunes before the final sort,
    so no partition ever materializes a full group ordering in memory."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    return (
        docs.select(
            "lang", "doc_id", "n_chars", F.row_number().over(w).cast("int").alias("rnk")
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("lang", "rnk")
    )


@query(
    "setop_symmetric_diff",
    oracle="""
    WITH y96 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
    ), y97 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_custkey, 'only_1996' AS side
    FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
    UNION ALL
    SELECT o_custkey, 'only_1997' AS side
    FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96)
    ORDER BY o_custkey, side
    """,
    tags=("setop",),
)
def setop_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference composed from EXCEPT + UNION ALL (customers
    active in exactly one of 1996/1997), each side labeled. Both EXCEPTs
    reuse the same two year-slice aggregates; the distinct sets are
    produced by one scan each with the year predicate pushed down."""
    orders = _t(spark, sf_dir, "orders")

    def year_keys(y: int):
        return (
            orders.filter(
                F.expr(
                    f"o_orderdate >= CAST('{y}-01-01' AS TIMESTAMP_NTZ)"
                    f" AND o_orderdate < CAST('{y + 1}-01-01' AS TIMESTAMP_NTZ)"
                )
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = year_keys(1996), year_keys(1997)
    only96 = y96.exceptAll(y97).withColumn("side", F.lit("only_1996"))
    only97 = y97.exceptAll(y96).withColumn("side", F.lit("only_1997"))
    return only96.unionAll(only97).orderBy("o_custkey", "side")


@query(
    "fn_levenshtein_pairs",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 4
    ORDER BY name_a, name_b
    """,
    tags=("scalar", "string", "similarity"),
)
def fn_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance string similarity (fuzzy entity matching): nation-name
    pairs within Levenshtein distance 4. The self-join is dimension-sized
    (25×25) so the quadratic pair space is fine HERE; corpus-scale fuzzy
    matching goes through the n-gram/LSH blocking operators instead
    (operators/dedup.py) with edit distance as the verify step."""
    nation = _t(spark, sf_dir, "nation")
    a = nation.select(F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_nationkey").alias("kb"), F.col("n_name").alias("name_b"))
    return (
        a.join(b, F.col("ka") < F.col("kb"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= 4)
        .orderBy("name_a", "name_b")
    )


@query(
    "events_gap_stats",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
    FROM g
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("window", "datetime", "events"),
)
def events_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics via LAG over the loader's int64
    epoch-microsecond column (ts_us — float epochs would corrupt int64
    precision): the arrival-pattern profile behind bot/burst detection.
    One shuffle on user_id shared by the window and the aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id", (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us")
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.max("gap_us").cast("bigint").alias("max_gap_us"),
            F.sum("gap_us").cast("bigint").alias("total_gap_us"),
        )
        .orderBy("user_id")
    )


@query(
    "fn_interval_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 MONTH                AS due_ts,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch0,
           CAST(o_orderdate - INTERVAL 36 HOUR AS TIMESTAMP) AS cutoff_ts
    FROM orders
    WHERE o_orderkey <= 5000
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime"),
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL arithmetic family: month addition (calendar-aware),
    LAST_DAY, day-difference from an anchor date, sub-day interval
    subtraction — all scan-local projections."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    return orders.select(
        "o_orderkey",
        F.expr("o_orderdate + INTERVAL 3 MONTHS").alias("due_ts"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("string").alias("month_end"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch0"),
        F.expr("o_orderdate - INTERVAL 36 HOURS").alias("cutoff_ts"),
    ).orderBy("o_orderkey")


@query(
    "join_cooccurrence",
    oracle="""
    WITH lines AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_orders
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, n_orders,
           CAST(ROW_NUMBER() OVER (ORDER BY n_orders DESC, brand_a, brand_b)
                AS INT) AS rnk
    FROM pairs
    QUALIFY rnk <= 15
    ORDER BY rnk
    """,
    tags=("join", "agg"),
)
def join_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top brand pairs appearing in the same
    order — the classic association-mining self-join. Shape: dedupe to
    (order, brand) FIRST (shrinks the self-join quadratically — an order
    with 5 lines of one brand contributes once, not 25 pairs), self-join
    on the orderkey with brand_a < brand_b cutting the symmetric half,
    count per pair, global top-15 via TakeOrderedAndProject with the rank
    window after the limit. Per-order fanout is bounded by basket size, so
    pair volume is O(orders × basket²) — the standard co-occurrence cost,
    partition-parallel on the orderkey."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # Basket form instead of the self-join: collect each order's DISTINCT
    # brands as one sorted set (collect_set dedupes in the aggregation,
    # replacing the standalone DISTINCT), then explode the i<j pairs
    # per basket. Same pair multiset as the a.k = b.k AND brand_a <
    # brand_b self-join, but ONE corpus shuffle (on l_orderkey) instead
    # of two distinct-aggregations plus a sort-merge self-join — the
    # whole shared subtree used to execute twice (no ReusedExchange:
    # plans/r14/z_join_cooccurrence_before.txt shows both BroadcastHashJoin
    # + double-HashAggregate chains). Fanout is still bounded by basket
    # size (the standard co-occurrence cost), generated value-local in
    # the explode instead of through a join.
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
    )
    pairs = (
        baskets.select(F.posexplode("bs").alias("_i", "brand_a"), "bs")
        .select(
            "brand_a",
            F.explode(
                F.slice(F.col("bs"), F.col("_i") + 2, F.size("bs"))
            ).alias("brand_b"),
        )
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_orders"))
    )
    top = pairs.orderBy(F.desc("n_orders"), "brand_a", "brand_b").limit(15)
    w = Window.orderBy(F.desc("n_orders"), "brand_a", "brand_b")
    return top.withColumn("rnk", F.row_number().over(w).cast("int")).orderBy("rnk")


@query(
    "events_funnel_attribution",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id AS view_id, epoch_us(ts) AS vus
      FROM events WHERE event_type = 'view'
    ), c AS (
      SELECT user_id, event_id AS click_id, epoch_us(ts) AS cus
      FROM events WHERE event_type = 'click'
    ), j AS (
      SELECT v.user_id, v.view_id, c.click_id,
             CAST(c.cus - v.vus AS BIGINT) AS latency_us
      FROM v JOIN c ON v.user_id = c.user_id
         AND c.cus >= v.vus AND c.cus <= v.vus + 600000000
    )
    SELECT user_id,
           COUNT(*) AS n_attributed,
           CAST(MIN(latency_us) AS BIGINT) AS min_latency_us,
           CAST(MAX(latency_us) AS BIGINT) AS max_latency_us
    FROM j
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("join", "events", "range"),
)
def events_funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click funnel attribution, batch form — the batch twin of
    streaming/joins.py::attribute_conversions (same semantics the
    stream-stream join computes live, so backfills and the live path
    agree). The user-key equality dominates selectivity, so this is an
    equi-join on user_id with the 10-minute window as a residual — no
    binning needed (contrast join_range_binned, where NO key exists).
    Latency arithmetic on int64 epoch micros — exact, no float epochs."""
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts_us").alias("vus")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("cus"),
    )
    j = v.join(
        c,
        (v.user_id == c.cu)
        & (c.cus >= v.vus)
        & (c.cus <= v.vus + 600 * 1_000_000),
    ).select("user_id", ((F.col("cus") - F.col("vus")).cast("bigint")).alias("latency_us"))
    return (
        j.groupBy("user_id")
        .agg(
            F.count("*").alias("n_attributed"),
            F.min("latency_us").cast("bigint").alias("min_latency_us"),
            F.max("latency_us").cast("bigint").alias("max_latency_us"),
        )
        .orderBy("user_id")
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT)        AS low_byte,
           CAST(o_orderkey | 4096 AS BIGINT)       AS set_bit,
           CAST(xor(o_orderkey, 1365) AS BIGINT)   AS xored,
           CAST(o_orderkey << 3 AS BIGINT)         AS shl3,
           CAST(o_orderkey >> 2 AS BIGINT)         AS shr2,
           CAST(bit_count(o_orderkey) AS INT)      AS popcount
    FROM orders
    WHERE o_orderkey <= 5000
    ORDER BY o_orderkey
    """,
    tags=("scalar", "math"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (§2.8 math completion): AND/OR/XOR, shifts,
    popcount — all exact integer ops, each engine spelling its own
    operator dialect (Spark ^ vs DuckDB xor(); shiftleft() vs <<)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               CAST(o_orderkey & 255 AS BIGINT)          AS low_byte,
               CAST(o_orderkey | 4096 AS BIGINT)         AS set_bit,
               CAST(o_orderkey ^ 1365 AS BIGINT)         AS xored,
               CAST(SHIFTLEFT(o_orderkey, 3) AS BIGINT)  AS shl3,
               CAST(SHIFTRIGHT(o_orderkey, 2) AS BIGINT) AS shr2,
               CAST(BIT_COUNT(o_orderkey) AS INT)        AS popcount
        FROM orders
        WHERE o_orderkey <= 5000
        ORDER BY o_orderkey
        """,
        ("orders",),
    )


@query(
    "fn_string_extras",
    oracle="""
    SELECT p_partkey,
           translate(p_brand, '#0123456789', '-abcdefghij')      AS brand_coded,
           array_to_string(list_transform(string_split(p_name, ' '),
             x -> CASE WHEN length(x) > 0
                       THEN upper(substr(x, 1, 1)) || substr(x, 2)
                       ELSE x END), ' ')                          AS name_title,
           substr(p_type, 1, 2) || 'XY' || substr(p_type, 5)     AS type_overlaid,
           repeat(substr(p_brand, 1, 5), 2)                      AS brand_twice,
           trim('##' || p_brand || '##', '#')                    AS brand_trimmed,
           rpad(p_brand, 12, '*')                                AS brand_padded,
           reverse(p_name)                                       AS name_rev,
           CAST(strpos(p_type, 'ED') AS INT)                     AS pos_ed,
           CAST(bit_length(p_name) AS INT)                       AS name_bits,
           starts_with(p_type, 'STANDARD')                       AS is_standard,
           ends_with(p_type, 'TIN')                              AS is_tin
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def fn_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-family completion (§2.8): translate, initcap, overlay,
    repeat, btrim(chars), rpad, reverse, instr/strpos, bit_length,
    startswith/endswith. p_name is lowercase single-spaced words, so
    DuckDB's per-word title-case emulation (it has no initcap) matches
    Spark initcap exactly; overlay is emulated in the oracle as the
    substr/concat identity it is defined by."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey,
               TRANSLATE(p_brand, '#0123456789', '-abcdefghij')   AS brand_coded,
               INITCAP(p_name)                                    AS name_title,
               OVERLAY(p_type PLACING 'XY' FROM 3 FOR 2)          AS type_overlaid,
               REPEAT(SUBSTR(p_brand, 1, 5), 2)                   AS brand_twice,
               BTRIM('##' || p_brand || '##', '#')                AS brand_trimmed,
               RPAD(p_brand, 12, '*')                             AS brand_padded,
               REVERSE(p_name)                                    AS name_rev,
               CAST(INSTR(p_type, 'ED') AS INT)                   AS pos_ed,
               CAST(BIT_LENGTH(p_name) AS INT)                    AS name_bits,
               STARTSWITH(p_type, 'STANDARD')                     AS is_standard,
               ENDSWITH(p_type, 'TIN')                            AS is_tin
        FROM part
        ORDER BY p_partkey
        """,
        ("part",),
    )


@query(
    "fn_math_extras",
    oracle="""
    WITH v AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CASE WHEN o_orderkey % 7 = 0 THEN CAST('NaN' AS DOUBLE)
                  ELSE o_totalprice END AS maybe_nan
      FROM orders WHERE o_orderkey <= 5000
    )
    SELECT o_orderkey,
           CAST(gcd(o_orderkey, o_custkey) AS BIGINT)             AS gcd_keys,
           CAST(lcm(o_orderkey % 1000, o_custkey % 1000) AS BIGINT) AS lcm_keys,
           CAST(factorial(CAST(o_orderkey % 20 AS INT)) AS BIGINT) AS fact_mod,
           ROUND(CASE WHEN isnan(maybe_nan) THEN -1.0
                      ELSE maybe_nan END, 2)                       AS nan_repaired,
           ROUND(cbrt(o_totalprice), 6)                            AS price_cbrt,
           CAST(sign(o_totalprice - 150000) AS INT)                AS above_mid,
           ROUND(atan2(o_totalprice, o_orderkey + 1), 6)           AS angle,
           ROUND((exp(o_totalprice/100000) - exp(-o_totalprice/100000))/2, 6) AS p_sinh,
           ROUND((exp(o_totalprice/100000) + exp(-o_totalprice/100000))/2, 6) AS p_cosh,
           ROUND((exp(2*o_totalprice/100000) - 1)/(exp(2*o_totalprice/100000) + 1), 6) AS p_tanh
    FROM v
    ORDER BY o_orderkey
    """,
    tags=("scalar", "math"),
)
def fn_math_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-family completion (§2.8): gcd/lcm (Spark lacks both — the
    bounded Euclid fold in :mod:`functions.numeric` runs as a constant-
    length JVM higher-order function, no UDF), factorial, nanvl (DuckDB
    spells it CASE/isnan), cbrt, signum, atan2, and the hyperbolic trio
    (DuckDB lacks sinh/cosh/tanh — the oracle states their exp
    definitions; both sides round to 1e-6)."""
    from connected_data_lake_spark.functions import numeric as NX

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    x = F.col("o_totalprice") / 100000
    maybe_nan = F.when(
        F.col("o_orderkey") % 7 == 0, F.lit(float("nan"))
    ).otherwise(F.col("o_totalprice"))
    return (
        o.select(
            "o_orderkey",
            NX.gcd(F.col("o_orderkey"), F.col("o_custkey")).alias("gcd_keys"),
            NX.lcm(F.col("o_orderkey") % 1000, F.col("o_custkey") % 1000).alias(
                "lcm_keys"
            ),
            F.factorial((F.col("o_orderkey") % 20).cast("int")).alias("fact_mod"),
            F.round(F.nanvl(maybe_nan, F.lit(-1.0)), 2).alias("nan_repaired"),
            F.round(F.cbrt("o_totalprice"), 6).alias("price_cbrt"),
            F.signum(F.col("o_totalprice") - 150000).cast("int").alias("above_mid"),
            F.round(F.atan2(F.col("o_totalprice"), F.col("o_orderkey") + 1), 6).alias(
                "angle"
            ),
            F.round(F.sinh(x), 6).alias("p_sinh"),
            F.round(F.cosh(x), 6).alias("p_cosh"),
            F.round(F.tanh(x), 6).alias("p_tanh"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_datetime_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')                      AS iso_day,
           strftime(o_orderdate, '%m/%d/%Y')                      AS us_day,
           strftime(o_orderdate, '%Y-%j')                         AS year_doy,
           strftime(make_timestamp((1500000000 + o_orderkey)::BIGINT
                                   * 1000000),
                    '%Y-%m-%d %H:%M:%S')                          AS epoch_ts
    FROM orders
    WHERE o_orderkey <= 5000
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime"),
)
def fn_datetime_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime formatting completion (§2.8): date_format / to_char
    (Spark 4 accepts both names; the reference's DataFusion ``to_char``
    maps here) and from_unixtime — numeric-only format tokens so the
    Java and strftime pattern dialects agree byte-for-byte ('DDD'/%j is
    the zero-padded day-of-year in both). The epoch_ts oracle formats a
    NAIVE timestamp built with make_timestamp (micros in UTC) so the
    comparison is independent of the oracle host's session TimeZone —
    to_timestamp returns TIMESTAMPTZ, which strftime renders in local
    time; Spark's side is pinned to UTC by prepare_session."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               DATE_FORMAT(o_orderdate, 'yyyy-MM-dd')             AS iso_day,
               TO_CHAR(o_orderdate, 'MM/dd/yyyy')                 AS us_day,
               DATE_FORMAT(o_orderdate, 'yyyy-DDD')               AS year_doy,
               FROM_UNIXTIME(1500000000 + o_orderkey)             AS epoch_ts
        FROM orders
        WHERE o_orderkey <= 5000
        ORDER BY o_orderkey
        """,
        ("orders",),
    )


@query(
    "fn_array_extras",
    oracle="""
    WITH v AS (
      SELECT l_orderkey, l_linenumber,
             [l_linenumber, CAST(l_suppkey % 10 AS INT),
              CAST(l_partkey % 10 AS INT)] AS arr,
             l_returnflag
      FROM lineitem WHERE l_orderkey <= 1000
    )
    SELECT l_orderkey, l_linenumber,
           CAST(list_position(arr, l_linenumber) AS INT)          AS pos_first,
           ARRAY_TO_STRING(list_filter(arr, x -> x != 0), ',')    AS no_zeros,
           ARRAY_TO_STRING([l_returnflag FOR i IN range(3)], ',') AS flag_thrice,
           arr[2]                                                 AS second_elem
    FROM v
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "array"),
)
def fn_array_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-family completion (§2.8): array_position, array_remove,
    array_repeat, element_at (1-based in both engines; DuckDB spells
    remove as list_filter and repeat as a list comprehension). Array-typed
    outputs are projected through ARRAY_JOIN(TRANSFORM(.., cast to string))
    per the fn_array convention — the driver's pandas canonicalizer needs
    hashable scalars; the array ops themselves still run."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    arr = F.array(
        F.col("l_linenumber"),
        (F.col("l_suppkey") % 10).cast("int"),
        (F.col("l_partkey") % 10).cast("int"),
    )

    def _joined(col):
        return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")

    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.array_position(arr, F.col("l_linenumber")).cast("int").alias("pos_first"),
            _joined(F.array_remove(arr, 0)).alias("no_zeros"),
            _joined(F.array_repeat(F.col("l_returnflag"), 3)).alias("flag_thrice"),
            F.element_at(arr, 2).alias("second_elem"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "fn_misc_null",
    oracle="""
    SELECT c_custkey,
           nullif(c_nationkey, 10)                                AS not_ten,
           ifnull(nullif(c_nationkey, 10), -1)                    AS repaired,
           coalesce(nullif(c_nationkey, 10), -1)                  AS repaired_nvl,
           CASE WHEN nullif(c_nationkey, 10) IS NOT NULL
                THEN 'present' ELSE 'was10' END                   AS presence,
           TRUE                                                   AS key_is_bigint
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("scalar", "misc"),
)
def fn_misc_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling misc family (§2.8): nullif, ifnull, nvl, nvl2, and
    typeof — the last as an in-query contract (engines render type names
    differently, so the DECLARED output is the boolean
    ``typeof(cast) = 'bigint'`` which the oracle states as TRUE, the
    same contract pattern as agg_approx_distinct)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey,
               NULLIF(c_nationkey, 10)                            AS not_ten,
               IFNULL(NULLIF(c_nationkey, 10), -1)                AS repaired,
               NVL(NULLIF(c_nationkey, 10), -1)                   AS repaired_nvl,
               NVL2(NULLIF(c_nationkey, 10), 'present', 'was10')  AS presence,
               TYPEOF(CAST(c_custkey AS BIGINT)) = 'bigint'       AS key_is_bigint
        FROM customer
        ORDER BY c_custkey
        """,
        ("customer",),
    )


@query(
    "q4_priority_late",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "subquery", "tpch"),
)
def q4_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders in one quarter
    with at least one line shipped >60 days after the order date —
    correlated EXISTS planned as a LEFT SEMI join on the order key, with
    the date-window filter pushed to the orders scan. (The test schema
    has no l_commitdate/l_receiptdate; the ship-lag predicate keeps Q4's
    semi-join-with-residual-comparison shape.)"""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        ("orders", "lineitem"),
    )


@query(
    "q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l.l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "topk", "tpch"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    lost revenue on returned lines in one quarter. Customer and nation
    broadcast into the fact join; the final top-20 fuses to
    TakeOrderedAndProject — no global sort materializes."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        # decimal arithmetic: the per-line product and the group sum are
        # EXACT (and therefore order-independent), so the rounded revenue
        # can't flip a cent on float association order — this query's
        # per-customer sums landed exactly on a .xx5 boundary once at
        # sf0.01, which double summation resolves differently per engine
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (1 - F.col("l_discount")).cast("decimal(18,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q18_big_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(b.total_qty, 2) AS total_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "agg", "tpch"),
)
def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose line
    quantities sum past a threshold, joined back to orders + customer.
    The HAVING aggregate runs FIRST (map-side combined on l_orderkey) so
    only qualifying keys flow into the joins — the classic
    reduce-before-join discipline; at scale the `big` relation is tiny
    and broadcasts into the orders fact."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "tpch"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    OR-of-ANDs across both join sides. Catalyst extracts the common
    join key (equi-join on partkey, broadcast part) and keeps the
    disjunction as a post-join residual, while the single-side
    conjuncts it can factor (brand IN, size ranges) push into the part
    scan — the predicate shape this query exists to exercise."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").cast("bigint").alias("n_lines"),
    )


@query(
    "q7_nation_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l.l_discount AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS volume
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    ORDER BY supp_nation, cust_nation, ship_year
    """,
    tags=("join", "tpch"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): cross-border revenue between two
    nations per ship year — the same dimension table joined TWICE under
    different roles (supplier's nation, customer's nation), both
    broadcast, with the inequality between the two roles as a post-join
    residual. Decimal-exact revenue (see q10) so year buckets can't flip
    a cent on sum order."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (1 - F.col("l_discount")).cast("decimal(18,2)")
                ),
                2,
            )
            .cast("double")
            .alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@query(
    "q22_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("join", "subquery", "tpch"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales opportunity): customers with
    above-average positive balance and NO recent orders, rolled up per
    market segment. A scalar subquery (the global average broadcasts as
    a literal after its 1-row aggregate) plus an anti join against the
    date-filtered orders — the filter pushes below the anti join's
    build side. (The test schema has no c_phone, so the original
    country-code grouping becomes the market segment.)"""
    return _sql(
        spark,
        sf_dir,
        """
        WITH avg_bal AS (
          SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
        )
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_custs,
               ROUND(SUM(c.c_acctbal), 2) AS total_bal
        FROM customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.a
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """,
        ("customer", "orders"),
    )


@query(
    "window_share_of_total",
    oracle="""
    WITH rev AS (
      SELECT n_name, r_name,
             ROUND(SUM(c_acctbal), 2) AS nation_balance
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY n_name, r_name
    )
    SELECT n_name, r_name, nation_balance,
           ROUND(nation_balance / SUM(nation_balance) OVER (PARTITION BY r_name), 6)
             AS share_in_region
    FROM rev
    ORDER BY r_name, n_name
    """,
    tags=("window", "agg"),
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio_to_report): each nation's share of its
    region's customer balance — an UNORDERED partition-total window over
    an already-aggregated relation. The window input is |nations| rows
    (the aggregate ran first), so the window cost is trivial by
    construction — the at-scale discipline for share-of-total is always
    aggregate-then-window, never a window over raw fact rows. The share
    divides the ROUNDED balances on both sides, so the quotient's inputs
    are bit-identical across engines before the output rounding."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    rev = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.round(F.sum("c_acctbal"), 2).alias("nation_balance"))
    )
    w = Window.partitionBy("r_name")
    return rev.select(
        "n_name",
        "r_name",
        "nation_balance",
        F.round(F.col("nation_balance") / F.sum("nation_balance").over(w), 6).alias(
            "share_in_region"
        ),
    ).orderBy("r_name", "n_name")


# ---------------------------------------------------------------------------
# TPC-H stragglers (round 8): q13 / q15 / q17 schema-feasible without
# partsupp, plus q8 and q21 (also feasible — q2/q9/q11/q16/q20 remain
# blocked on the missing partsupp fixture). Reference parity: DataFusion
# runs the full TPC-H suite (datafusion/benchmarks), so each feasible
# query shape is a coverage row for §2's join/subquery/agg families.
# ---------------------------------------------------------------------------


@query(
    "q13_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "tpch"),
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    join with the filter ON THE JOIN CONDITION (not a WHERE — customers
    whose only orders are urgent must still appear with c_count = 0),
    then a two-level aggregation. The test schema has no o_comment, so
    the priority predicate stands in for Q13's NOT LIKE comment filter;
    the plan shape — filtered outer join, COUNT of the nullable side,
    re-aggregation of the counts — is Q13's. At scale both sides are
    large: this is a shuffle join on the customer key, and the second
    aggregation input is |customers| rows, trivially small after the
    first."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    c_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("join", "subquery", "agg", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    suppliers whose revenue equals the global max (the view + scalar
    subquery form). Revenue sums in DECIMAL(18,2) so the max-equality
    compare is exact — double sums would make `= MAX(..)` association-
    order-dependent. The revenue relation is |suppliers| rows after one
    map-side-combining aggregation over the date-sliced fact, so both the
    MAX and the self-join are trivially small; supplier broadcast into
    the final join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= CAST('1997-01-01' AS TIMESTAMP_NTZ)"
            " AND l_shipdate < CAST('1997-04-01' AS TIMESTAMP_NTZ)"
        )
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount")).cast("decimal(18,2)")
        ).alias("total_revenue")
    )
    supplier = _t(spark, sf_dir, "supplier")
    max_rev = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == max_rev._mx)
        .join(F.broadcast(supplier), F.col("supplier_no") == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4' AND p_type = 'PROMO'
      AND l_quantity < (SELECT 0.5 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    tags=("join", "subquery", "agg", "tpch"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lines below half
    the part's average quantity, for one brand+type slice. Written as the
    decorrelated plan you'd want at 100 TB: broadcast the filtered part
    dim into ONE scan of lineitem, compute the per-part average over that
    already-part-filtered subset (identical to the correlated per-part
    AVG, since the subquery groups by the same key), then filter — the
    fact table is read once, not once per part, and only lines of the
    ~|brand ∩ type| parts survive past the broadcast join. (0.5×AVG
    rather than TPC-H's 0.2× — the synthetic uniform quantity domain has
    nothing below 0.2×mean.)"""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_type") == "PROMO")
    )
    li = _t(spark, sf_dir, "lineitem")
    lines = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    w = Window.partitionBy("p_partkey")
    return (
        lines.withColumn("_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer,
               nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
            AND p_type = 'PROMO') t
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of
    PROMO-part volume sold into one region's customers, by order year.
    Seven-way star: the only fact-fact shuffle is lineitem ⨝ orders;
    part (type-filtered), supplier, both nation legs, and region all
    broadcast, so the nation label and region filter ride the broadcast
    hash joins. Share = conditional-sum / sum in a single aggregate pass
    (no self-join), rounded at 6 on the ~percent-scale ratio. The
    customer side joins AFTER the fact shuffle on o_custkey — at SF100k
    customer no longer broadcasts, making that the second shuffle; both
    keys are near-uniform so no salt lever is needed."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 75 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 75 DAY)
      AND s_nationkey = n_nationkey AND n_name LIKE 'NATION_1%'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("join", "subquery", "tpch"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept waiting): the sole supplier
    late on a multi-supplier finalized order — EXISTS(another supplier on
    the order) AND NOT EXISTS(another LATE supplier on the order), the
    semi+anti self-join pair on the fact table. The test schema has no
    l_commitdate/l_receiptdate, so "late" is shipped >75 days after the
    order date (the q4_priority_late adaptation); the correlated
    subqueries reference the outer order's o_orderdate, which Catalyst
    decorrelates into semi/anti hash joins keyed on l_orderkey. At scale
    all three lineitem legs shuffle on the same l_orderkey — co-located
    exchanges Spark reuses rather than three independent scans'
    worth of shuffle keys."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 75 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 75 DAY)
          AND s_nationkey = n_nationkey AND n_name LIKE 'NATION_1%'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """,
        ("supplier", "lineitem", "orders", "nation"),
    )


# ---------------------------------------------------------------------------
# TPC-H partsupp family (round 8): q2 / q9 / q11 / q16 / q20. The test
# schema ships no partsupp fixture, so both engines DERIVE the same
# partsupp relation from the shipped part x supplier tables with identical
# integer arithmetic — 4 suppliers per part ((partkey*7 + i*13 + 1) mod
# |supplier|, distinct for every shipped supplier count), integer availqty
# and integer cost so every predicate, equality and aggregate in the five
# query shapes is float-free until the rounded output. The relation is a
# *query-defined view over driver inputs*, not synthesized data: the
# oracle recomputes it from the same parquet, so the correctness gate
# still verifies the join/subquery machinery end-to-end.
# ---------------------------------------------------------------------------

_PARTSUPP_SPARK = """
      SELECT p_partkey AS ps_partkey,
             (p_partkey * 7 + i * 13 + 1) % (SELECT COUNT(*) FROM supplier)
               AS ps_suppkey,
             CAST((p_partkey * 11 + i * 17) % 9999 + 1 AS INT) AS ps_availqty,
             CAST((p_partkey * 31 + i * 19) % 1000 + 1 AS INT) AS ps_supplycost
      FROM part LATERAL VIEW EXPLODE(ARRAY(0, 1, 2, 3)) t AS i
"""

_PARTSUPP_DUCK = """
      SELECT p_partkey AS ps_partkey,
             (p_partkey * 7 + i.i * 13 + 1) % (SELECT COUNT(*) FROM supplier)
               AS ps_suppkey,
             CAST((p_partkey * 11 + i.i * 17) % 9999 + 1 AS INT) AS ps_availqty,
             CAST((p_partkey * 31 + i.i * 19) % 1000 + 1 AS INT) AS ps_supplycost
      FROM part CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) i
"""


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_DUCK})
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
           p_brand, ps_supplycost
    FROM part, supplier, partsupp, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size IN (5, 15, 25, 35, 45)
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps_supplycost)
        FROM partsupp ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
    tags=("join", "subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each selected part, the
    EUROPE supplier(s) offering the region's minimum supply cost — a
    correlated scalar MIN subquery over the same dimensional join as the
    outer block, which Catalyst decorrelates into an aggregate + re-join
    on p_partkey. Integer costs make the min-equality exact; top-100 by
    balance fuses to TakeOrderedAndProject. (p_brand stands in for the
    missing p_mfgr output column.)"""
    return _sql(
        spark,
        sf_dir,
        f"""
        WITH partsupp AS ({_PARTSUPP_SPARK})
        SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
               p_brand, ps_supplycost
        FROM part, supplier, partsupp, nation, region
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size IN (5, 15, 25, 35, 45)
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND ps_supplycost = (
            SELECT MIN(ps_supplycost)
            FROM partsupp ps2, supplier s2, nation n2, region r2
            WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
        """,
        ("part", "supplier", "nation", "region"),
    )


@query(
    "q9_product_profit",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_DUCK})
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))
               - CAST(ps_supplycost * l_quantity AS DECIMAL(18,2)) AS amount
      FROM part, supplier, lineitem, partsupp, orders, nation
      WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
        AND ps_partkey = l_partkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%gear%') t
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier nation
    per order year over one product family — the classic 6-way join where
    lineitem matches partsupp on BOTH keys (partkey, suppkey). Amounts
    subtract in DECIMAL(18,2) so the per-group sums are association-order
    exact; the name filter ('%gear%' — the corpus has no 'green') prunes
    the broadcast part dim before it reaches the fact scan."""
    return _sql(
        spark,
        sf_dir,
        f"""
        WITH partsupp AS ({_PARTSUPP_SPARK})
        SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        FROM (
          SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
                 CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l_discount AS DECIMAL(18,2))
                   - CAST(ps_supplycost * l_quantity AS DECIMAL(18,2)) AS amount
          FROM part, supplier, lineitem, partsupp, orders, nation
          WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
            AND ps_partkey = l_partkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%gear%') t
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
        """,
        ("part", "supplier", "lineitem", "orders", "nation"),
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_DUCK})
    SELECT ps_partkey,
           CAST(SUM(ps_supplycost * ps_availqty) AS BIGINT) AS stock_value
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_7', 'NATION_8')
    GROUP BY ps_partkey
    HAVING SUM(ps_supplycost * ps_availqty) > (
      SELECT SUM(ps_supplycost * ps_availqty) * 0.001
      FROM partsupp, supplier, nation
      WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name IN ('NATION_7', 'NATION_8'))
    ORDER BY stock_value DESC, ps_partkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part stock
    value held by two nations' suppliers, kept only when it exceeds a
    fraction of the GLOBAL total — a HAVING over an uncorrelated scalar
    subquery that re-runs the same aggregate. Integer cost x integer qty
    keeps both sums exact (BIGINT); the 0.001 threshold comparison is one
    identical int-x-double op per group on both engines."""
    return _sql(
        spark,
        sf_dir,
        f"""
        WITH partsupp AS ({_PARTSUPP_SPARK})
        SELECT ps_partkey,
               CAST(SUM(ps_supplycost * ps_availqty) AS BIGINT) AS stock_value
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name IN ('NATION_7', 'NATION_8')
        GROUP BY ps_partkey
        HAVING SUM(ps_supplycost * ps_availqty) > (
          SELECT SUM(ps_supplycost * ps_availqty) * 0.001
          FROM partsupp, supplier, nation
          WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_name IN ('NATION_7', 'NATION_8'))
        ORDER BY stock_value DESC, ps_partkey
        """,
        ("part", "supplier", "nation"),
    )


@query(
    "q16_parts_suppliers",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_DUCK})
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp, part
    WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#4'
      AND p_type NOT LIKE 'PRO%'
      AND p_size IN (1, 4, 7, 10, 15, 20, 25, 30)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    counts per (brand, type, size) cell, excluding one brand, a type
    prefix, and a NOT-IN supplier denylist (negative balance stands in
    for the missing s_comment complaints filter) — COUNT(DISTINCT) over
    a null-rejecting anti-join, the exact Q16 plan.
    """
    return _sql(
        spark,
        sf_dir,
        f"""
        WITH partsupp AS ({_PARTSUPP_SPARK})
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM partsupp, part
        WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#4'
          AND p_type NOT LIKE 'PRO%'
          AND p_size IN (1, 4, 7, 10, 15, 20, 25, 30)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        ("part", "supplier"),
    )


@query(
    "q20_promotion_suppliers",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_DUCK})
    SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part
                             WHERE p_name LIKE 'small%')
          AND ps_availqty > (SELECT 0.5 * SUM(l_quantity) FROM lineitem
                             WHERE l_partkey = ps_partkey
                               AND l_suppkey = ps_suppkey
                               AND l_shipdate >= TIMESTAMP '1997-01-01'
                               AND l_shipdate <  TIMESTAMP '1998-01-01'))
      AND s_nationkey = n_nationkey AND n_name LIKE 'NATION_1%'
    ORDER BY s_name
    """,
    tags=("join", "subquery", "tpch"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers holding more
    than half a year's shipped quantity of any 'small%' part — a
    three-level nested IN whose innermost member is a TWO-COLUMN
    correlated aggregate over the fact table (l_partkey AND l_suppkey),
    the hardest decorrelation in the suite. Pairs with no 1997 shipments
    yield a NULL sum, which `>` rejects identically in both engines.

    The Spark side hand-decorrelates the inner aggregate into a grouped
    join on (partkey, suppkey) — Spark 4's automatic decorrelation of a
    two-column correlated aggregate nested inside IN trips an AQE
    subquery-ordering assertion ("Subquery has not finished"), and the
    grouped-join form is the plan a 100 TB run wants anyway: ONE
    map-side-combined pass over the date-sliced fact instead of a
    re-aggregation per outer pair; the inner join drops no-shipment pairs
    exactly as the NULL comparison does."""
    return _sql(
        spark,
        sf_dir,
        f"""
        WITH partsupp AS ({_PARTSUPP_SPARK}),
        shipped AS (
          SELECT l_partkey, l_suppkey, 0.5 * SUM(l_quantity) AS half_qty
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_partkey, l_suppkey
        )
        SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
        FROM supplier, nation
        WHERE s_suppkey IN (
            SELECT ps_suppkey
            FROM partsupp JOIN shipped
              ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            WHERE ps_partkey IN (SELECT p_partkey FROM part
                                 WHERE p_name LIKE 'small%')
              AND ps_availqty > half_qty)
          AND s_nationkey = n_nationkey AND n_name LIKE 'NATION_1%'
        ORDER BY s_name
        """,
        ("part", "supplier", "lineitem", "nation"),
    )


@query(
    "fn_map_struct",
    oracle="""
    WITH m AS (
      SELECT p_partkey, p_brand, p_size,
             MAP([p_brand, 'sentinel'], [p_size, -1]) AS pm,
             struct_pack(brand := p_brand, half := p_size // 2) AS st
      FROM part
    )
    SELECT p_partkey,
           map_extract(pm, p_brand)[1]                          AS own_size,
           map_extract(pm, 'sentinel')[1]                       AS sentinel_v,
           CAST(cardinality(pm) AS INT)                         AS n_keys,
           array_to_string(list_sort(map_keys(pm)), ',')        AS keys_sorted,
           array_to_string(list_sort(map_values(pm)), ',')      AS vals_sorted,
           st.half                                              AS half_size,
           'brand=' || st.brand || '|half=' || CAST(st.half AS VARCHAR)
                                                                AS struct_str
    FROM m
    ORDER BY p_partkey
    """,
    tags=("scalar", "nested"),
)
def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map + struct nested family (§2.8, the nested-type rows arrays/
    explode/JSON don't cover): map construction, element_at lookup,
    cardinality, map_keys/map_values, named_struct construction and field
    access. Map iteration order is an implementation detail in BOTH
    engines, so key/value lists are sorted before joining to strings, and
    the struct is rendered through an explicit field-by-field concat
    (engine-native struct-to-string formats differ)."""
    return _sql(
        spark,
        sf_dir,
        """
        WITH m AS (
          SELECT p_partkey, p_brand, p_size,
                 MAP(p_brand, p_size, 'sentinel', -1)             AS pm,
                 NAMED_STRUCT('brand', p_brand,
                              'half', p_size DIV 2)               AS st
          FROM part
        )
        SELECT p_partkey,
               ELEMENT_AT(pm, p_brand)                            AS own_size,
               ELEMENT_AT(pm, 'sentinel')                         AS sentinel_v,
               SIZE(pm)                                           AS n_keys,
               ARRAY_JOIN(ARRAY_SORT(MAP_KEYS(pm)), ',')          AS keys_sorted,
               ARRAY_JOIN(TRANSFORM(ARRAY_SORT(MAP_VALUES(pm)),
                                    x -> CAST(x AS STRING)), ',') AS vals_sorted,
               st.half                                            AS half_size,
               CONCAT('brand=', st.brand, '|half=',
                      CAST(st.half AS STRING))                    AS struct_str
        FROM m
        ORDER BY p_partkey
        """,
        ("part",),
    )


@query(
    "agg_hll_partial_merge",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_d,
           TRUE AS merged_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg", "sketch"),
)
def agg_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch REAGGREGATION — the property that makes approximate
    distinct-counting compose at 100 TB: per-day Datasketches HLL
    sketches of customer keys are built independently (as per-partition /
    per-ingest-batch sketches would be), then merged per priority with
    hll_union_agg, and the merged estimate is contract-checked against
    the exact count (≤5%; Datasketches HLL is deterministic for a given
    input set, so the boolean is stable). agg_approx_distinct covers the
    one-shot sketch; this covers the algebra — a rollup store keeps the
    daily sketches and answers ANY date-range distinct query by union,
    never rescanning raw data."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("_day")
    ).agg(F.hll_sketch_agg("o_custkey").alias("_sk"))
    merged = daily.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_approx")
    )
    exact = (
        o.select("o_orderpriority", "o_custkey")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("exact_d"))
    )
    return (
        exact.join(merged, "o_orderpriority")
        .select(
            "o_orderpriority",
            "exact_d",
            (
                F.abs(F.col("_approx") - F.col("exact_d"))
                <= 0.05 * F.col("exact_d")
            ).alias("merged_within_5pct"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE)    AS n,
             SUM(l_quantity)             AS s1,
             SUM(POWER(l_quantity, 2))   AS s2,
             SUM(POWER(l_quantity, 3))   AS s3,
             SUM(POWER(l_quantity, 4))   AS s4
      FROM lineitem
      GROUP BY l_returnflag
    ), m AS (
      SELECT l_returnflag, n, s1 / n AS mu,
             s2 / n - POWER(s1 / n, 2) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * POWER(s1 / n, 3) AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
                    + 6 * POWER(s1 / n, 2) * (s2 / n)
                    - 3 * POWER(s1 / n, 4) AS m4
      FROM s
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT)                    AS n_rows,
           ROUND(m3 / POWER(m2, 1.5), 6)        AS skewness_pop,
           ROUND(m4 / POWER(m2, 2) - 3, 6)      AS kurtosis_excess
    FROM m
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment shape statistics (A3/A4 family completion): population
    skewness g1 = m3/m2^1.5 and excess kurtosis g2 = m4/m2^2 - 3, derived
    from raw power sums on BOTH engines rather than the built-in
    skewness()/kurtosis() aggregates, because Spark returns population
    moments while DuckDB returns bias-corrected sample moments — the
    explicit power-sum spelling pins one definition. l_quantity is a small
    integer column, so every power sum is exactly representable in a
    double and the statistic is bit-deterministic under any partial-agg
    association order (one map-side-combined shuffle, no window)."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(F.pow(q, 2)).alias("s2"),
        F.sum(F.pow(q, 3)).alias("s3"),
        F.sum(F.pow(q, 4)).alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - F.pow(mu, 2)
    m3 = (
        F.col("s3") / F.col("n")
        - 3 * mu * (F.col("s2") / F.col("n"))
        + 2 * F.pow(mu, 3)
    )
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mu * (F.col("s3") / F.col("n"))
        + 6 * F.pow(mu, 2) * (F.col("s2") / F.col("n"))
        - 3 * F.pow(mu, 4)
    )
    return (
        s.select(
            "l_returnflag",
            F.col("n").cast("bigint").alias("n_rows"),
            F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness_pop"),
            F.round(m4 / F.pow(m2, 2) - 3, 6).alias("kurtosis_excess"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_bitwise_bool",
    oracle="""
    SELECT l_returnflag,
           BIT_AND(CAST(l_linenumber AS BIGINT)) AS band,
           BIT_OR(CAST(l_linenumber AS BIGINT))  AS bor,
           BIT_XOR(CAST(l_linenumber AS BIGINT)) AS bxor,
           BOOL_AND(l_quantity > 1)  AS all_multi,
           BOOL_OR(l_discount > 0.09) AS any_deep_discount
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise (BIT_AND/OR/XOR) and boolean (BOOL_AND/OR = EVERY/ANY)
    aggregates per group — the remaining standard-SQL aggregate family the
    suite had not declared. All six combine map-side (commutative and
    associative), one shuffle. XOR over integer line numbers is
    order-insensitive, so values hash-match exactly."""
    li = _t(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber").cast("bigint")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and(ln).alias("band"),
            F.bit_or(ln).alias("bor"),
            F.bit_xor(ln).alias("bxor"),
            F.bool_and(F.col("l_quantity") > 1).alias("all_multi"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        )
        .orderBy("l_returnflag")
    )
