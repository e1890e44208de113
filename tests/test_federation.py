"""Cross-format federation: ``Cdl.register_table`` + ``Cdl.sql`` over
Delta/Iceberg/Hudi/parquet views in one session (the round-14
"connected" surface — VERDICT r13 next-round #1)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def cdl(spark):
    from connected_data_lake_spark.filesystem import Cdl

    return Cdl(spark)


@pytest.fixture(scope="module")
def lake_trio(spark, tmp_path_factory):
    """customer→Delta, orders→Iceberg, supplier→Hudi under one root."""
    from connected_data_lake_spark.sources.delta_write import write_delta
    from connected_data_lake_spark.sources.hudi import write_hudi
    from connected_data_lake_spark.sources.iceberg_write import write_iceberg
    from connected_data_lake_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path_factory.mktemp("fedlake"))
    write_delta(
        load_table(spark, sf, "customer").select("c_custkey", "c_nationkey"),
        os.path.join(root, "cust_delta"),
        mode="error",
    )
    write_iceberg(
        load_table(spark, sf, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        os.path.join(root, "ord_iceberg"),
        mode="error",
    )
    write_hudi(
        load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey"),
        os.path.join(root, "supp_hudi"),
        record_key="s_suppkey",
        mode="insert",
    )
    return root, sf


def test_register_each_format_roundtrips_counts(cdl, lake_trio, spark):
    from connected_data_lake_spark.sources.tables import load_table

    root, sf = lake_trio
    cdl.register_table("t_cust", os.path.join(root, "cust_delta"), format="delta")
    cdl.register_table("t_ord", os.path.join(root, "ord_iceberg"), format="iceberg")
    cdl.register_table("t_supp", os.path.join(root, "supp_hudi"), format="hudi")
    assert cdl.sql("SELECT COUNT(*) AS n FROM t_cust").first()["n"] == (
        load_table(spark, sf, "customer").count()
    )
    assert cdl.sql("SELECT COUNT(*) AS n FROM t_ord").first()["n"] == (
        load_table(spark, sf, "orders").count()
    )
    assert cdl.sql("SELECT COUNT(*) AS n FROM t_supp").first()["n"] == (
        load_table(spark, sf, "supplier").count()
    )


def test_cross_format_join_matches_plain_parquet(cdl, lake_trio, spark):
    from connected_data_lake_spark.sources.tables import load_table

    root, sf = lake_trio
    cdl.register_table("j_cust", os.path.join(root, "cust_delta"), format="delta")
    cdl.register_table("j_ord", os.path.join(root, "ord_iceberg"), format="iceberg")
    fed = cdl.sql(
        """
        SELECT c.c_nationkey AS nationkey,
               COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS revenue
        FROM j_ord o JOIN j_cust c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey ORDER BY nationkey
        """
    ).collect()
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("nationkey")
        .collect()
    )
    assert [tuple(r) for r in fed] == [tuple(r) for r in plain]


def test_register_parquet_and_options_are_validated(cdl, lake_trio):
    root, _sf = lake_trio
    cdl.register_table(
        "p_cust", "/root/testdata/sf0.001/customer.parquet", format="parquet"
    )
    assert cdl.sql("SELECT COUNT(*) AS n FROM p_cust").first()["n"] > 0
    with pytest.raises(ValueError, match="identifier"):
        cdl.register_table("bad-name", root, format="parquet")
    with pytest.raises(ValueError, match="reserved"):
        cdl.register_table("rootfs", root, format="parquet")
    with pytest.raises(ValueError, match="reserved"):
        cdl.register_table("rootfs_abc123", root, format="parquet")
    with pytest.raises(ValueError, match="unknown table format"):
        cdl.register_table("t", root, format="xml")
    with pytest.raises(TypeError, match="unknown options"):
        cdl.register_table(
            "t2", os.path.join(root, "cust_delta"), format="delta", bogus=1
        )


def test_hudi_auto_routes_mor(cdl, spark, tmp_path):
    """register_table(format='hudi') must route MERGE_ON_READ tables
    through the log-merging reader, not the COW snapshot reader."""
    from connected_data_lake_spark.localrel import local_df
    from connected_data_lake_spark.sources.hudi import (
        upsert_hudi_mor,
        write_hudi,
    )

    path = str(tmp_path / "mor")
    base = local_df(
        spark, [(1, "a"), (2, "b")], "id bigint, v string"
    )
    write_hudi(base, path, record_key="id", table_type="MERGE_ON_READ")
    upd = local_df(spark, [(2, "b2")], "id bigint, v string")
    upsert_hudi_mor(spark, path, upd, record_key="id")
    cdl.register_table("t_mor", path, format="hudi")
    rows = {
        r["id"]: r["v"]
        for r in cdl.sql("SELECT id, v FROM t_mor").collect()
    }
    assert rows == {1: "a", 2: "b2"}


def test_federated_query_spec_matches_oracle(spark, duck):
    """The declared driver row agrees with its DuckDB oracle at sf0.001."""
    from connected_data_lake_spark.plans import spec_of

    spec = spec_of("federated_lake_formats_join")
    got = [tuple(r) for r in spec.spark(spark, "/root/testdata/sf0.001").collect()]
    want = [tuple(r) for r in duck.sql(spec.oracle).fetchall()]
    assert got == want


def test_external_table_joins_rootfs_dataset(cdl, lake_trio, tmp_path):
    """The full connected story in ONE statement: an external Delta table
    joined against an ingested rootfs dataset's file metadata."""
    import os as _os

    root, _sf = lake_trio
    src = tmp_path / "tree"
    src.mkdir()
    for key in (1, 2, 3):
        (src / f"cust_{key}.txt").write_text("x" * key)
    fs = cdl.open(f"local://{src}")
    fs.load(max_chunk_size=0)
    cdl.register_table("x_cust", _os.path.join(root, "cust_delta"), format="delta")
    rows = cdl.sql(
        f"""
        SELECT r.name, r.size, COUNT(c.c_custkey) AS n
        FROM {fs.view_name} r
        LEFT JOIN x_cust c
          ON c.c_custkey = CAST(regexp_extract(r.name, 'cust_(\\\\d+)', 1) AS BIGINT)
        WHERE r.size IS NOT NULL
        GROUP BY r.name, r.size ORDER BY r.name
        """
    ).collect()
    assert [(r["name"], r["size"], r["n"]) for r in rows] == [
        ("cust_1.txt", 1, 1),
        ("cust_2.txt", 2, 1),
        ("cust_3.txt", 3, 1),
    ]
