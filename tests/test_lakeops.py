"""Unit tests for operators/lakeops.py (MERGE semantics + SCD2 build)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from connected_data_lake_spark.operators.lakeops import merge_into, scd2_history


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k BIGINT, v STRING, x DOUBLE",
    )


def test_merge_update_delete_insert(spark):
    src = spark.createDataFrame(
        [(1, "U", "a2"), (2, "D", None), (9, "I", "new")],
        "k BIGINT, op STRING, nv STRING",
    )
    out = merge_into(
        _target(spark),
        src,
        on=["k"],
        update_set={"v": F.col("s.nv")},
        delete_when=F.col("s.op") == "D",
        insert_values={
            "k": F.col("s.k"),
            "v": F.col("s.nv"),
            "x": F.lit(0.0),
        },
    )
    got = {r["k"]: (r["v"], r["x"]) for r in out.collect()}
    assert got == {1: ("a2", 10.0), 3: ("c", 30.0), 9: ("new", 0.0)}
    assert out.columns == ["k", "v", "x"]


def test_merge_without_insert_ignores_unmatched_source(spark):
    src = spark.createDataFrame([(9, "zzz")], "k BIGINT, nv STRING")
    out = merge_into(
        _target(spark), src, on=["k"], update_set={"v": F.col("s.nv")}
    )
    assert sorted(r["k"] for r in out.collect()) == [1, 2, 3]


def test_merge_null_safe_key_match(spark):
    t = spark.createDataFrame([(None, "a"), (1, "b")], "k BIGINT, v STRING")
    s = spark.createDataFrame([(None, "A")], "k BIGINT, nv STRING")
    out = merge_into(t, s, on=["k"], update_set={"v": F.col("s.nv")})
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {None: "A", 1: "b"}


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


def test_scd2_islands_and_current_flag(spark):
    rows = [
        (1, 1, _ts(0), "x"),
        (2, 1, _ts(1), "x"),
        (3, 1, _ts(2), "y"),
        (4, 1, _ts(3), "x"),  # x again -> NEW island, not merged with 1-2
        (5, 2, _ts(0), "z"),
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, et STRING"
    )
    out = scd2_history(
        df, key="user_id", change_col="et", ts_col="ts", tiebreak="event_id"
    ).orderBy("user_id", "version_n")
    got = [
        (r["user_id"], r["version_n"], r["et"], r["n_events"],
         r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    ]
    assert got == [
        (1, 1, "x", 2, _ts(0), _ts(2), False),
        (1, 2, "y", 1, _ts(2), _ts(3), False),
        (1, 3, "x", 1, _ts(3), None, True),
        (2, 1, "z", 1, _ts(0), None, True),
    ]


def test_scd2_tiebreak_orders_equal_timestamps(spark):
    # two events at the same ts: event_id breaks the tie, so the island
    # sequence is deterministic
    rows = [(2, 1, _ts(0), "b"), (1, 1, _ts(0), "a")]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, et STRING"
    )
    out = scd2_history(
        df, key="user_id", change_col="et", ts_col="ts", tiebreak="event_id"
    ).orderBy("version_n")
    assert [r["et"] for r in out.collect()] == ["a", "b"]
