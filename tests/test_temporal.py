"""As-of join operator (point-in-time lookup, SURVEY §2.3 J8 extension)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from connected_data_lake_spark.operators.temporal import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_hand_case(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "a", _ts(20)), (3, "b", _ts(5))],
        "id long, k string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("a", _ts(8), 100, 1.0), ("a", _ts(15), 101, 2.0), ("b", _ts(9), 102, 3.0)],
        "k string, ts timestamp_ntz, event_id long, value double",
    )
    out = {
        r["id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, ["k"], "ts", "ts", ["value"]).collect()
    }
    assert out[1] == (_ts(8), 1.0)  # only the earlier right row qualifies
    assert out[2] == (_ts(15), 2.0)  # latest at-or-before wins
    assert out[3] == (None, None)  # right row is in the future → no match


def test_asof_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame([(1, "a", _ts(10))], "id long, k string, ts timestamp_ntz")
    right = spark.createDataFrame(
        [("a", _ts(10), 7, 7.0), ("a", _ts(10), 9, 9.0), ("a", _ts(3), 1, 1.0)],
        "k string, ts timestamp_ntz, event_id long, value double",
    )
    r = asof_join(
        left, right, ["k"], "ts", "ts", ["value"], tiebreak="event_id"
    ).first()
    # equal timestamp matches (inclusive); greatest tiebreak wins
    assert r["asof_ts"] == _ts(10) and r["asof_value"] == 9.0


def test_asof_struct_keeps_matched_row_consistent(spark):
    # right value NULL on the latest row: per-column last() would mix rows;
    # the struct must carry (ts, value) from the SAME matched row
    left = spark.createDataFrame([(1, "a", _ts(20))], "id long, k string, ts timestamp_ntz")
    right = spark.createDataFrame(
        [("a", _ts(5), 1, 5.0), ("a", _ts(10), 2, None)],
        "k string, ts timestamp_ntz, event_id long, value double",
    )
    r = asof_join(left, right, ["k"], "ts", "ts", ["value"]).first()
    assert r["asof_ts"] == _ts(10) and r["asof_value"] is None


def test_asof_preserves_left_rows_and_columns(spark, sf_dir):
    from connected_data_lake_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(p, v, ["user_id"], "purchase_ts", "ts", ["value"])
    assert out.count() == p.count()  # left join: every purchase survives
    assert set(p.columns) <= set(out.columns)
    # no matched view timestamp may exceed its purchase timestamp
    assert out.filter(F.col("asof_ts") > F.col("purchase_ts")).count() == 0


def test_interval_point_join_matches_brute_force(spark):
    """Binned range join == naive cross-join filter on seeded random data,
    including intervals shorter/longer than the bin, bin-boundary-straddling
    spans, empty intervals, and points exactly at start (inclusive) and
    end (exclusive)."""
    import random

    from connected_data_lake_spark.operators.temporal import interval_point_join

    rng = random.Random(42)
    base = 1_700_000_000
    points = [(i, base + rng.randrange(0, versus := 40_000)) for i in range(300)]
    ivs = []
    for j in range(80):
        s = base + rng.randrange(0, 40_000)
        # zero AND negative lengths: a malformed end<start interval must
        # match nothing and must not explode (sequence(lo, hi) with hi<lo
        # generates a descending sequence — the operator filters these rows
        # before the explode)
        ivs.append(
            (j, s, s + rng.choice([-30_000, -600, -1, 0, 1, 600, 3600, 7200, 20_000]))
        )
    # exact boundary probes: one point at an interval start, one at an end
    points.append((998, ivs[0][1]))
    points.append((999, ivs[1][2]))
    p = spark.createDataFrame(points, "pid int, sec long").select(
        "pid", F.timestamp_seconds("sec").alias("pt")
    )
    iv = spark.createDataFrame(ivs, "iid int, s long, e long").select(
        "iid",
        F.timestamp_seconds("s").alias("ws"),
        F.timestamp_seconds("e").alias("we"),
    )
    got = {
        (r.pid, r.iid)
        for r in interval_point_join(p, iv, "pt", "ws", "we", bin_seconds=3600).collect()
    }
    want = {
        (r.pid, r.iid)
        for r in p.crossJoin(iv)
        .filter((F.col("pt") >= F.col("ws")) & (F.col("pt") < F.col("we")))
        .collect()
    }
    assert got == want and want
    # boundary semantics explicit: start inclusive (unless the interval is
    # empty or reversed), end exclusive
    assert (998, ivs[0][0]) in got or ivs[0][2] <= ivs[0][1]
    assert (999, ivs[1][0]) not in got


def test_interval_point_join_degenerate_fanout_bounded(spark):
    """A reversed interval spanning many bins contributes ZERO exploded rows:
    without the pre-explode guard, sequence(floor(s/w), floor((e-1)/w)) on
    end < start descends across every bucket between the endpoints — on
    dirty data one bad row multiplies into thousands before the residual
    filter discards them."""
    from connected_data_lake_spark.operators.temporal import interval_point_join

    base = 1_700_000_000
    p = spark.createDataFrame(
        [(1, base + 50)], "pid int, sec long"
    ).select("pid", F.timestamp_seconds("sec").alias("pt"))
    # one well-formed interval + one reversed interval spanning ~10k bins
    iv = spark.createDataFrame(
        [(1, base, base + 3600), (2, base + 3_600_000, base)],
        "iid int, s long, e long",
    ).select(
        "iid",
        F.timestamp_seconds("s").alias("ws"),
        F.timestamp_seconds("e").alias("we"),
    )
    out = interval_point_join(p, iv, "pt", "ws", "we", bin_seconds=3600)
    assert [r.iid for r in out.collect()] == [1]
    # the guard removes the degenerate row BEFORE the explode: the physical
    # plan's generator input carries the e>s filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan
