"""Event-table (time-series) declared queries — batch-checkable shapes of
the streaming operators (SURVEY §2.10 T3: the reference has no streaming
query engine; these are the Spark-idiomatic equivalents the build mandates,
verified in batch mode against DuckDB; their streaming twins live in
connected_data_lake_spark/streaming/ and are asserted by tests).

Timestamp discipline: events.ts is naive microsecond TIMESTAMP on both
engines (sources/tables.py normalizes Spark's nanosAsLong read), so window
starts/ends compare exactly; bucket arithmetic that must hash-match uses
int64 epoch microseconds (float division would corrupt int64 epochs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connected_data_lake_spark.plans import query
from connected_data_lake_spark.sources.tables import load_table


@query(
    "events_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS win_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS sum_value,
           ROUND(AVG(value), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
    tags=("events", "window"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window per event type (T3). Batch shape
    of ``groupBy(window(ts, '1 hour'))`` — identical code runs under
    Structured Streaming with ``withWatermark`` (streaming/windows.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
        .orderBy("win_start", "event_type")
    )


@query(
    "events_sliding_halfhour",
    oracle="""
    SELECT (epoch_us(ts) // 1800000000 - i) * 1800 AS win_start_s,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS sum_value
    FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS i)
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("events", "window"),
)
def events_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour width, 30-minute slide — every event lands in
    exactly two windows. Output key is the window start in epoch seconds
    (BIGINT: int64-exact on both engines)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            # NTZ has no direct long cast; via TIMESTAMP in the UTC session
            # (prepare_session pins it) the epoch is exact on both engines
            F.col("w.start").cast("timestamp").cast("long").alias("win_start_s"),
            "n_events",
            "sum_value",
        )
        .orderBy("win_start_s")
    )


@query(
    "events_session_gap30m",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS sum_value
    FROM s
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    tags=("events", "window", "session"),
)
def events_session_gap30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user:
    ``session_window`` — [first_event, last_event + gap) with merge
    semantics; the oracle recomputes sessions with the classic
    gaps-and-islands SQL, pinning Spark's half-open boundary (an event at
    exactly prev + gap starts a NEW session)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "events_daily_top_users",
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, user_id,
             ROUND(SUM(value), 6) AS total_value,
             COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
    )
    SELECT day, user_id, total_value, n_events,
           CAST(ROW_NUMBER() OVER (PARTITION BY day
                                   ORDER BY total_value DESC, user_id) AS INT) AS rnk
    FROM d
    QUALIFY rnk <= 3
    ORDER BY day, rnk
    """,
    tags=("events", "window", "topk"),
)
def events_daily_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-rollup shape: daily per-user rollup, then top-3 users per
    day (windowed rank over an event-time tumbling aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.round(F.sum("value"), 6).alias("total_value"), F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("day"), "user_id", "total_value", "n_events")
    )
    w = Window.partitionBy("day").orderBy(F.col("total_value").desc(), "user_id")
    return (
        daily.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .orderBy("day", "rnk")
    )


@query(
    "events_funnel_transitions",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM o
    WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY event_type, next_type
    """,
    tags=("events", "funnel"),
)
def events_funnel_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (funnel edges): LEAD over the
    user timeline, then aggregate the (from, to) edge list."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "next_type")
    )


@query(
    "join_asof_events",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view') WHERE rn = 1
    ), p AS (
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, p.purchase_ts,
           v.ts AS view_ts, ROUND(v.value, 6) AS view_value
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.purchase_ts >= v.ts
    ORDER BY purchase_id
    """,
    tags=("events", "asof"),
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.3 J8 — beyond both the reference and
    DataFusion 41): each purchase picks up the user's most recent 'view'
    event at-or-before purchase time — the point-in-time-correct feature
    lookup shape. Spark side is the union-marker emulation
    (operators/temporal.py::asof_join, one shuffle + sorted window, no
    range-join explosion); the oracle is DuckDB's native ASOF LEFT JOIN.
    Equal-timestamp right rows resolve to the greatest event_id on both
    sides (window tiebreak here, ROW_NUMBER pre-dedup there)."""
    from connected_data_lake_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        p,
        v,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="ts",
        right_cols=["value"],
        tiebreak="event_id",
        prefix="view_",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("view_ts"),
        F.round("view_value", 6).alias("view_value"),
    ).orderBy("purchase_id")


@query(
    "events_trending_topk",
    oracle="""
    WITH c AS (
      SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS window_start_us,
             event_type AS key,
             COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
    )
    SELECT window_start_us, key, n_events,
           CAST(ROW_NUMBER() OVER (PARTITION BY window_start_us
                                   ORDER BY n_events DESC, key) AS INT) AS rank
    FROM c
    QUALIFY rank <= 5
    ORDER BY window_start_us, rank
    """,
    tags=("events", "topk", "streaming-twin"),
)
def events_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming CMS trending operator
    (streaming/trending.py::trending_topk): per-window EXACT top-5 keys by
    count, with the stream's own int64-microsecond bucketing
    (``ts_us - ts_us % window_us`` — identical arithmetic, so the batch
    window_start_us values equal the stream's emission keys bit-for-bit).
    The stream's count-min sketch approximates exactly these counts — the
    pytest parity assertion (tests/test_streaming.py) pins stream == batch
    when sketch width >> distinct keys, the same contract pattern the ANN
    probe queries use for recall. Tie-break (count DESC, key ASC) is
    declared on both sides so ranks are deterministic."""
    ev = load_table(spark, sf_dir, "events")
    win_us = 3_600_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    counts = (
        ev.select((us - us % win_us).alias("window_start_us"), F.col("event_type").alias("key"))
        .groupBy("window_start_us", "key")
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.partitionBy("window_start_us").orderBy(F.desc("n_events"), "key")
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .orderBy("window_start_us", "rank")
    )


@query(
    "events_sessionize_alerts",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, event_id, value, us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    ), e AS (
      SELECT user_id, sid, us, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                ORDER BY us, event_id) AS rn,
             SUM(value) OVER (PARTITION BY user_id, sid ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_sum,
             MIN(us) OVER (PARTITION BY user_id, sid) AS s_start
      FROM s
    )
    SELECT user_id, 'session' AS kind,
           MIN(us) AS session_start_us, MAX(us) AS last_ts_us,
           COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
    FROM e GROUP BY user_id, sid
    UNION ALL
    SELECT user_id, 'alert' AS kind,
           s_start AS session_start_us, us AS last_ts_us,
           CAST(5 AS BIGINT) AS n_events, ROUND(run_sum, 6) AS sum_value
    FROM e WHERE rn = 5
    ORDER BY user_id, session_start_us, kind
    """,
    tags=("events", "session", "streaming-twin"),
)
def events_sessionize_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful streaming sessionizer
    (streaming/stateful.py::sessionize_with_alerts), emitting the SAME
    output relation: one 'session' summary row per 30-minute-gap session
    plus one 'alert' row per session that reaches 5 events, carrying the
    state AS OF the crossing (5th event's timestamp and running value
    sum) — exactly what the streaming operator emits early. Session rule
    mirrors the operator's strict gap (same session while
    ``ts - prev <= gap``; note ``events_session_gap30m`` pins Spark's
    session_window half-open rule, which differs at the exact boundary).
    Gaps-and-islands + per-session running windows; both engines order
    ties by (ts, event_id)."""
    gap_us = 1_800_000_000
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w_ord = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = (
        ev.select("user_id", "event_id", "value", us.alias("us"))
        .withColumn("_prev", F.lag("us").over(w_ord))
        .withColumn(
            "new_s",
            F.when(
                F.col("_prev").isNull() | (F.col("us") - F.col("_prev") > gap_us), 1
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new_s").over(
                w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    w_sess = Window.partitionBy("user_id", "sid").orderBy("us", "event_id")
    w_sess_all = Window.partitionBy("user_id", "sid")
    enriched = (
        marked.withColumn("rn", F.row_number().over(w_sess))
        .withColumn(
            "run_sum",
            F.sum("value").over(
                w_sess.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("s_start", F.min("us").over(w_sess_all))
    )
    sessions = enriched.groupBy("user_id", "sid").agg(
        F.lit("session").alias("kind"),
        F.min("us").alias("session_start_us"),
        F.max("us").alias("last_ts_us"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    alerts = enriched.filter(F.col("rn") == 5).select(
        "user_id",
        F.lit("alert").alias("kind"),
        F.col("s_start").alias("session_start_us"),
        F.col("us").alias("last_ts_us"),
        F.lit(5).cast("long").alias("n_events"),
        F.round("run_sum", 6).alias("sum_value"),
    )
    cols = ["user_id", "kind", "session_start_us", "last_ts_us", "n_events", "sum_value"]
    return (
        sessions.select(*cols)
        .unionAll(alerts.select(*cols))
        .orderBy("user_id", "session_start_us", "kind")
    )


@query(
    "events_rate_anomaly",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type, AVG(c) AS mu, STDDEV_POP(c) AS sd
      FROM h GROUP BY event_type
    )
    SELECT h.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           ROUND(MAX(s.mu), 6) AS mean_hourly,
           CAST(SUM(CASE WHEN s.sd > 0 AND ABS((h.c - s.mu) / s.sd) > 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
           ROUND(MAX(CASE WHEN s.sd > 0 THEN ABS((h.c - s.mu) / s.sd)
                          ELSE 0 END), 6) AS max_abs_z
    FROM h JOIN s ON h.event_type = s.event_type
    GROUP BY h.event_type
    ORDER BY h.event_type
    """,
    tags=("events", "anomaly"),
)
def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-rate anomaly screen per event type: z-score of each
    hour's count against the type's own hourly distribution, counting
    |z| > 2 hours — the telemetry burst/outage detector. Two-pass shape
    (tiny per-type moments broadcast back over the hourly rollup, the
    same discipline as embedding_outlier_zscore); the sd = 0 degenerate
    cohort is pinned to z = 0 on both engines. The hourly rollup is the
    only fact-sized shuffle; everything after is |types × hours|."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count("*").alias("c"))
    s = h.groupBy("event_type").agg(
        F.avg("c").alias("mu"), F.stddev_pop("c").alias("sd")
    )
    z = F.when(
        F.col("sd") > 0, F.abs((F.col("c") - F.col("mu")) / F.col("sd"))
    ).otherwise(F.lit(0.0))
    return (
        h.join(F.broadcast(s), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_hours"),
            F.round(F.max("mu"), 6).alias("mean_hourly"),
            F.sum(F.when(z > 2, 1).otherwise(0)).cast("bigint").alias("n_anomalous"),
            F.round(F.max(z), 6).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


@query(
    "events_user_profile",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS total_value,
           epoch_us(MAX(ts)) AS last_ts_us
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "streaming-twin"),
)
def events_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful streaming lifetime-profile operator
    (streaming/stateful.py::running_user_profile): the FINAL per-user
    state after the whole stream — event count, total value, last-seen
    microsecond timestamp. The streaming side emits this row in update
    mode every micro-batch that touches the user; replaying all batches
    and keeping each user's last emission equals this one aggregation
    (the applyInPandasWithState fold is commutative-summable, so batch
    order can't change the fixpoint). One map-side-combined shuffle on
    user_id; sum rounded at 6 on both engines."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        ev.select("user_id", "value", us.alias("us"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.max("us").alias("last_ts_us"),
        )
        .orderBy("user_id")
    )


@query(
    "events_peak_concurrency",
    oracle="""
    WITH pts AS (
      SELECT ts AS t, 1 AS delta, event_id FROM events
      UNION ALL
      SELECT ts + INTERVAL 5 MINUTE, -1, event_id FROM events
    ), d AS (
      SELECT t, delta, event_id, CAST(t AS DATE) AS day FROM pts
    ), day_tot AS (
      SELECT day, SUM(delta) AS day_sum FROM d GROUP BY day
    ), off AS (
      SELECT day, COALESCE(SUM(day_sum) OVER
               (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS carry
      FROM day_tot
    ), run AS (
      SELECT day, delta,
             SUM(delta) OVER (PARTITION BY day ORDER BY t, delta, event_id
                              ROWS UNBOUNDED PRECEDING) AS run
      FROM d
    )
    SELECT CAST(r.day AS VARCHAR) AS day_str,
           CAST(SUM(CASE WHEN r.delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_starts,
           CAST(MAX(r.run + o.carry) AS BIGINT) AS peak_concurrency
    FROM run r JOIN off o USING (day)
    GROUP BY r.day
    ORDER BY day_str
    """,
    tags=("events", "window"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity per day, treating each event as a 5-minute
    interval: the classic sweep-line — +1/-1 boundary points, running sum,
    max. Scale shape is the pack_sequences two-phase prefix sum: the
    within-day running sum partitions by day (distributed), and the
    cross-day carry (intervals still open at midnight) comes from a
    prefix over the DAY-LEVEL totals — a relation with one row per day,
    never a single-partition window over the event points. Interval
    semantics are [closed, open): at an equal instant the -1 sorts before
    the +1, so back-to-back intervals don't double-count."""
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = ev.select(
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    pts = starts.unionAll(ends).withColumn("day", F.to_date("t"))
    day_tot = pts.groupBy("day").agg(F.sum("delta").alias("day_sum"))
    w_days = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    off = day_tot.select(
        "day",
        F.coalesce(F.sum("day_sum").over(w_days), F.lit(0)).alias("carry"),
    )
    w_in = (
        Window.partitionBy("day")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("run", F.sum("delta").over(w_in))
    return (
        run.join(F.broadcast(off), "day")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
                "n_starts"
            ),
            F.max(F.col("run") + F.col("carry")).alias("peak_concurrency"),
        )
        .select(
            F.col("day").cast("string").alias("day_str"),
            "n_starts",
            "peak_concurrency",
        )
        .orderBy("day_str")
    )


@query(
    "events_ohlc_minutely",
    oracle="""
    WITH m AS (
      SELECT event_type, date_trunc('minute', ts) AS minute, ts, event_id,
             value
      FROM events
    ), w AS (
      SELECT event_type, minute, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, minute
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, minute
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM m
    )
    SELECT event_type, minute,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 6) AS open_v,
           ROUND(MAX(value), 6) AS high_v,
           ROUND(MIN(value), 6) AS low_v,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 6) AS close_v,
           COUNT(*) AS n_events
    FROM w
    GROUP BY event_type, minute
    ORDER BY event_type, minute
    """,
    tags=("events", "timeseries"),
)
def events_ohlc_minutely(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to minutely OHLC bars per event type —
    the hypertable rollup a metrics store continuously maintains. First/
    last are pinned by (ts, event_id) row_number windows (min_by/arg_min
    tie-break order is engine-defined; the explicit total order is not),
    high/low/count are plain aggregates. One shuffle on (type, minute);
    windows partition by the same key, so the exchange is reused."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_type",
        F.date_trunc("minute", "ts").alias("minute"),
        "ts",
        "event_id",
        "value",
    )
    w_a = Window.partitionBy("event_type", "minute").orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", "minute").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    w = m.withColumn("rn_a", F.row_number().over(w_a)).withColumn(
        "rn_d", F.row_number().over(w_d)
    )
    return (
        w.groupBy("event_type", "minute")
        .agg(
            F.round(
                F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6
            ).alias("open_v"),
            F.round(F.max("value"), 6).alias("high_v"),
            F.round(F.min("value"), 6).alias("low_v"),
            F.round(
                F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 6
            ).alias("close_v"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type", "minute")
    )


@query(
    "events_time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day, value,
             epoch_us(LEAD(ts) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT user_id, CAST(day AS VARCHAR) AS day_str,
           ROUND(SUM(value * dt_us) / SUM(dt_us), 6) AS twa_value,
           CAST(COUNT(dt_us) AS BIGINT) AS n_intervals
    FROM e
    WHERE dt_us IS NOT NULL
    GROUP BY user_id, day
    HAVING SUM(dt_us) > 0
    ORDER BY user_id, day_str
    """,
    tags=("events", "timeseries"),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user per-day TIME-weighted average of value (the TimescaleDB
    time_weight shape): each reading holds until the next one, so its
    weight is the gap to the successor in integer epoch microseconds —
    irregular sampling can't bias the mean the way a row-average does.
    One window pass partitioned by (user, day) for the gaps, then a plain
    aggregate; days whose readings all coincide (zero total duration)
    are excluded on both sides."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    e = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "value",
        (F.lead(us).over(w) - us).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return (
        e.groupBy("user_id", "day")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6
            ).alias("twa_value"),
            F.count("dt_us").alias("n_intervals"),
            F.sum("dt_us").alias("_tot"),
        )
        .filter(F.col("_tot") > 0)
        .select(
            "user_id",
            F.col("day").cast("string").alias("day_str"),
            "twa_value",
            "n_intervals",
        )
        .orderBy("user_id", "day_str")
    )


@query(
    "events_value_autocorr",
    oracle="""
    WITH o AS (
      SELECT event_type, value,
             LAG(value, 1) OVER w AS lag1,
             LAG(value, 2) OVER w AS lag2
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)     AS n_events,
           ROUND(CORR(value, lag1), 6)  AS autocorr_lag1,
           ROUND(CORR(value, lag2), 6)  AS autocorr_lag2
    FROM o
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("events", "timeseries"),
)
def events_value_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/lag-2 autocorrelation of the value series per event type —
    the serial-dependence diagnostic a metrics pipeline runs before
    trusting i.i.d. assumptions (change-point detectors, CI widths).
    Plan: one shuffle to (event_type)-partitioned external sort for the
    LAG window, then a map-side-combined CORR aggregate on the same
    partitioning — AQE coalesces the already-partitioned exchange, so the
    window and the groupBy share one shuffle. The (ts, event_id) sort key
    is unique, so lag alignment is deterministic; CORR skips NULL lag
    pairs identically on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        "value",
        F.lag("value", 1).over(w).alias("lag1"),
        F.lag("value", 2).over(w).alias("lag2"),
    )
    return (
        o.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.corr("value", "lag1"), 6).alias("autocorr_lag1"),
            F.round(F.corr("value", "lag2"), 6).alias("autocorr_lag2"),
        )
        .orderBy("event_type")
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH v AS (
      SELECT event_type, ROUND(value, 3) AS value FROM events
    ), med AS (
      SELECT event_type, MEDIAN(value) AS med FROM v GROUP BY event_type
    ), dev AS (
      SELECT v.event_type, v.value, ABS(v.value - med.med) AS adev, med.med
      FROM v JOIN med USING (event_type)
    ), mad AS (
      SELECT event_type, MEDIAN(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(MAX(d.med), 6) AS median_value,
           ROUND(MAX(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    tags=("events", "stats", "timeseries"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly screen per event type: median absolute deviation
    (MAD) outliers — |x - median| > 3 * 1.4826 * MAD, the
    consistency-scaled robust z-score that mean/stddev screens get wrong
    under the very outliers they hunt. Both medians run through the
    scale-safe pre-aggregated exact percentile (operators/percentile.py —
    per-group spillable sort runs, no value buffers) over 3dp-quantized
    values (bounds each group's distinct relation by the value range, the
    PSI discipline); the deviation pass joins the 5-row median relation
    by broadcast. DuckDB MEDIAN = QUANTILE_CONT(0.5), the same type-7
    interpolation."""
    from connected_data_lake_spark.operators.percentile import exact_percentiles

    v = load_table(spark, sf_dir, "events").select(
        "event_type", F.round("value", 3).alias("value")
    )
    med = exact_percentiles(v, ["event_type"], "value", [0.5], ["med"])
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", "value", F.abs(F.col("value") - F.col("med")).alias("adev"), "med"
    )
    mad = exact_percentiles(dev, ["event_type"], "adev", [0.5], ["mad"])
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.max("med"), 6).alias("median_value"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )
