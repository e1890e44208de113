"""Salted-vs-unsalted skew join A/B (VERDICT r6 next-round #5).

``join_salted_skew`` (the declared correctness query) proves the salt
never changes results and documents its ~2x overhead on UNIFORM keys.
This bench shows the other side: on a deliberately skewed key — one key
owning half the fact rows — salting beats the unsalted sort-merge join
when AQE's runtime skew splitter cannot apply, and the script also runs
AQE's own handling so the decision rule ("AQE first, salt when AQE
can't") is backed by paired numbers, not narration.

Three timed variants of the same inner join + same-key aggregate:
  a) unsalted, AQE skewJoin ON  — Spark's first line of defense;
  b) unsalted, AQE skewJoin OFF — proxy for the cases the splitter
     skips (it refuses to apply when splitting would insert an extra
     shuffle, e.g. a downstream aggregate that requires the join key's
     clustering — exactly the shape here when forceApply is off);
  c) salted (operators/skew.py::salted_join, 16 buckets) + two-phase
     aggregate (partial on (key, salt), final on key).

The dim carries a 120-char payload so its ~25 MB size stays above the
broadcast threshold — a broadcast join has no shuffle to skew and would
make the A/B vacuous.

Usage: python tools/bench_skew_ab.py [rows] [out.json]
Writes one JSON line with the three medians and the task-skew metric
(max/median task time of the join stage, from the Spark status API).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
N_KEYS = 20_000
HOT_SHARE = 0.5
BUCKETS = 16


def main() -> None:
    from pyspark.sql import functions as F

    from connected_data_lake_spark.operators.skew import salted_join
    from connected_data_lake_spark.session import get_spark

    spark = get_spark("cdl-skew-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # fact: HOT_SHARE of rows on key 0, the rest uniform over N_KEYS
    fact = (
        spark.range(N_ROWS)
        .select(
            F.when(F.col("id") % int(1 / HOT_SHARE) == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
            .alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        .persist()
    )
    dim = (
        spark.range(N_KEYS)
        .select(
            F.col("id").alias("k"),
            F.repeat(F.lit("x"), 120).alias("payload"),
            (F.col("id") % 7).alias("grp"),
        )
        .persist()
    )
    fact.count(), dim.count()  # materialize inputs outside the timed window

    def joined_agg(join_out):
        return join_out.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        )

    def run_unsalted():
        return joined_agg(fact.join(dim.hint("merge"), "k"))

    def run_salted():
        out = salted_join(fact, dim, ["k"], buckets=BUCKETS)
        return joined_agg(out)

    def timed(make_df, runs=3):
        make_df().write.format("noop").mode("overwrite").save()  # warm-up
        samples = []
        for _ in range(runs):
            t = time.perf_counter()
            make_df().write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t, 3))
        return samples

    results: dict[str, object] = {
        "metric": "skew_join_ab",
        "n_rows": N_ROWS,
        "n_keys": N_KEYS,
        "hot_share": HOT_SHARE,
        "buckets": BUCKETS,
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["unsalted_aqe_on_sec"] = timed(run_unsalted)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["unsalted_aqe_off_sec"] = timed(run_unsalted)
    results["salted_sec"] = timed(run_salted)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    for key in ("unsalted_aqe_on_sec", "unsalted_aqe_off_sec", "salted_sec"):
        results[key.replace("_sec", "_median")] = statistics.median(results[key])

    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    line = json.dumps(results)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
