"""DuckDB same-host comparison timings (BASELINE.md §2 contract).

Times every declared query's ORACLE SQL in DuckDB on the identical parquet
inputs and prints one JSON line — context for BENCH.md's comparison column.
DuckDB runs the ANSI formulation single-node with its own optimizer; the
point is an honest same-host, same-data reference, not an apples-to-apples
engine race (Spark pays JVM/shuffle overheads that buy horizontal scale).

    python tools/bench_duckdb.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.oracle_check import duck_connection  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from connected_data_lake_spark.plans import all_specs

    con = duck_connection(args.sf)
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in sorted(all_specs()):
        spec = all_specs()[name]
        if spec.oracle is None:
            continue
        start = time.perf_counter()
        try:
            out = con.sql(spec.oracle).fetchall()
            timings[name] = round(time.perf_counter() - start, 4)
            rows[name] = len(out)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# duckdb error {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "rows": rows,
                "sf": args.sf,
            }
        )
    )


if __name__ == "__main__":
    main()
