"""Capture ``explain("formatted")`` output for declared queries.

Writes ``plans/<round>/<name>_<suffix>.txt`` (default round: r15, override
with ``--round rNN``) for every name given (or every
declared query with ``--all``). The files are the audit artifact for
optimization rounds: plan-shape claims in the round doc point at
these, captured before and after each change.

    python tools/capture_plans.py --suffix before name1 name2 ...
    python tools/capture_plans.py --suffix before --all
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    suffix = "before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    round_dir = "r15"
    if "--round" in args:
        i = args.index("--round")
        round_dir = args[i + 1]
        del args[i : i + 2]
    capture_all = "--all" in args
    names = [a for a in args if not a.startswith("-")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)

    from connected_data_lake_spark.plans import all_specs
    from connected_data_lake_spark.session import get_spark

    spark = get_spark("cdl-spark-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    if capture_all:
        names = sorted(specs)

    for name in names:
        spec = specs.get(name) or specs.get(f"z_{name}")
        if spec is None:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        try:
            df = spec.spark(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"# capture failed: {exc}"
            print(f"# {name}: {exc}", file=sys.stderr)
        path = os.path.join(out_dir, f"{spec.name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
        # release anything the spec persisted during construction
        from connected_data_lake_spark.operators.dedup import (
            release_session_indexes,
        )

        release_session_indexes()


if __name__ == "__main__":
    main()
