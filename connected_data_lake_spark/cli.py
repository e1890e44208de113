"""``cdl-spark`` — command-line parity with the reference's ``cdl`` binary.

Reference surface (crates/cdl/src/args.rs:5-13 — catalog flags + subcommand):

=========================================  ==================================
reference                                  here
=========================================  ==================================
``cdl query <target> <sql>``               ``python -m connected_data_lake_spark
(command/query.rs:9-24; shows 10 rows)       query <target> <sql> [--limit 10]``
``cdl cp <from> <to>``                     ``... cp <from> <to>``
(command/copy.rs:9-21)
``cdl mount`` (linux/FUSE)                 not built — declared-intent-only in
                                           the reference itself (SURVEY §2.12)
(no reference analogue)                    ``... optimize <target>
                                           [--zorder-by c1,c2]`` /
                                           ``... delete <target> <condition>`` /
                                           ``... vacuum <target>`` — the
                                           lakehouse maintenance surface over
                                           the manifest table (sources/
                                           maintenance.py), JSON receipts on
                                           stdout
=========================================  ==================================

Catalog knobs arrive as repeated ``--set key=value`` (the reference flattens
``DatasetCatalog`` into clap flags / env vars, crates/cdl-catalog/src/
lib.rs:34-147; the env path — AWS_* — works identically here via
``DatasetCatalog.from_env``).

Datasets that have never been ingested (a plain local file tree) are loaded
on first use, mirroring the reference's local-scheme streaming loader; pass
``--load always`` to force a re-ingest or ``--load never`` to fail fast on a
missing table.
"""

from __future__ import annotations

import argparse
import sys


def _parse_sets(pairs: list[str] | None) -> dict[str, str]:
    out: dict[str, str] = {}
    for pair in pairs or []:
        key, sep, value = pair.partition("=")
        if not sep or not key:
            raise SystemExit(f"--set expects key=value, got {pair!r}")
        out[key] = value
    return out


def _has_table(fs) -> bool:
    import os

    from connected_data_lake_spark.sources import rootfs as R

    root = R._local_root(fs.path.table_uri)
    if root is not None:
        # local scheme: a plain directory check — probing via a Spark read
        # logged a JVM stack trace for the (expected) missing-table case
        return os.path.isdir(root) and (
            os.path.isdir(os.path.join(root, R._LOG_DIR))
            or any(n.endswith(".parquet") for n in os.listdir(root))
        )
    try:
        fs.table().schema  # forces plan resolution without running a job
        return True
    except Exception:
        return False


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="cdl-spark",
        description="Spark-backed CDL: query or copy a dataset by URL "
        "(local://<abs-path> or s3://<dataset>/<rel>).",
    )
    parser.add_argument(
        "--set",
        action="append",
        metavar="KEY=VALUE",
        dest="sets",
        help="catalog knob, repeatable (e.g. --set s3_endpoint=http://minio:9000 "
        "--set max_chunk_size=65536); unknown keys pass through to Hadoop conf",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    q = sub.add_parser("query", help="run SQL against the dataset's rootfs table")
    q.add_argument("target", help="dataset URL")
    q.add_argument("sql", help="SQL over table `rootfs`")
    q.add_argument(
        "--limit",
        type=int,
        default=10,
        help="rows to print (reference shows 10: command/query.rs:20)",
    )
    q.add_argument(
        "--full-width", action="store_true", help="don't truncate wide columns"
    )

    c = sub.add_parser("cp", help="copy the dataset to another URL")
    c.add_argument("src", help="source dataset URL")
    c.add_argument("dst", help="destination URL")

    o = sub.add_parser(
        "optimize",
        help="layout maintenance: bin-pack small files, or --zorder-by to "
        "re-cluster so zone maps prune on the listed columns",
    )
    o.add_argument("target", help="dataset URL")
    o.add_argument(
        "--zorder-by",
        metavar="COL[,COL...]",
        help="comma-separated clustering columns (omit for plain compaction)",
    )
    o.add_argument(
        "--target-bytes",
        type=int,
        default=128 * 1024 * 1024,
        help="output file size goal (default 128 MiB)",
    )

    d = sub.add_parser(
        "delete", help="row-level DELETE (copy-on-write; only matching files rewritten)"
    )
    d.add_argument("target", help="dataset URL")
    d.add_argument("condition", help="SQL predicate over the rootfs table, e.g. \"parent = '/tmp'\"")

    v = sub.add_parser(
        "vacuum", help="reclaim data files no longer referenced by the current snapshot"
    )
    v.add_argument("target", help="dataset URL")
    v.add_argument(
        "--retention-hours",
        type=float,
        default=None,
        help="only reclaim unreferenced files older than this (default 168; "
        "0 requires exclusive access — concurrent writers' staged-but-"
        "unpublished files look unreferenced and would be deleted)",
    )

    for p in (q, c, o, d, v):
        p.add_argument(
            "--load",
            choices=("auto", "always", "never"),
            default="auto",
            help="ingest the file tree into the rootfs table first "
            "(auto: only when the table doesn't exist yet)",
        )

    args = parser.parse_args(argv)

    # deferred import: --help shouldn't spin up a JVM
    from connected_data_lake_spark import Cdl

    cdl = Cdl(**_parse_sets(args.sets))
    # branch on the command, not truthiness: an empty-string target must
    # reach open() (and fail with ITS message), not fall through to a .src
    # attribute the query/optimize/delete/vacuum namespaces don't have
    src_url = args.src if args.command == "cp" else args.target
    fs = cdl.open(src_url)
    missing = not _has_table(fs)
    if args.load == "always" or (args.load == "auto" and missing):
        fs.load()
    elif missing:  # --load never on an absent table
        raise SystemExit(f"no rootfs table at {src_url}")

    if args.command == "query":
        fs.sql(args.sql).show(args.limit, truncate=not args.full_width)
    elif args.command == "cp":
        fs.copy_to(args.dst)
        print(f"copied {src_url} -> {args.dst}")
    elif args.command == "optimize":
        cols = [c.strip() for c in args.zorder_by.split(",")] if args.zorder_by else None
        _print_json(fs.optimize(zorder_by=cols, target_bytes=args.target_bytes))
    elif args.command == "delete":
        _print_json(fs.delete(args.condition))
    elif args.command == "vacuum":
        kw = {}
        if args.retention_hours is not None:
            kw["retention_hours"] = args.retention_hours
        _print_json({"files_removed": fs.vacuum(**kw)})
    return 0


def _print_json(doc: dict) -> None:
    import json

    print(json.dumps(doc))


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
