"""cdl-spark CLI parity (reference crates/cdl/src/command/{query,copy}.rs):
`query <target> <sql>` prints rows, `cp <from> <to>` restores byte-identical
files; auto-load ingests a fresh tree, `--load never` fails fast."""

from __future__ import annotations

import pathlib

import pytest

from connected_data_lake_spark.cli import main


@pytest.fixture()
def tree(tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    pathlib.Path(src, "empty.txt").write_bytes(b"")
    pathlib.Path(src, "a.txt").write_bytes(b"alpha")
    pathlib.Path(src, "sub", "b.bin").write_bytes(bytes(range(256)) * 8)
    return src


def test_query_auto_loads_and_prints(spark, tree, capsys):
    rc = main(
        [
            "query",
            f"local://{tree}",
            "SELECT name, size FROM rootfs WHERE size IS NOT NULL ORDER BY name",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "a.txt" in out and "b.bin" in out and "empty.txt" in out


def test_query_respects_limit(spark, tree, capsys):
    main(["query", f"local://{tree}", "SELECT name FROM rootfs ORDER BY name", "--limit", "1"])
    out = capsys.readouterr().out
    assert "a.txt" in out
    assert "b.bin" not in out


def test_cp_round_trips_bytes(spark, tree, tmp_path, capsys):
    dst = tmp_path / "dst"
    rc = main(["cp", f"local://{tree}", f"local://{dst}"])
    assert rc == 0
    assert "copied" in capsys.readouterr().out
    for rel in ("empty.txt", "a.txt", "sub/b.bin"):
        assert (dst / rel).read_bytes() == (tree / rel).read_bytes()


def test_load_never_fails_on_missing_table(spark, tmp_path):
    empty = tmp_path / "nothing"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no rootfs table"):
        main(["query", f"local://{empty}", "SELECT 1", "--load", "never"])


def test_set_merges_catalog_knobs(spark, tree):
    # max_chunk_size via --set: the 2 KiB chunking splits b.bin (2048 bytes)
    from connected_data_lake_spark import Cdl
    from connected_data_lake_spark.cli import _parse_sets

    sets = _parse_sets(["max_chunk_size=1024", "fs.custom.knob=v"])
    cdl = Cdl(spark=spark, **sets)
    assert cdl.catalog.max_chunk_size == 1024
    assert cdl.catalog.extra["fs.custom.knob"] == "v"
    fs = cdl.open(f"local://{tree}").load()
    chunks = fs.sql(
        "SELECT count(*) AS n FROM rootfs WHERE name = 'b.bin'"
    ).collect()[0]["n"]
    assert chunks == 2


def test_load_always_reingests_new_files(spark, tree, tmp_path, capsys):
    import pathlib

    main(["query", f"local://{tree}", "SELECT count(*) AS n FROM rootfs WHERE size IS NOT NULL"])
    assert "|  3|" in capsys.readouterr().out
    pathlib.Path(tree, "new.txt").write_bytes(b"late arrival")
    # auto mode reuses the existing table (the new file is not visible)...
    main(["query", f"local://{tree}", "SELECT count(*) AS n FROM rootfs WHERE size IS NOT NULL"])
    assert "|  3|" in capsys.readouterr().out
    # ...and --load always re-ingests the tree
    main(
        [
            "query",
            f"local://{tree}",
            "SELECT count(*) AS n FROM rootfs WHERE size IS NOT NULL",
            "--load",
            "always",
        ]
    )
    assert "|  4|" in capsys.readouterr().out


def test_optimize_delete_vacuum_subcommands(spark, tree, capsys):
    import json

    url = f"local://{tree}"
    # z-order optimize emits the rewrite receipt as one JSON line
    rc = main(["optimize", url, "--zorder-by", "parent,size"])
    assert rc == 0
    receipt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert receipt["files_rewritten"] == receipt["files_total"] > 0

    # SQL-predicate DELETE drops the row and the view follows
    rc = main(["delete", url, "name = 'a.txt'"])
    assert rc == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(["query", url, "SELECT name FROM rootfs ORDER BY name"])
    out = capsys.readouterr().out
    assert "a.txt" not in out and "b.bin" in out

    # default retention (7d) protects the just-written files...
    rc = main(["vacuum", url])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["files_removed"] == 0
    # ...and retention 0 (exclusive access) reclaims the replaced ones
    rc = main(["vacuum", url, "--retention-hours", "0"])
    assert rc == 0
    removed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert removed["files_removed"] > 0


def test_empty_target_gets_url_error(spark):
    """`cdl query "" ...` must fail with open()'s unsupported-URL error,
    not an AttributeError from falling through to a nonexistent args.src
    (ADVICE r5: target truthiness vs command branching)."""
    import pytest

    with pytest.raises(ValueError, match="empty dataset URL"):
        main(["query", "", "SELECT 1"])
