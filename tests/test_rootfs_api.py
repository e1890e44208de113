"""CdlFS public API round-trip: ingestion (S3), chunking (§1.1), canned
queries (P1-P5/O1), len UDF (U1), copy_to (S5/S6) byte-fidelity."""

from __future__ import annotations

import os
import pathlib

import pytest

from connected_data_lake_spark import Cdl


@pytest.fixture()
def tree(tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    pathlib.Path(src, "empty.txt").write_bytes(b"")
    pathlib.Path(src, "small.txt").write_bytes(b"hello world")
    pathlib.Path(src, "sub", "big.bin").write_bytes(os.urandom(10_000))
    return src


def test_ingest_lists_all_files(spark, tree):
    fs = Cdl(spark=spark).open(f"local://{tree}")
    fs.load()
    names = {r["name"] for r in fs.read_dir_all().collect()}
    assert names == {"empty.txt", "small.txt", "big.bin"}


def test_chunking_one_row_per_chunk_metadata_on_head(spark, tree):
    fs = Cdl(spark=spark).open(f"local://{tree}")
    fs.load(max_chunk_size=4096)
    rows = fs.sql(
        "SELECT name, size, chunk_id, chunk_size FROM rootfs "
        "WHERE name = 'big.bin' ORDER BY chunk_id"
    ).collect()
    # 10000 bytes / 4096 → 3 chunks; size only on the head chunk (§1.1)
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert rows[0]["size"] == 10_000
    assert [r["size"] for r in rows[1:]] == [None, None]
    assert sum(r["chunk_size"] for r in rows) == 10_000


def test_read_dir_drops_payload_and_non_head_chunks(spark, tree):
    fs = Cdl(spark=spark).open(f"local://{tree}")
    fs.load(max_chunk_size=4096)
    rows = fs.read_dir("sub").collect()
    assert [r["name"] for r in rows] == ["big.bin"]  # one row per FILE
    assert bytes(rows[0]["data"]) == b""  # P1 zero-byte literal


def test_len_udf_and_condition_splice(spark, tree):
    fs = Cdl(spark=spark).open(f"local://{tree}")
    fs.load()
    rows = fs.sql(
        "SELECT name, len(data) AS n FROM rootfs WHERE size IS NOT NULL ORDER BY name"
    ).collect()
    assert {(r["name"], r["n"]) for r in rows} == {
        ("empty.txt", 0),
        ("small.txt", 11),
        ("big.bin", 10_000),
    }
    assert fs.read_files("name LIKE '%.txt' AND size IS NOT NULL").count() == 2


@pytest.mark.parametrize("chunk", [0, 4096])
def test_copy_to_restores_bytes(spark, tree, tmp_path, chunk):
    dst = tmp_path / f"dst{chunk}"
    fs = Cdl(spark=spark).open(f"local://{tree}")
    fs.load(max_chunk_size=chunk)
    fs.copy_to(f"local://{dst}")
    for rel in ["empty.txt", "small.txt", "sub/big.bin"]:
        assert (
            pathlib.Path(dst, rel).read_bytes() == pathlib.Path(tree, rel).read_bytes()
        ), rel


def test_variadic_len_matches_reference_first_arg_semantics(spark, tree):
    """Reference len is Variadic(Binary) but its kernel reads only arg 0
    (len.rs:20-84) — multi-arg calls must work and equal the unary form."""
    fs = Cdl(spark=spark).open(f"local://{tree}")
    fs.load()
    rows = fs.sql(
        "SELECT name, len(data, data) AS n, len(data) AS n1 FROM rootfs "
        "WHERE name = 'small.txt'"
    ).collect()
    assert rows[0]["n"] == rows[0]["n1"] == 11


def test_rewrite_variadic_len_surgical():
    from connected_data_lake_spark.functions import rewrite_variadic_len as rw

    # untouched: unary call, other idents, string literals
    assert rw("SELECT len(data) FROM t") == "SELECT len(data) FROM t"
    assert rw("SELECT length(a, b) FROM t") == "SELECT length(a, b) FROM t"
    assert rw("SELECT 'len(a, b)' FROM t") == "SELECT 'len(a, b)' FROM t"
    assert rw("SELECT mylen(a, b) FROM t") == "SELECT mylen(a, b) FROM t"
    # rewritten: extra args dropped, nested parens/commas respected
    assert rw("SELECT len(a, b) FROM t") == "SELECT len(a) FROM t"
    assert rw("SELECT LEN(f(x, y), b, c)") == "SELECT len(f(x, y))"
    assert rw("SELECT len(concat(a, ','), b)") == "SELECT len(concat(a, ','))"
    # nested variadic call inside the kept argument is rewritten too
    assert rw("SELECT len(len(a, b), c)") == "SELECT len(len(a))"
    # opaque spans (ADVICE r9): backtick identifiers and comments survive
    assert rw("SELECT `len(a, b)` FROM t") == "SELECT `len(a, b)` FROM t"
    assert rw("SELECT `weird``len(a, b)` FROM t") == "SELECT `weird``len(a, b)` FROM t"
    assert rw("SELECT 1 -- len(x, y)\nFROM t") == "SELECT 1 -- len(x, y)\nFROM t"
    assert rw("SELECT /* len(x, y) */ 1") == "SELECT /* len(x, y) */ 1"
    assert rw("SELECT /* a /* len(x, y) */ b */ 1") == "SELECT /* a /* len(x, y) */ b */ 1"
    # ...while a REAL variadic call rewrites even with opaque spans inside
    assert rw("SELECT len(`a, weird`, b)") == "SELECT len(`a, weird`)"
    assert rw("SELECT len(a /* , fake */, b)") == "SELECT len(a /* , fake */)"
    assert rw("SELECT len(a, b) -- trailing len(c, d)\n") == "SELECT len(a) -- trailing len(c, d)\n"
    # unterminated spans consume the tail, never mangle it
    assert rw("SELECT 'len(a, b)") == "SELECT 'len(a, b)"
    assert rw("SELECT x -- len(a, b)") == "SELECT x -- len(a, b)"


def test_accessor_parity(spark, tree):
    fs = Cdl(spark=spark).open(f"local://{tree}")
    # local: global_path is the bare rel path, dataset_uri the bare rel dir
    assert fs.global_path == str(tree).lstrip("/")
    assert fs.dataset_uri == "rootfs"
    s3 = Cdl(
        spark=spark,
        s3_endpoint="http://localhost:9000",
        access_key="ak",
        secret_key="sk",
    ).open("s3://bucket/a/b")
    assert s3.global_path == "s3://bucket/a/b"
    assert s3.dataset_uri == "s3://bucket/rootfs"
    opts = s3.storage_options()
    assert opts["AWS_ENDPOINT_URL"] == "http://localhost:9000"
    assert opts["AWS_ACCESS_KEY_ID"] == "ak"
    assert opts["AWS_SECRET_ACCESS_KEY"] == "sk"
    assert opts["allow_http"] == "true" and opts["conditional_put"] == "etag"
    redacted = s3.storage_options(append_credentials=False)
    assert "AWS_ACCESS_KEY_ID" not in redacted


def test_rewrite_variadic_len_properties():
    """Property: the rewrite is a no-op on SQL without a variadic len
    call, never touches string literals, and is idempotent."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from connected_data_lake_spark.functions import rewrite_variadic_len as rw

    sql_atoms = st.sampled_from(
        ["SELECT", "name", "size", ",", "(", ")", "'len(a, b)'", "length(a, b)",
         "len(data)", "WHERE", "= 3", "AND", "octet_len(x, y)", " ",
         # opaque spans (ADVICE r9): a column literally named len(a, b),
         # line and block comments carrying fake variadic calls
         "`len(a, b)`", "/* len(a, b) */", "-- len(a, b)\n"]
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(sql_atoms, min_size=1, max_size=12))
    def check(atoms):
        s = " ".join(atoms)
        out = rw(s)
        assert rw(out) == out  # idempotent
        if "len(data)" not in s:  # no variadic call constructible here
            # every atom is either len-free or already unary/quoted/suffixed
            assert out == s

    check()
