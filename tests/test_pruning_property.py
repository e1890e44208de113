"""Property: data skipping is SOUND for arbitrary data and predicates.

`file_may_match` (zone maps + Bloom bitsets) may return True spuriously —
that only costs a read — but a False on a file containing ANY matching row
would silently change query results. Hypothesis drives random files
(ints, strings, NULLs) and random conjunctive filters through the pure
pruning functions against a reference row evaluator with SQL semantics
(NULL never matches =/</in/...; is_null/is_not_null are the only
NULL-matching ops). No Spark needed: the functions under test are exactly
the ones the scan path calls, and the write path's stat collection is
mirrored field-for-field (min/max over non-null values, null counts,
bloom positions from the shared probe_positions)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from connected_data_lake_spark.sources.bloom import DEFAULT_K, probe_positions
from connected_data_lake_spark.sources.zonemap import file_may_match

COLS = ("a", "b")
_M = 256  # small bitset → false positives DO occur → exercises both paths

value_st = st.one_of(
    st.none(),
    st.integers(min_value=-20, max_value=20),
    st.text(alphabet="abcxyz015", min_size=0, max_size=3),
)
row_st = st.fixed_dictionaries({c: value_st for c in COLS})
probe_st = st.one_of(
    st.integers(min_value=-20, max_value=20), st.text(alphabet="abcxyz015", max_size=3)
)
filter_st = st.one_of(
    st.tuples(st.sampled_from(COLS), st.sampled_from(["=", "!=", "<", "<=", ">", ">="]), probe_st),
    st.tuples(st.sampled_from(COLS), st.just("in"), st.lists(probe_st, max_size=3)),
    st.tuples(st.sampled_from(COLS), st.just("between"), st.tuples(probe_st, probe_st)),
    st.tuples(st.sampled_from(COLS), st.sampled_from(["is_null", "is_not_null"])),
)


def _stats_for(rows: list[dict]) -> dict:
    """Mirror of the write path: zonemap.collect_file_stats semantics plus
    a Bloom bitset per column (rootfs.write_table(bloom_cols=COLS))."""
    cols, bloom = {}, {}
    for c in COLS:
        values = [r[c] for r in rows]
        present = [v for v in values if v is not None]
        rec = {"nulls": sum(1 for v in values if v is None)}
        # min/max only when the column's values are one orderable type
        # (mixed int/str files get no bounds — like an unreadable footer)
        if present and len({type(v) for v in present}) == 1:
            rec["min"], rec["max"] = min(present), max(present)
            rec["kind"] = "str" if isinstance(present[0], str) else "num"
        cols[c] = rec
        bits = bytearray(_M // 8)
        for v in present:
            for p in probe_positions(v, _M, DEFAULT_K) or []:
                bits[p // 8] |= 1 << (p % 8)
        bloom[c] = {"hex": bytes(bits).hex(), "m": _M, "k": DEFAULT_K}
    return {"rows": len(rows), "cols": cols, "bloom": bloom}


def _coerce(v, arg):
    """SQL implicit-cast model: a string compared to a number casts the
    STRING side (invalid cast -> NULL -> not-true). This is the adversarial
    case the stats' kind guard exists for: '05' = 5 is TRUE in SQL but
    '05' != '5' at the representation level."""
    if isinstance(v, str) and isinstance(arg, (int, float)):
        try:
            return float(v), float(arg)
        except ValueError:
            return None
    if isinstance(v, (int, float)) and isinstance(arg, str):
        try:
            return float(v), float(arg)
        except ValueError:
            return None
    return v, arg


def _cmp(v, op, arg) -> bool:
    pair = _coerce(v, arg)
    if pair is None:
        return False
    v, arg = pair
    return {
        "=": v == arg,
        "!=": v != arg,
        "<": v < arg,
        "<=": v <= arg,
        ">": v > arg,
        ">=": v >= arg,
    }[op]


def _row_matches(row: dict, filters: list[tuple]) -> bool:
    """SQL conjunction semantics: NULL comparisons are not-true, and
    cross-type comparisons coerce (see _coerce)."""
    for col, op, *rest in filters:
        v = row[col]
        arg = rest[0] if rest else None
        if op == "is_null":
            if v is not None:
                return False
            continue
        if op == "is_not_null":
            if v is None:
                return False
            continue
        if v is None:
            return False
        if op == "in":
            if not any(_cmp(v, "=", a) for a in arg):
                return False
        elif op == "between":
            if not (_cmp(v, ">=", arg[0]) and _cmp(v, "<=", arg[1])):
                return False
        elif not _cmp(v, op, arg):
            return False
    return True


@settings(max_examples=300, deadline=None)
@given(rows=st.lists(row_st, min_size=0, max_size=12), filters=st.lists(filter_st, min_size=1, max_size=3))
def test_skipped_files_provably_contain_no_match(rows, filters):
    stats = _stats_for(rows)
    if not file_may_match(stats, filters):
        assert not any(_row_matches(r, filters) for r in rows), (
            f"UNSOUND SKIP: stats={stats} filters={filters}"
        )


@settings(max_examples=100, deadline=None)
@given(rows=st.lists(row_st, min_size=1, max_size=12), filters=st.lists(filter_st, min_size=1, max_size=3))
def test_statless_files_never_skip(rows, filters):
    assert file_may_match(None, filters)
    assert file_may_match({}, filters)
    # stats for OTHER columns never justify skipping on these filters
    assert file_may_match({"rows": len(rows), "cols": {"zzz": {"min": 0, "max": 0}}}, filters)


# ---------------------------------------------------------------------------
# End-to-end: the SQL-condition pruner vs DuckDB as the SEMANTICS oracle
# (VERDICT r5 item 6). One Spark-written table with real manifest stats +
# Bloom bitsets; hypothesis generates raw SQL condition strings; for every
# file the pruner skips, DuckDB must find zero matching rows in that file.
# This checks parse_condition -> file_may_match against an independent SQL
# engine rather than the in-repo row evaluator above.
# ---------------------------------------------------------------------------

import os

import duckdb
import pytest

from connected_data_lake_spark.sources import rootfs as _R
from connected_data_lake_spark.sources.manifest import LocalFsStore as _Store
from connected_data_lake_spark.sources.manifest import latest_snapshot as _snap
from connected_data_lake_spark.sources.zonemap import parse_condition

#: adversarial names: numeric-looking, leading zeros, empty, case variants
_NAMES = ["user-0001", "user-0009", "05", "5", "", "abc", "ABC", "zzz", "a b"]
#: sizes: negative, boundary, NULL (a directory row)
_SIZES = [-7, 0, 1, 5, 40, None]


@pytest.fixture(scope="module")
def pruning_table(spark, tmp_path_factory):
    uri = str(tmp_path_factory.mktemp("prune_duck") / "t")
    rows_all = [
        (n, "/p", None, None, None, 0o644, s, 0, 0, 0, None)
        for n in _NAMES
        for s in _SIZES
    ]
    # interleave across 4 files so zone maps overlap and blooms matter
    for i in range(4):
        part = [r for j, r in enumerate(rows_all) if j % 4 == i]
        _R.write_table(
            spark.createDataFrame(part, _R.ROOTFS_SCHEMA).coalesce(1),
            uri,
            mode="overwrite" if i == 0 else "append",
            bloom_cols=["name", "size"],
        )
    _, files, stats = _snap(_Store(os.path.join(uri, _R._LOG_DIR)))
    con = duckdb.connect()
    return [(os.path.join(uri, f), stats[f]) for f in files], con


_lit_str = st.sampled_from(_NAMES + ["user-0005", "06", "zz"])
_lit_int = st.integers(min_value=-9, max_value=45)
_num_op = st.sampled_from(["=", "!=", "<", "<=", ">", ">=", "<>"])


def _q(s: str) -> str:
    return "'" + s + "'"


_atom_st = st.one_of(
    st.builds(lambda o, v: f"name {o} {_q(v)}", _num_op, _lit_str),
    st.builds(lambda o, v: f"size {o} {v}", _num_op, _lit_int),
    st.builds(lambda vs: "name IN (" + ", ".join(_q(v) for v in vs) + ")",
              st.lists(_lit_str, min_size=1, max_size=3)),
    st.builds(lambda vs: "size IN (" + ", ".join(str(v) for v in vs) + ")",
              st.lists(_lit_int, min_size=1, max_size=3)),
    st.sampled_from(["size IS NULL", "size IS NOT NULL", "name IS NOT NULL"]),
)
_cond_st = st.builds(lambda atoms: " AND ".join(atoms), st.lists(_atom_st, min_size=1, max_size=3))


@settings(max_examples=300, deadline=None)
@given(cond=_cond_st)
def test_pruned_files_contain_no_duckdb_match(pruning_table, cond):
    table, con = pruning_table
    filters = parse_condition(cond)
    if filters is None:
        # unparseable -> no pruning -> trivially sound
        return
    for path, stats in table:
        if not file_may_match(stats, filters):
            n = con.execute(
                f"SELECT count(*) FROM read_parquet(?) WHERE {cond}", [path]
            ).fetchone()[0]
            assert n == 0, f"UNSOUND SKIP vs DuckDB: cond={cond!r} file={path}"


@settings(max_examples=60, deadline=None)
@given(cond=st.builds(lambda a, b: f"{a} OR {b}", _atom_st, _atom_st))
def test_unparseable_conditions_never_prune(pruning_table, cond):
    """ORs are outside the whitelisted conjunction grammar: the parser must
    return None (no pruning) rather than mis-parse into filters."""
    assert parse_condition(cond) is None
