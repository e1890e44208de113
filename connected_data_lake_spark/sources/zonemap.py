"""Per-file zone maps: manifest-recorded column stats + file skipping.

At 100 TB a table is tens of thousands of parquet files; the difference
between "scan the table" and "scan the 3 files that can contain the
predicate" is the whole game for point-ish queries and for copy-on-write
maintenance (DELETE/MERGE rewrite only the files that MIGHT match). The
reference gets this from Lance fragment metadata; Delta/Iceberg call it
data skipping. Here the writer records, per committed file, row count and
per-column min/max/null-count into the manifest (see
``manifest.latest_snapshot``), and readers prune the file list BEFORE the
Spark scan is planned — so the skipped files are never even listed, a
stronger cut than parquet row-group skipping (which still opens every
footer on every query).

Stats come from the parquet footers the write already produced — a
metadata-only read (KBs/file), the same source Iceberg's write path uses.
Collection is a driver-side loop here; at a thousands-of-files commit it
would be one ``sc.parallelize(paths).map(footer)`` job — the record format
does not change.

Predicates use the simple conjunctive triple form pyarrow/Delta use for
partition filters: ``[(col, op, value), ...]`` with ops
``= != < <= > >= in between is_null is_not_null``. Pruning is
conservative: a file is skipped only when its stats PROVE no row can
match; missing stats (older manifests, nested/binary columns, truncated
string bounds) keep the file. Exact semantics are restored by re-applying
the same predicate as a Spark filter over the surviving files
(:func:`filters_to_column`), so pruning can never change a result.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

#: string min/max longer than this are dropped from the record: parquet
#: writers may truncate long byte-array stats, and a truncated *max* bound
#: is not a valid upper bound, so long bounds are untrustworthy.
_MAX_STRING_BOUND = 256

Filter = tuple  # (col, op, value)


def _kind(value) -> str | None:
    """Type family of a bound/literal: comparisons and Bloom probes are
    only trusted WITHIN a family. SQL coerces cross-type comparisons
    (`string_col = 5` casts the column; `ts_col = '2024-01-01'` casts the
    literal), and a representation-level compare of the un-coerced forms
    can disagree with the coerced SQL result near boundaries (`'05' = 5`
    is TRUE in SQL, '05' != '5' as strings) — a wrong skip, i.e. silent
    wrong results. Cross-family predicates therefore never skip."""
    if isinstance(value, bool):
        return "bool"
    if isinstance(value, (int, float)):
        return "num"
    if isinstance(value, (datetime.datetime, datetime.date)):
        return "ts"
    if isinstance(value, str):
        return "str"
    return None


def _norm(value):
    """Normalize a bound/literal to a JSON-storable, order-preserving form.

    Timestamps/dates become ISO strings (lexicographic order == time order,
    and the manifest is JSON); bytes and over-long strings become None
    (= no usable bound). Used on BOTH the stored stat and the query literal
    so comparisons stay within one type family."""
    if isinstance(value, bool) or value is None:
        return value
    if isinstance(value, (int, float)):
        return value
    if isinstance(value, (datetime.datetime, datetime.date)):
        return value.isoformat(sep=" ") if isinstance(value, datetime.datetime) else value.isoformat()
    if isinstance(value, bytes):
        return None
    if isinstance(value, str):
        return value if len(value) <= _MAX_STRING_BOUND else None
    return None


def collect_file_stats(path: str) -> dict:
    """Zone-map record for one parquet file, from its footer only.

    ``{"rows": n, "cols": {name: {"min": v, "max": v, "nulls": n}}}`` —
    top-level columns only; a column appears with min/max only when EVERY
    row group carried trustworthy bounds (else pruning on it is unsound),
    and with "nulls" only when every row group reported a null count."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    acc: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaf — not addressable by our filters
                continue
            rec = acc.setdefault(
                name, {"min": None, "max": None, "nulls": 0, "bounds_ok": True, "nulls_ok": True}
            )
            st = col.statistics
            if st is None or not st.has_null_count:
                rec["nulls_ok"] = False
            else:
                rec["nulls"] += st.null_count
            # chunk-level num_values counts nulls for non-repeated fields
            all_null = st is not None and st.has_null_count and st.null_count >= col.num_values
            if st is None or not st.has_min_max:
                # a row group that is entirely NULL legitimately has no
                # bounds and constrains nothing; anything else unproven
                if not all_null:
                    rec["bounds_ok"] = False
            else:
                lo, hi = _norm(st.min), _norm(st.max)
                if lo is None or hi is None:
                    rec["bounds_ok"] = False
                else:
                    rec["min"] = lo if rec["min"] is None or lo < rec["min"] else rec["min"]
                    rec["max"] = hi if rec["max"] is None or hi > rec["max"] else rec["max"]
                    rec["kind"] = _kind(st.min)
    cols = {}
    for name, rec in acc.items():
        out = {}
        if rec["bounds_ok"] and rec["min"] is not None:
            out["min"], out["max"] = rec["min"], rec["max"]
            if rec.get("kind"):
                out["kind"] = rec["kind"]
        if rec["nulls_ok"]:
            out["nulls"] = rec["nulls"]
        if out:
            cols[name] = out
    return {"rows": md.num_rows, "cols": cols}


def _bounds_may_match(op: str, value, lo, hi) -> bool:
    """Can any non-null v in [lo, hi] satisfy ``v <op> value``?"""
    try:
        if op in ("=", "=="):
            return lo <= _norm(value) <= hi if _norm(value) is not None else True
        if op == "!=":
            v = _norm(value)
            return not (v is not None and lo == hi == v)
        if op == "<":
            return lo < _norm(value)
        if op == "<=":
            return lo <= _norm(value)
        if op == ">":
            return hi > _norm(value)
        if op == ">=":
            return hi >= _norm(value)
        if op == "in":
            vs = [_norm(v) for v in value]
            return any(v is None or lo <= v <= hi for v in vs) if vs else False
        if op == "between":
            vlo, vhi = _norm(value[0]), _norm(value[1])
            return (vlo is None or vlo <= hi) and (vhi is None or vhi >= lo)
    except TypeError:  # cross-type comparison (e.g. str literal vs int stats)
        return True
    return True  # unknown op — never skip on it


def file_may_match(stats: dict | None, filters: list[Filter]) -> bool:
    """False only when ``stats`` PROVE no row of the file passes every
    conjunct. A file without stats (or without stats for a referenced
    column) always may-match."""
    if not stats:
        return True
    rows = stats.get("rows")
    cols = stats.get("cols", {})
    for col, op, *rest in filters:
        value = rest[0] if rest else None
        rec = cols.get(col)
        if rec is None:
            continue
        nulls = rec.get("nulls")
        if op == "is_null":
            if nulls == 0:
                return False
            continue
        all_null = nulls is not None and rows is not None and nulls >= rows
        if op == "is_not_null":
            if all_null:
                return False
            continue
        # remaining ops match only non-null values
        if all_null:
            return False
        rkind = rec.get("kind")
        if "min" in rec and _kinds_compatible(op, value, rkind):
            if not _bounds_may_match(op, value, rec["min"], rec["max"]):
                return False
        # equality probes additionally consult the per-file Bloom bitset
        # (sources/bloom.py) — the skip that works when the column ISN'T
        # clustered and min/max spans everything. Probed ONLY when the
        # literal's exact python type matches the recorded bound's: the
        # bitset hashes the column CAST TO STRING, and SQL's cross-type
        # coercion ('05' = 5, 5 = 5.0 on a double column) renders
        # differently than the probe value would — a probe across types
        # risks a false negative, i.e. a wrong skip.
        bloom = stats.get("bloom", {}).get(col)
        if bloom is not None and "min" in rec and rec.get("kind") not in (None, "ts"):
            # temporal bounds are ISO *strings*, so a str literal passes a
            # bare type check — but SQL renders/coerces timestamps in
            # multiple textual forms ('2024-01-01' == midnight), so a ts
            # column is never bloom-probed; kind==None (old manifest) has
            # no type evidence at all
            from .bloom import bloom_may_contain

            def _probeable(v):
                return type(v) is type(rec["min"])

            if op in ("=", "==") and _probeable(value) and not bloom_may_contain(bloom, value):
                return False
            if (
                op == "in"
                and value
                and all(_probeable(v) for v in value)
                and not any(bloom_may_contain(bloom, v) for v in value)
            ):
                return False
    return True


def _kinds_compatible(op: str, value, rkind: str | None) -> bool:
    """Whether the literal(s) and the stored bounds are in the same type
    family, so a representation-level compare agrees with SQL's coerced
    compare (see _kind). Unknown recorded kind (old manifests) keeps the
    pre-kind behavior: the compare itself TypeErrors to may-match on
    numeric-vs-string, and temporal bounds meet only the datetime-typed
    literals the triple API documents."""
    if rkind is None:
        return True
    if op == "in":
        values = list(value or [])
    elif op == "between":
        values = [v for v in (value or ()) if v is not None]
    else:
        values = [value]
    return all(_kind(v) in (None, rkind) for v in values)


def prune_files(files: list[str], stats: dict, filters: list[Filter] | None) -> list[str]:
    """Subset of ``files`` that can contain rows matching ``filters``."""
    if not filters:
        return list(files)
    return [f for f in files if file_may_match(stats.get(f), filters)]


#: conjunct forms parse_condition recognizes (whole-match, case-insensitive
#: keywords): `col op literal`, `col IS [NOT] NULL`, `col IN (lit, ...)`.
#: Literals are numbers or single-quoted strings WITHOUT escapes.
_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_LIT = r"-?\d+(?:\.\d+)?|'[^']*'"
import re as _re  # noqa: E402

_CMP_RE = _re.compile(rf"^\s*({_IDENT})\s*(=|==|!=|<>|<=|>=|<|>)\s*({_LIT})\s*$")
_NULL_RE = _re.compile(rf"^\s*({_IDENT})\s+IS\s+(NOT\s+)?NULL\s*$", _re.IGNORECASE)
_IN_RE = _re.compile(rf"^\s*({_IDENT})\s+IN\s*\(\s*({_LIT}(?:\s*,\s*(?:{_LIT}))*)\s*\)\s*$", _re.IGNORECASE)
_LIT_RE = _re.compile(_LIT)


def _parse_literal(text: str):
    if text.startswith("'"):
        return text[1:-1]
    return float(text) if "." in text else int(text)


def parse_condition(condition: str) -> list[Filter] | None:
    """Conservatively parse a simple conjunctive SQL condition into filter
    triples — so `CdlFS.read_files("size > 100 AND parent = '/a'")` gets
    zone-map/Bloom file skipping without the caller switching APIs.

    Returns None for ANYTHING not provably a plain conjunction of the
    whitelisted forms (ORs, NOTs, parens, BETWEEN, functions, quoted
    strings containing ``and``, ...). Correctness never depends on this:
    the caller applies the ORIGINAL SQL string as the row predicate and
    uses the parse only for file pruning, so a None just means no
    skipping."""
    out: list[Filter] = []
    for part in _re.split(r"\s+AND\s+", condition, flags=_re.IGNORECASE):
        m = _CMP_RE.match(part)
        if m:
            col, op, lit = m.groups()
            op = {"==": "=", "<>": "!="}.get(op, op)
            out.append((col, op, _parse_literal(lit)))
            continue
        m = _NULL_RE.match(part)
        if m:
            out.append((m.group(1), "is_not_null" if m.group(2) else "is_null"))
            continue
        m = _IN_RE.match(part)
        if m:
            out.append((m.group(1), "in", tuple(_parse_literal(t) for t in _LIT_RE.findall(m.group(2)))))
            continue
        return None
    return out or None


def filters_to_column(filters: list[Filter]) -> Column:
    """The same conjuncts as an exact Spark predicate (applied over the
    pruned scan so zone-map pruning is purely a performance fact)."""
    out = F.lit(True)
    for col, op, *rest in filters:
        value = rest[0] if rest else None
        c = F.col(col)
        if op in ("=", "=="):
            term = c == F.lit(value)
        elif op == "!=":
            term = c != F.lit(value)
        elif op == "<":
            term = c < F.lit(value)
        elif op == "<=":
            term = c <= F.lit(value)
        elif op == ">":
            term = c > F.lit(value)
        elif op == ">=":
            term = c >= F.lit(value)
        elif op == "in":
            term = c.isin(list(value))
        elif op == "between":
            term = c.between(F.lit(value[0]), F.lit(value[1]))
        elif op == "is_null":
            term = c.isNull()
        elif op == "is_not_null":
            term = c.isNotNull()
        else:
            raise ValueError(f"unsupported filter op: {op!r}")
        out = out & term
    return out
