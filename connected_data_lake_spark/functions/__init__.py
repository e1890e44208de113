"""SQL function registration (SURVEY §2.9).

The reference ships exactly one custom scalar UDF: ``len(BINARY…) → Int64``
(reference crates/cdl-fs/src/functions/len.rs:20-84, registered at
lib.rs:261). Spark already has the semantics as ``octet_length``; we register
``len`` as a SQL-defined function (Spark SQL UDF, inlined by Catalyst at
analysis time) so reference queries run verbatim — it never becomes a
row-at-a-time Python UDF.

``date_bin`` (DataFusion datetime family, absent from Spark) is registered
as an emulation over integer epoch arithmetic.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_all(spark: SparkSession) -> None:
    """Register every reference-parity SQL function on the session."""
    register_len(spark)
    register_date_bin(spark)


def register_len(spark: SparkSession) -> None:
    """``len(BINARY) → byte length`` (reference len.rs:36-74 computes
    offsets-diff for the array path, b.len() for scalars — i.e.
    octet_length). Spark 4 ships a built-in ``len`` whose BINARY overload
    is exactly that (verified: len(X'010203') = 3), and built-ins can't be
    replaced by SQL UDFs — so registration is a no-op when it exists."""
    try:
        spark.sql("SELECT len(X'01')").collect()
        return  # built-in covers the reference semantics
    except Exception:
        pass
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION len(x BINARY)
        RETURNS BIGINT
        RETURN CAST(octet_length(x) AS BIGINT)
        """
    )


def _opaque_span(stmt: str, i: int) -> int | None:
    """If ``stmt[i]`` opens a span the rewriter must copy verbatim —
    a single/double-quoted string literal (doubled-quote escapes), a
    backtick-quoted identifier (doubled-backtick escapes), a ``--`` line
    comment, or a ``/* */`` block comment (nested, as Spark parses them)
    — return the index one past its end; else None. An unterminated span
    runs to end-of-statement (matching how the SQL lexer would consume
    it, so the rewriter can never mangle the tail)."""
    n = len(stmt)
    ch = stmt[i]
    if ch in ("'", '"', "`"):
        j = i + 1
        while j < n:
            if stmt[j] == ch:
                if j + 1 < n and stmt[j + 1] == ch:  # escaped delimiter
                    j += 2
                    continue
                return j + 1
            j += 1
        return n
    if stmt[i : i + 2] == "--":
        j = stmt.find("\n", i)
        return n if j == -1 else j + 1
    if stmt[i : i + 2] == "/*":
        depth, j = 1, i + 2
        while j < n and depth:
            if stmt[j : j + 2] == "/*":
                depth += 1
                j += 2
            elif stmt[j : j + 2] == "*/":
                depth -= 1
                j += 2
            else:
                j += 1
        return j
    return None


def rewrite_variadic_len(stmt: str) -> str:
    """Rewrite variadic ``len(a, b, …)`` calls to ``len(a)``.

    The reference declares ``len`` with a Variadic(Binary) signature but
    its kernel only ever reads ``args[0]`` (reference
    crates/cdl-fs/src/functions/len.rs:20-84 — extra arguments are
    accepted and silently ignored). Spark 4's built-in ``len`` is strictly
    unary and built-ins cannot be shadowed by session UDFs
    (CANNOT_REPLACE_NON_SQL_UDF_WITH_SQL_UDF), so reference queries using
    the variadic form are rewritten at the :meth:`CdlFS.sql` entry point
    instead. Balanced-paren scan; string literals, backtick-quoted
    identifiers (even one literally named ``len(a, b)``), and ``--`` /
    ``/* */`` comments are opaque — unary calls and other functions pass
    through untouched.
    """
    out: list[str] = []
    i, n = 0, len(stmt)
    while i < n:
        span = _opaque_span(stmt, i)
        if span is not None:
            out.append(stmt[i:span])
            i = span
            continue
        if (
            stmt[i : i + 3].lower() == "len"
            and (i == 0 or not (stmt[i - 1].isalnum() or stmt[i - 1] in "_."))
        ):
            j = i + 3
            while j < n and stmt[j].isspace():
                j += 1
            if j < n and stmt[j] == "(":
                # scan the argument list at depth 1, splitting top-level
                # commas; opaque spans are skipped so quoted/commented
                # parens and commas never affect the balance
                depth, k, args, start = 1, j + 1, [], j + 1
                while k < n and depth > 0:
                    inner = _opaque_span(stmt, k)
                    if inner is not None:
                        k = inner
                        continue
                    c = stmt[k]
                    if c == "(":
                        depth += 1
                    elif c == ")":
                        depth -= 1
                        if depth == 0:
                            args.append(stmt[start:k])
                    elif c == "," and depth == 1:
                        args.append(stmt[start:k])
                        start = k + 1
                    k += 1
                if depth == 0 and len(args) > 1:
                    first = rewrite_variadic_len(args[0].strip())
                    out.append(f"len({first})")
                    i = k
                    continue
        out.append(stmt[i])
        i += 1
    return "".join(out)


def register_date_bin(spark: SparkSession) -> None:
    """``date_bin_epoch(width_seconds, ts)`` → bucket start in epoch
    seconds. Declared emulated form of DataFusion's date_bin (SURVEY §2.8).
    Integer DIV keeps int64 precision — a double mantissa cannot hold an
    epoch in microseconds."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION date_bin_epoch(width BIGINT, ts TIMESTAMP_NTZ)
        RETURNS BIGINT
        RETURN (unix_micros(to_utc_timestamp(ts, 'UTC')) DIV (width * 1000000)) * width
        """
    )
