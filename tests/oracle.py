"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the documented check: row count + schema (column names) +
order-insensitive value comparison. Floats are compared exactly first
(the workload's determinism discipline should make them bit-identical)
with a tiny relative tolerance fallback so a genuine semantic bug still
fails loudly while a last-bit float difference is surfaced as a warning.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v: Any) -> Any:
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _sorted_rows(rows: list[tuple], col_order: list[int]) -> list[tuple]:
    projected = [tuple(_norm_cell(r[i]) for i in col_order) for r in rows]
    return sorted(projected, key=lambda r: tuple(
        (x is None, str(type(x)), str(x)) for x in r))


def pandas_dtype_parity(spark_df, con: duckdb.DuckDBPyConnection,
                        sql: str) -> list[str]:
    """Driver-faithful dtype check: the round driver compares results at
    the PANDAS level, where a DuckDB HUGEINT (any SUM()) or a
    NULL-bearing int column decays to float64 and stringifies as
    '26.0' vs Spark's '26' — a hash mismatch even when every value is
    equal (seen live: q58 r6, the BPE-leg SUM cnt promoted the whole
    unioned total_freq column to HUGEINT). The fix is always CAST(...
    AS BIGINT) in the oracle; this check makes the decay a local test
    failure instead of a driver-round discovery. Numeric kind must
    match per column (int-vs-int or float-vs-float); a NULL-bearing
    column is exempt (both engines decay it identically)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    dp = con.sql(sql).df()
    for col in sp.columns:
        if col not in dp.columns:
            continue  # schema mismatch reported by compare()
        sk, dk = sp[col].dtype.kind, dp[col].dtype.kind
        if sk == dk:
            continue
        if not ({sk, dk} <= {"i", "u", "f"}):
            continue  # only the numeric decay class hash-mismatches
                      # (date-vs-datetime64 kinds stringify the same)
        if sp[col].isna().any() or dp[col].isna().any():
            continue  # NULL-driven decay, not a type bug
        if {sk, dk} <= {"i", "u"}:
            continue  # width-only difference, stringifies identically
        problems.append(
            f"pandas dtype parity: col {col!r} spark kind={sk!r}"
            f" ({sp[col].dtype}) duck kind={dk!r} ({dp[col].dtype})"
            " — driver hash compares pandas string forms; CAST the"
            " oracle column (SUM→HUGEINT decays to float64)")
    return problems


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str,
            float_rel_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")

    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = _sorted_rows(spark_rows, s_order)
    d = _sorted_rows(duck_rows, d_order)
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s, d)):
        if sr == dr:
            continue
        ok = True
        for a, b in zip(sr, dr):
            if a == b:
                continue
            if (isinstance(a, float) and isinstance(b, float)
                    and float_rel_tol > 0
                    and math.isclose(a, b, rel_tol=float_rel_tol)):
                continue
            ok = False
        if not ok:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={sr} duck={dr}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
