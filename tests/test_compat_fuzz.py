"""Property-based fuzz of the Snowflake→Spark dialect shim: any table
DDL assembled from the reference's documented vocabulary (NUMBER /
VARCHAR / defaults / IDENTITY / PRIMARY KEY / comments) must translate
to DDL that Spark actually executes, idempotently, preserving the
column list."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from snowflake_azure_etl_spark.compat.snowflake_sql import (run_script,
                                                            translate_script)

NAMES = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,14}", fullmatch=True)
TYPES = st.sampled_from([
    "NUMBER(18,2)", "NUMBER(9)", "NUMBER", "VARCHAR(255)", "VARCHAR",
    "FLOAT", "INT", "INTEGER", "DATE", "TIMESTAMP_NTZ", "CHAR(1)",
    "BOOLEAN",
])
EXTRAS = st.sampled_from([
    "", " NOT NULL", " PRIMARY KEY", " UNIQUE", " IDENTITY(1,1)",
    " DEFAULT 'x'", " DEFAULT 0", " DEFAULT to_date(current_timestamp)",
    " DEFAULT To_date('9999-12-31')",
])


@st.composite
def table_ddl(draw):
    cols = draw(st.lists(st.tuples(NAMES, TYPES, EXTRAS),
                         min_size=1, max_size=8,
                         unique_by=lambda c: c[0].upper()))
    body = ",\n    ".join(f"{n} {t}{x}" for n, t, x in cols)
    comment = draw(st.sampled_from(
        ["", "\ncomment = 'fuzzed table'",
         ]))
    header = draw(st.sampled_from(
        ["", "/* block\n comment; with a semicolon */\n",
         "-- line comment\n"]))
    return (f"{header}CREATE OR REPLACE TABLE compat_fuzz_t (\n"
            f"    {body}\n){comment};", len(cols))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(table_ddl())
def test_fuzzed_reference_style_ddl_executes(spark, ddl_and_n):
    ddl, n_cols = ddl_and_n
    run_script(spark, ddl)
    assert len(spark.table("compat_fuzz_t").columns) == n_cols
    # idempotent rerun (CREATE OR REPLACE → DROP + CREATE)
    run_script(spark, ddl)
    assert len(spark.table("compat_fuzz_t").columns) == n_cols


def test_translate_never_leaves_snowflake_only_tokens():
    ddl = ("CREATE OR REPLACE TABLE t (a NUMBER(5), b VARCHAR, "
           "c INT IDENTITY(1,1) PRIMARY KEY, d DATE DEFAULT "
           "to_date(current_timestamp)) comment = 'x';")
    out = " ".join(s for t in translate_script(ddl) for s in t.statements)
    up = out.upper()
    for tok in ("NUMBER", "IDENTITY", "PRIMARY KEY", "DEFAULT", "COMMENT ="):
        assert tok not in up
    assert "VARCHAR " not in up.replace("VARCHAR(", "VARCHAR_(")
