"""VERDICT r3 #8 / r4 #5: the VERBATIM reference DDL scripts
(private_ddl/example_*.sql) must translate and execute end-to-end into
the Spark warehouse via compat.run_script — the 'a reference user can
feed their scripts directly' contract, proven on the reference's own
files, not paraphrases."""

from __future__ import annotations

import os

import pytest

from snowflake_azure_etl_spark.compat.snowflake_sql import run_script

REF_DDL_DIR = "/root/reference/private_ddl"

EXPECTED = {
    "example_dim_date.sql": ("dim_date", 16),
    "example_dimension_table.sql": ("dim_example", 8),
    "example_fact_table.sql": ("fact_example", 11),
    "example_staging_table.sql": ("staging_example", 11),
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DDL_DIR),
    reason="reference private_ddl not available")


@pytest.fixture(scope="module")
def compat_db(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS compat_roundtrip")
    prev = spark.catalog.currentDatabase()
    spark.catalog.setCurrentDatabase("compat_roundtrip")
    yield "compat_roundtrip"
    spark.catalog.setCurrentDatabase(prev)
    spark.sql("DROP DATABASE IF EXISTS compat_roundtrip CASCADE")


@pytest.mark.parametrize("fname", sorted(EXPECTED))
def test_reference_ddl_roundtrip(spark, compat_db, fname):
    with open(os.path.join(REF_DDL_DIR, fname)) as f:
        sql_text = f.read()
    run_script(spark, sql_text)
    table, n_cols = EXPECTED[fname]
    cols = spark.table(f"{compat_db}.{table}").columns
    assert len(cols) == n_cols, f"{table}: {cols}"
    # rerun must succeed too (CREATE OR REPLACE semantics = DROP+CREATE)
    run_script(spark, sql_text)
    assert len(spark.table(f"{compat_db}.{table}").columns) == n_cols


def test_dim_date_types_and_defaults(spark, compat_db):
    """The date-dim template exercises every documented delta at once:
    NUMBER(p), bare defaults, fn-call defaults, PRIMARY KEY, COMMENT=,
    TIMESTAMP_NTZ, CHAR(1)."""
    from snowflake_azure_etl_spark.compat import translate_script
    with open(os.path.join(REF_DDL_DIR, "example_dim_date.sql")) as f:
        sql_text = f.read()
    run_script(spark, sql_text)
    ts = translate_script(sql_text)
    t = next(t for t in ts if any("CREATE TABLE" in s.upper()
                                  for s in t.statements))
    assert t.column_defaults["CURRENT_ROW_IND"] == "'Y'"
    assert t.column_defaults["EFFECTIVE_DATE"] == "to_date(current_timestamp)"
    assert t.column_defaults["EXPIRATION_DATE"] == "To_date('9999-12-31')"
    dtypes = dict(spark.table(f"{compat_db}.dim_date").dtypes)
    assert dtypes["DATE_PKEY"] == "decimal(9,0)"
    assert dtypes["SQL_TIMESTAMP"] == "timestamp_ntz"
    # Spark surfaces VARCHAR(n) as string in the catalog (length is a
    # write-side constraint, not a distinct runtime type)
    assert dtypes["DAY_NAME"] == "string"


def test_staging_bare_varchar_becomes_string(spark, compat_db):
    dtypes = dict(spark.table(f"{compat_db}.staging_example").dtypes)
    assert dtypes["NAME"] == "string"
    assert dtypes["CREATEDBY"] == "string"
