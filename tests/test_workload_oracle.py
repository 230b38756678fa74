"""Every catalog query vs its DuckDB oracle — the driver-check replica.

Exact comparison (no float tolerance): the workload's exact-DECIMAL
discipline is asserted here, not just hoped for.
"""

from __future__ import annotations

import pytest

from snowflake_azure_etl_spark.workload import QUERIES

from .oracle import compare, duck_connection, pandas_dtype_parity


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    problems = compare(df, duck, q.oracle)
    problems += pandas_dtype_parity(df, duck, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_query_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0 and len(df.columns) > 0


def test_time_queries_survive_non_utc_session(spark, sf_dir):
    """Engine semantics are UTC regardless of the session a driver
    hands us (ADVICE r4): load_tables pins the session tz, so
    tz-dependent expressions (window/year/date_trunc over LTZ) stay
    oracle-stable even if the caller set another zone."""
    from snowflake_azure_etl_spark.sources.registry import load_tables
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        load_tables(spark, sf_dir, ("events",))
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
