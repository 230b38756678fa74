"""Every catalog query vs its DuckDB oracle — the driver-check replica.

Exact comparison (no float tolerance): the workload's exact-DECIMAL
discipline is asserted here, not just hoped for.
"""

from __future__ import annotations

import pytest

from snowflake_azure_etl_spark.workload import QUERIES

from .oracle import compare, duck_connection


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
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_query_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0 and len(df.columns) > 0
