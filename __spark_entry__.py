"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship star-join aggregate at sf0.001;
`queries()` / `oracle_sql()` expose the full workload catalog
(snowflake_azure_etl_spark.workload) — one named query per implemented
operator from SURVEY §2 plus the north-star pipeline extensions, each
with a DuckDB oracle unless genuinely non-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snowflake_azure_etl_spark.workload import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_sales_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (+ extensions)."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries get the driver's
    weaker rows-only check."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle}
