"""Orchestrated three-phase ETL runner (SURVEY §2.12 R1-R6, §3).

Reference shape: run_etl (staging) → run_dimensional_etl (star build) →
run_views_etl (BI views), each a sequence of logged steps with
abort-on-failure exit codes (/root/reference/rahil/run_etl.py:24-46,
run_dimensional_etl.py:32-59), per-entity row accounting
(load_data.py:22-74), timestamped log files (rahil/logs/), env-driven
config (config.py:20-59), and idempotent DDL throughout.

Engine shape: one SparkSession, one `EtlRun` that sequences step
functions, logs each with wall-clock + row counts, aborts on the first
failure (raising EtlStepError — the exit-code analog), and returns a
summary report. Materialization is `saveAsTable` into a warehouse
database (overwrite = CREATE OR REPLACE semantics, R6). No sleeps —
the reference's time.sleep(1) pacing is a Snowflake-API courtesy with
no Spark analog.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from . import ddl
from .star_build import build_star

log = logging.getLogger("snowflake_azure_etl_spark.etl")


class EtlStepError(RuntimeError):
    """Abort-on-step-failure (R2; reference run_dimensional_etl.py:32-59
    exits non-zero on the first failed step)."""


@dataclass
class StepResult:
    name: str
    seconds: float
    rows: dict[str, int] = field(default_factory=dict)


@dataclass
class EtlReport:
    """Per-step accounting summary (R3; reference load_data.py:48-74)."""
    steps: list[StepResult] = field(default_factory=list)

    @property
    def total_seconds(self) -> float:
        return sum(s.seconds for s in self.steps)

    @property
    def table_counts(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for s in self.steps:
            out.update(s.rows)
        return out


class EtlRun:
    """Sequenced, logged, abort-on-failure step runner (R1, R2, R4)."""

    def __init__(self, name: str) -> None:
        self.name = name
        self.report = EtlReport()

    def step(self, name: str,
             fn: Callable[[], dict[str, int] | None]) -> dict[str, int]:
        log.info("[%s] step %d: %s ...", self.name,
                 len(self.report.steps) + 1, name)
        t0 = time.perf_counter()
        try:
            rows = fn() or {}
        except Exception as exc:  # noqa: BLE001 — step boundary
            log.error("[%s] step %r FAILED: %s", self.name, name, exc)
            raise EtlStepError(f"{self.name}: step {name!r} failed") from exc
        dt = time.perf_counter() - t0
        self.report.steps.append(StepResult(name, dt, rows))
        for tbl, n in rows.items():
            log.info("[%s]   %s: %d rows", self.name, tbl, n)
        log.info("[%s] step %r ok in %.2fs", self.name, name, dt)
        return rows


def warehouse_database() -> str:
    """Env-driven target database (R5; reference config.py derives DB
    names from USER_NAME in .env)."""
    return os.environ.get("SPARK_GRAFT_WAREHOUSE_DB", "wh")


def _materialize(spark: SparkSession, database: str, name: str,
                 df: DataFrame) -> dict[str, int]:
    """CREATE OR REPLACE TABLE AS SELECT (R6) + row accounting (R3).

    With the in-memory catalog a table dir can survive a previous JVM
    while the catalog entry didn't; drop both so REPLACE is truly
    idempotent across sessions."""
    full = f"{database}.{name}"
    spark.sql(f"DROP TABLE IF EXISTS {full}")
    ddl.drop_orphan_location(spark, full)
    df.write.mode("overwrite").format("parquet").saveAsTable(full)
    return {full: spark.table(full).count()}


def run_warehouse_build(spark: SparkSession, sf_dir: str,
                        database: str | None = None) -> EtlReport:
    """The dimensional-ETL phase end-to-end: create DB → build + persist
    dims in dependency order → facts → pass-through views. Idempotent:
    re-running overwrites every object (R6)."""
    database = database or warehouse_database()
    run = EtlRun("warehouse-build")
    run.step("create database",
             lambda: ({} if ddl.create_database(spark, database)
                      else _raise(f"database {database} missing after create")))
    star = build_star(spark, sf_dir)
    # dependency order: location first, then its referrers, then facts
    for name in ("dim_location", "dim_customer", "dim_supplier", "dim_part",
                 "dim_date", "fact_sales", "fact_sales_target"):
        run.step(f"load {name}",
                 lambda n=name: _materialize(spark, database, n, star[n]))
    run.step("create views", lambda: create_passthrough_views(spark, database))
    return run.report


def _raise(msg: str) -> None:
    raise EtlStepError(msg)


PASSTHROUGH_VIEWS = {
    # explicit column lists — the reference's anti-SELECT* policy (P1;
    # create_views.py:19-98 enumerates every column of every view)
    "vw_dim_customer": ("dim_customer", ["dim_customer_id", "custkey",
                                        "customer_name", "segment",
                                        "dim_location_id"]),
    "vw_dim_part": ("dim_part", ["dim_part_id", "partkey", "part_name",
                                 "brand", "part_type", "size"]),
    "vw_fact_sales": ("fact_sales", ["orderkey", "linenumber",
                                     "dim_customer_id", "dim_supplier_id",
                                     "dim_part_id", "dim_sale_date_id",
                                     "sale_quantity", "sale_amount",
                                     "sale_unit_price"]),
}


def create_passthrough_views(spark: SparkSession,
                             database: str) -> dict[str, int]:
    """CREATE OR REPLACE VIEW layer (S8) — pass-through views with
    explicit column lists; SECURE degrades to plain VIEW (SURVEY §4.3.4)."""
    for view, (table, cols) in PASSTHROUGH_VIEWS.items():
        col_list = ", ".join(cols)
        spark.sql(f"CREATE OR REPLACE VIEW {database}.{view} AS "
                  f"SELECT {col_list} FROM {database}.{table}")
    return {}
