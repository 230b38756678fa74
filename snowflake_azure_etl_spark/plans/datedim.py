"""Dim_Date generator (SURVEY §2.9).

The reference generates 730 days of calendar + fiscal attributes with an
opaque "complex date generation logic" INSERT
(/root/reference/private_ddl/example_dim_date.sql:32-33; 730 rows at
rahil/logs/dim_etl_run_20250514_204523.log:58). Here the generator is a
fully-specified Catalyst plan: sequence() -> explode -> the
functions.dates attribute bundle. No data is shipped from the driver —
the whole dim materializes executor-side, so a 100-year calendar costs
the same plan shape as 2 years.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import FISCAL_START_MONTH, date_attributes

DIM_DATE_COLUMNS = (
    # the reference's full 34-column contract (example_dim_date.sql:12-28
    # + VW_Dim_Date, create_views.py:63-77), snake_cased; see
    # functions.dates for the two deterministic SCD replacements
    "date_pkey", "date_value", "year_num", "quarter_num", "month_num",
    "day_num_in_month", "day_num_in_year", "week_num_in_year", "day_name",
    "day_abbrev", "month_name", "month_abbrev", "year_month", "yearmo_num",
    "is_weekday", "is_month_end", "is_holiday", "week_begin_date",
    "week_end_date", "fiscal_year_num", "fiscal_month_num",
    "fiscal_quarter_num", "fiscal_yearmo_num",
    "full_date_desc", "day_num_in_week", "company_holiday_ind",
    "week_begin_date_nkey", "week_end_date_nkey", "year_quarter_num",
    "fiscal_week_num", "fiscal_year_quarter_num", "fiscal_half_year",
    "current_row_ind", "expiration_date",
)


def date_spine(spark: SparkSession, start: str | _dt.date,
               end: str | _dt.date) -> DataFrame:
    """One row per day in [start, end] — generated executor-side."""
    return spark.range(1).select(
        F.explode(
            F.sequence(F.to_date(F.lit(str(start))), F.to_date(F.lit(str(end))),
                       F.expr("interval 1 day"))
        ).alias("d")
    )


def build_dim_date(spark: SparkSession, start: str | _dt.date = "2013-01-01",
                   end: str | _dt.date = "2014-12-31",
                   fiscal_start_month: int = FISCAL_START_MONTH,
                   cached: bool = True) -> DataFrame:
    """The reference's DIM_DATE re-expressed as a deterministic plan.

    Defaults reproduce the reference's 730-day 2013-2014 calendar; the
    workload catalog spans it over the testdata's o_orderdate range.

    `cached` (default) materializes the dim once per (session, span) and
    reuses it — the reference's DIM_DATE is a *table* built once
    (rahil/load_dim_date.py:41-61), not a view re-derived per query, and
    every star query broadcasts it. A date dim is O(days) rows (~3k for
    8 years), so the in-memory copy is negligible at any scale.
    """
    key = ("dim_date", str(start), str(end), fiscal_start_month)
    cache: dict = getattr(spark, "_sae_relation_cache", None) or {}
    if not hasattr(spark, "_sae_relation_cache"):
        spark._sae_relation_cache = cache
    if cached and key in cache:
        return cache[key]
    attrs = date_attributes("d", fiscal_start_month)
    spine = date_spine(spark, start, end)
    df = spine.select(*[attrs[name].alias(name) for name in DIM_DATE_COLUMNS])
    if cached:
        df = df.persist()
        df.count()  # materialize eagerly, once
        cache[key] = df
    return df
