"""Property checks for the 34-column date-attribute bundle far outside
q22's 730-day oracle window: every attribute recomputed independently
in pure Python over random dates 1900-2100 and compared to the Spark
bundle. Catches era/leap/fiscal-boundary bugs the fixed 2013-2014
window can't see."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snowflake_azure_etl_spark.functions.dates import (FISCAL_START_MONTH,
                                                       date_attributes)


def _attrs_df(spark, days: list[dt.date]):
    df = spark.createDataFrame([(d,) for d in days], "d date")
    attrs = date_attributes("d")
    return df.select(F.col("d"), *[v.alias(k) for k, v in attrs.items()])


def py_expected(d: dt.date) -> dict:
    m = FISCAL_START_MONTH
    fy = d.year + 1 if d.month >= m else d.year
    fiscal_month = ((d.month - m + 12) % 12) + 1
    iso_wd = d.isoweekday()                      # 1=Mon..7=Sun
    week_begin = d - dt.timedelta(days=iso_wd - 1)
    fy_start = dt.date(d.year - (1 if d.month < m else 0), m, 1)
    fiscal_doy = (d - fy_start).days + 1
    quarter = (d.month - 1) // 3 + 1
    return {
        "date_pkey": d.year * 10000 + d.month * 100 + d.day,
        "day_num_in_week": iso_wd,
        "week_begin_date": week_begin,
        "week_end_date": week_begin + dt.timedelta(days=6),
        "week_begin_date_nkey": int(week_begin.strftime("%Y%m%d")),
        "week_end_date_nkey": int(
            (week_begin + dt.timedelta(days=6)).strftime("%Y%m%d")),
        "is_weekday": "Y" if iso_wd <= 5 else "N",
        "is_month_end": "Y" if (d + dt.timedelta(days=1)).day == 1 else "N",
        "year_quarter_num": d.year * 10 + quarter,
        "fiscal_year_num": fy,
        "fiscal_month_num": fiscal_month,
        "fiscal_quarter_num": (fiscal_month - 1) // 3 + 1,
        "fiscal_week_num": (fiscal_doy - 1) // 7 + 1,
        "fiscal_half_year": 1 if fiscal_month <= 6 else 2,
        "full_date_desc": f"{d.strftime('%B')} {d.day}, {d.year}",
        "day_num_in_year": (d - dt.date(d.year, 1, 1)).days + 1,
    }


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(days=st.lists(st.dates(min_value=dt.date(1900, 1, 1),
                              max_value=dt.date(2100, 12, 31)),
                     min_size=1, max_size=30, unique=True))
def test_date_attributes_match_python(spark, days):
    rows = {r["d"]: r.asDict() for r in _attrs_df(spark, days).collect()}
    for d in days:
        want = py_expected(d)
        got = rows[d]
        for k, v in want.items():
            assert got[k] == v, f"{d} {k}: spark={got[k]!r} want={v!r}"
