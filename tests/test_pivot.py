"""PIVOT / UNPIVOT (melt) semantics: explicit-value pivot keeps the
plan static, and melt inverts it row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F


def _wide(spark):
    tall = spark.createDataFrame(
        [(2024, "F", 10.0), (2024, "O", 5.0), (2025, "F", 7.0)],
        "yr int, status string, amt double")
    return (tall.groupBy("yr").pivot("status", ["F", "O", "P"])
            .agg(F.sum("amt")))


def test_pivot_explicit_values(spark):
    rows = {r["yr"]: (r["F"], r["O"], r["P"])
            for r in _wide(spark).collect()}
    assert rows == {2024: (10.0, 5.0, None), 2025: (7.0, None, None)}


def test_pivot_explicit_values_no_distinct_scan(spark):
    """The explicit value list must keep pivot a pure plan transform —
    no job runs to enumerate pivot-column values (the implicit form
    collects distinct values to the driver, a non-starter on a 100 TB
    pivot column)."""
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    _wide(spark)  # plan only — no action
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before


def test_unpivot_inverts_pivot(spark):
    wide = _wide(spark)
    tall = (wide.unpivot("yr", ["F", "O", "P"], "status", "amt")
            .filter(F.col("amt").isNotNull()))
    assert sorted(tuple(r) for r in tall.collect()) == [
        (2024, "F", 10.0), (2024, "O", 5.0), (2025, "F", 7.0)]
