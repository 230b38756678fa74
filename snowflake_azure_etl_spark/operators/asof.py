"""As-of (point-in-time) join — a custom operator Spark lacks natively
(north-star extension; the reference has none either, SURVEY §2.3).

For each left row, attach the latest right row with the same key and
right_time <= left_time (backward as-of; the time-series / ML-feature
"most recent value as of event time" join).

Implementation: the union-and-window plan, not a join at all —
1. tag both sides, union them (right columns null on left rows),
2. one window partitioned by key, ordered by (time, side) with
   right-side-first tie order (so an exactly-equal timestamp is
   visible to the left row),
3. last(col, ignorenulls=True) over unbounded-preceding..current
   carries the most recent right values forward,
4. keep left rows.

Scale: exactly one shuffle (partition by key) + one sort — the same
cost as a sort-merge join, with no build side and no range-duplication
blowup. Ties on (key, right_time) must be resolved before the join
(dedupe_right helper) — same requirement DuckDB's ASOF JOIN has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_right(right: DataFrame, on: list[str], time_col: str,
                 tiebreak_col: str) -> DataFrame:
    """One row per (key, time): keeps each column's value from the row
    with the largest tiebreak value (deterministic as-of input)."""
    others = [c for c in right.columns
              if c not in (*on, time_col, tiebreak_col)]
    return (right.groupBy(*on, time_col)
            .agg(*[F.max_by(c, tiebreak_col).alias(c) for c in others]))


def asof_join_backward(left: DataFrame, right: DataFrame, on: list[str],
                       left_time: str, right_time: str) -> DataFrame:
    """left ⟕-asof right: every left row + the right row with the
    greatest right_time <= left_time per key (nulls when none).

    The matched right_time is exposed as `asof_<right_time>`; right
    value columns keep their names (must not collide with left's).
    """
    rcols = [c for c in right.columns if c not in (*on, right_time)]
    lt = (left.withColumn("_t", F.col(left_time))
          .withColumn("_side", F.lit(1)))
    rt = (right.select(*on, F.col(right_time).alias("_t"), *rcols)
          .withColumn("_side", F.lit(0))
          .withColumn("_rt", F.col("_t")))
    merged = lt.unionByName(rt, allowMissingColumns=True)
    # right (side 0) sorts before left (side 1) at equal time ⇒ a right
    # row at exactly left_time is already visible — the >= contract
    w = (Window.partitionBy(*on).orderBy("_t", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in [*rcols, "_rt"]:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return (merged.filter(F.col("_side") == 1)
            .drop("_t", "_side")
            .withColumnRenamed("_rt", f"asof_{right_time}"))
