"""Partition-parallel exclusive prefix sum over a global ordering.

The general form of `plans.surrogate.ranged_dense_keys` (whose keys
are the prefix sum of weight 1): a global running total in `order_by`
order, computed without a single-partition window.

Physical plan (all JVM-side):

1. range-repartition on the order key — disjoint ordered ranges;
2. pin membership (`_pid` = spark_partition_id) and PERSIST so the
   two passes below see the same partitioning;
3. per-partition weight totals (numPartitions rows) collected to the
   driver and turned into a `_pid -> cumulative-offset` map literal —
   bounded by cluster parallelism, never by data;
4. per-partition exclusive window sum + the partition's offset.

Global order = range order + in-partition order, so for a unique
`order_by` the result equals the global `SUM(w) OVER (ORDER BY …
ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)` — the oracle
expression — with the sort fully parallel.

Partition drift between the size pass and the sum pass (impossible
while the pinned relation stays persisted) FAILS LOUDLY through the
same raise_error discipline as the surrogate keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _offset_map_expr(sums: list, what: str) -> Column:
    prefix: dict[int, int] = {}
    acc = 0
    for row in sorted(sums, key=lambda r: r["_pid"]):
        prefix[row["_pid"]] = acc
        acc += row["_wsum"] or 0
    mapped = F.element_at(
        F.create_map(*[F.lit(x) for pid, base in sorted(prefix.items())
                       for x in (pid, base)]),
        F.col("_pid"))
    return F.when(
        mapped.isNull(),
        F.raise_error(F.concat(
            F.lit(f"{what}: partition id "),
            F.col("_pid").cast("string"),
            F.lit(" not seen by the size pass — partitioning drifted "
                  "between passes"))).cast("long")
    ).otherwise(mapped)


def _pinned_and_sums(df: DataFrame, weight: Column,
                     order_by: list[str | Column],
                     num_partitions: int | None) -> tuple[DataFrame, list]:
    """The shared first phase: range-repartition, pin membership,
    persist, collect per-partition totals. The pinned relation is
    registered in the SESSION cache (keyed by its logical plan) so
    (a) repeat builds of the same prefix sum reuse one persisted
    relation instead of stacking a new entry per call — the
    corpus.py/lm-gate leak class, found here by the r13 review on the
    tercile maintenance path — and (b) `clear_cache` owns the release
    (the relation must STAY persisted while its result is live: the
    partition-drift guard's correctness depends on it, see module
    docstring)."""
    from ..operators._cache import cached_relation
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    pinned = cached_relation(
        df.repartitionByRange(nparts, *order_by)
        .withColumn("_w", weight.cast("long"))
        .withColumn("_pid", F.spark_partition_id()),
        "ranged_prefix_pinned", eager=False)
    sums = pinned.groupBy("_pid").agg(F.sum("_w").alias("_wsum")).collect()
    return pinned, sums


def ranged_prefix_sum(df: DataFrame, weight: Column, out_col: str,
                      order_by: list[str | Column],
                      num_partitions: int | None = None) -> DataFrame:
    """`df` + `out_col` = exclusive prefix sum of `weight` in global
    `order_by` order, partition-parallel (see module docstring)."""
    pinned, sums = _pinned_and_sums(df, weight, order_by,
                                    num_partitions)
    if not sums:  # empty input: keep the schema, no rows
        return df.withColumn(out_col, F.lit(None).cast("long"))
    offset = _offset_map_expr(sums, "ranged_prefix_sum")
    w = (Window.partitionBy("_pid").orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (pinned
            .withColumn(out_col,
                        offset + F.coalesce(F.sum("_w").over(w), F.lit(0)))
            .drop("_pid", "_w"))


def ranged_prefix_sum_and_total(df: DataFrame, weight: Column,
                                out_col: str,
                                order_by: list[str | Column],
                                num_partitions: int | None = None
                                ) -> tuple[DataFrame, int]:
    """`ranged_prefix_sum` plus the GRAND total of `weight` — the
    driver already holds the per-partition sums it prefixes, so a
    consumer needing Σw (lm_terciles' scored-document count) reads it
    for free instead of launching a second aggregation over the input
    (r13 review)."""
    pinned, sums = _pinned_and_sums(df, weight, order_by,
                                    num_partitions)
    if not sums:
        return df.withColumn(out_col, F.lit(None).cast("long")), 0
    total = sum(int(r["_wsum"] or 0) for r in sums)
    offset = _offset_map_expr(sums, "ranged_prefix_sum_and_total")
    w = (Window.partitionBy("_pid").orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, -1))
    out = (pinned
           .withColumn(out_col,
                       offset + F.coalesce(F.sum("_w").over(w), F.lit(0)))
           .drop("_pid", "_w"))
    return out, total


def window_prefix_sum(df: DataFrame, weight: Column, out_col: str,
                      order_by: list[str | Column]) -> DataFrame:
    """The small-input twin: one global window — a single-partition
    sort, the right plan when the whole relation fits one task."""
    w = (Window.orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, -1))
    return df.withColumn(
        out_col,
        F.coalesce(F.sum(weight.cast("long")).over(w), F.lit(0)))
