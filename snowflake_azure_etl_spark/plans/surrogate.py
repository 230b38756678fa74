"""Surrogate key generation (SURVEY §4.3.2).

The reference relies on Snowflake IDENTITY(1,1)
(/root/reference/private_ddl/example_dimension_table.sql:3): unique,
stable, NOT guaranteed contiguous (observed gaps — SURVEY §1.3). Spark
has no identity columns; the engine's contract is:

- deterministic: key = dense rank of the business key ordering + offset,
  so rebuilding the same input yields the same keys (stronger than the
  reference, which renumbers on reload);
- parallel-safe: row_number over an explicit ORDER BY is a well-defined
  window, not monotonically_increasing_id() (whose values depend on
  partition layout);
- offset: reserves low key space for unknown members (key 1).

Scale note: a global row_number forces a single-partition window at the
very end of the dim build. Dims are small by definition (even at 100 TB
fact scale the dim side is ~millions of rows), so this is acceptable; for
a genuinely huge dim use `zip_with_index_keys` below which computes
per-partition offsets from partition sizes (two passes, no global sort
bottleneck beyond the explicit orderBy shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_surrogate_key(df: DataFrame, key_col: str, order_by: list[str | Column],
                       offset: int = 1) -> DataFrame:
    """Assign surrogate keys offset+1, offset+2, ... in business-key order.

    offset=1 leaves key 1 free for the unknown member (reference seeds it
    by hand — create_dimension_tables.py:91-130).
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(key_col, (F.row_number().over(w) + F.lit(offset)).cast("long"))


def zip_with_index_keys(df: DataFrame, key_col: str, offset: int = 1) -> DataFrame:
    """Partition-parallel key assignment for very large dims — all
    JVM-side (no Python row path anywhere):

    1. pin the partitioning (`_pid` = spark_partition_id) so both passes
       see identical partition membership;
    2. count rows per partition and prefix-sum the numPartitions counts
       on the driver (one tiny collect of ints — bounded by cluster
       parallelism, not data size);
    3. assign offset + prefix[pid] + local row_number, where the window
       partitions by `_pid` (each window group IS one data partition, so
       the sort is per-partition with no skew beyond the input's own)
       and orders by monotonically_increasing_id — increasing within a
       partition, so input order is preserved.

    Keys are unique and dense from offset+1; stable for a fixed
    partitioning. Re-partitioning changes the assignment (the
    reference's IDENTITY makes the same non-promise across reloads).
    """
    pinned = df.withColumn("_pid", F.spark_partition_id()) \
               .withColumn("_mid", F.monotonically_increasing_id())
    sizes = pinned.groupBy("_pid").count().collect()
    if not sizes:  # empty input: keep the schema, no rows to key
        return df.withColumn(key_col, F.lit(None).cast("long"))
    prefix: dict[int, int] = {}
    acc = 0
    for row in sorted(sizes, key=lambda r: r["_pid"]):
        prefix[row["_pid"]] = acc
        acc += row["count"]
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for pid, base in sorted(prefix.items())
                       for x in (pid, base)]),
        F.col("_pid"))
    w = Window.partitionBy("_pid").orderBy("_mid")
    return (pinned
            .withColumn(key_col,
                        (F.lit(offset) + offset_expr
                         + F.row_number().over(w)).cast("long"))
            .drop("_pid", "_mid"))
