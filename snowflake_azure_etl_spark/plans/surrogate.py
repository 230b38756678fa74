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
    """Partition-parallel key assignment for very large dims.

    Computes per-partition row counts, prefix-sums them on the driver
    (one tiny collect of numPartitions ints), and assigns
    offset + prefix + local_index without any global sort. Keys are unique
    and stable for a fixed partitioning; document that re-partitioning
    changes the assignment (the reference's IDENTITY makes the same
    non-promise across reloads).
    """
    sizes = df.rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, sum(1 for _ in it))]).collect()
    prefix = {}
    acc = 0
    for i, n in sorted(sizes):
        prefix[i] = acc
        acc += n

    schema_names = df.columns

    def assign(i, it):
        base = offset + prefix[i]
        for j, row in enumerate(it):
            yield (*row, base + j + 1)

    rdd = df.rdd.mapPartitionsWithIndex(assign)
    return rdd.toDF(schema_names + [key_col])
