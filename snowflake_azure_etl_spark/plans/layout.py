"""Physical data-layout strategies for the 100 TB design point.

The reference never controls physical layout — Snowflake micro-partitions
are opaque and automatic (the stage/COPY surface at
/root/reference/rahil/create_stages.py + load_data.py just lands rows).
On Spark, layout is the engine's job, and these three primitives are the
scale levers SCALE.md commits to:

- **Bucketed landing** (`land_bucketed` / `bucketed_join`): pre-shuffle a
  big table once at write time on its join key. Two tables co-bucketed on
  the same key join with NO exchange on either side — at 100 TB this
  turns the one genuinely wide fact⋈fact exchange (lineitem⋈orders on
  the order key) into a local zip of pre-sorted buckets.
- **Partitioned landing** (`land_partitioned`): directory-partition a
  fact by a low-cardinality time/tenant key so per-partition predicates
  prune whole directories at planning time (PartitionFilters), reading
  1/N of the lake instead of filtering after the scan.
- **Skew salting** (`salted_join`): when one join key carries a
  disproportionate share of rows (hot product, null-ish default key), a
  plain hash join sends that share to one task. Salting splits the big
  side's hot key across `salt` sub-keys and replicates the small side's
  matching rows — bounded memory per task, no stragglers. AQE's
  skew-join split handles sort-merge cases adaptively; explicit salting
  is the deterministic variant that also covers broadcast-ineligible
  aggregations-after-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def land_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                  sort: bool = True, mode: str = "overwrite") -> None:
    """Write `df` as a managed table bucketed (and bucket-sorted) on `key`.

    One shuffle now, zero shuffles for every subsequent equi-join or
    aggregation on `key`. Bucket count is a layout contract: both sides
    of a co-located join must use the same `buckets`.
    """
    writer = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  left_key: str, right_key: str,
                  how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables shuffle-free.

    The MERGE hint pins sort-merge so the demonstration is explicit
    (without it AQE may legitimately choose a broadcast for a small
    side — also shuffle-free, but not the layout being exercised).
    With both inputs bucketed on the join keys with equal bucket
    counts, the physical plan contains no Exchange: each task zips
    bucket i of the left with bucket i of the right.
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)


def land_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                     mode: str = "overwrite") -> None:
    """Write parquet directory-partitioned by `partition_cols`.

    Partition columns should be low-cardinality (date key, region,
    tenant): each distinct combination is a directory, and planning-time
    PartitionFilters skip non-matching directories without opening a
    file. High-cardinality keys belong in bucketing, not partitioning
    (a 10^6-directory listing is its own bottleneck).
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                how: str = "inner", salt: int = 16,
                salt_col: str = "_salt") -> DataFrame:
    """Skew-resistant equi-join: big side salted, small side replicated.

    Each big-side row gets a deterministic salt in [0, salt) (hash of
    the whole row — uniform, rerun-stable); the small side is exploded
    `salt`-fold so every (key, salt) bucket finds its match. The hot
    key's rows now hash to `salt` different reducers instead of one.

    Supported `how`: 'inner' and 'left' (big side preserved). Outer
    semantics on the *small* side would see the replicas — rejected.

    Cost model: small side grows ×salt (keep it dim-sized or use a
    higher-level broadcast join instead — salting only pays when the
    small side is above the broadcast threshold AND a key is hot).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    big_s = big.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in big.columns])),
               F.lit(salt)).cast("int"))
    small_s = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return big_s.join(small_s, on + [salt_col], how).drop(salt_col)


DEFAULT_MAX_BNL_BUILD_ROWS = 1_000_000


def guarded_theta_join(left: DataFrame, right: DataFrame, cond,
                       how: str = "inner",
                       max_build_rows: int = DEFAULT_MAX_BNL_BUILD_ROWS
                       ) -> DataFrame:
    """Non-equi (theta) join with the quadratic-blowup guard SURVEY §7
    commits to: the reference's OR-IS-NULL join shape
    (create_views.py:253-258) forces BroadcastNestedLoopJoin, whose
    cost is |left| × |right| — fine against a dim, catastrophic at
    fact×fact scale. This helper asserts the build (right) side is
    dim-sized BEFORE planning the join, with a bounded probe
    (limit(n+1).count() — never a full scan of an oversized side).

    For a genuinely big×big range/theta join the scale path is a
    coarse-bucket equi-join + residual predicate (see q45's docstring),
    not a bigger BNL.
    """
    n = right.limit(max_build_rows + 1).count()
    if n > max_build_rows:
        raise ValueError(
            f"theta-join build side has >{max_build_rows} rows; a "
            "BroadcastNestedLoopJoin at this size is quadratic — bucket "
            "the condition into an equi-join + residual predicate instead")
    return left.join(F.broadcast(right), cond, how)
