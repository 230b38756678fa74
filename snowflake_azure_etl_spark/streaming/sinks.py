"""Streaming sinks with replay-safe (effectively-once) semantics.

Structured Streaming guarantees at-least-once delivery to foreachBatch:
after a failure the last epoch is REPLAYED, so a naive append sink
duplicates it. The canonical fix (Structured Streaming programming
guide, foreachBatch section) is to make the write idempotent on
`epoch_id`. `idempotent_epoch_sink` lands each micro-batch into an
epoch-partitioned parquet table with DYNAMIC partition overwrite:
replaying epoch N overwrites partition N in place — same rows, no
duplicates — while other epochs are untouched.

Scale notes: one directory per epoch keeps the overwrite scoped to the
replayed batch (not the table); downstream readers prune on the epoch
column like any partition key; compaction (re-landing many small epoch
partitions into date-grain partitions via plans.layout.land_partitioned)
is an offline concern, not a sink concern.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPOCH_COL = "_epoch_id"


def idempotent_epoch_sink(table: str,
                          epoch_col: str = EPOCH_COL,
                          sub_partition_cols: "tuple[str, ...]" = ()
                          ) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function whose writes are idempotent per
    epoch: `writeStream.foreachBatch(idempotent_epoch_sink("db.t"))`.

    Replays of a failed epoch overwrite that epoch's partition instead
    of appending a second copy — the exactly-once-in-effect contract
    for non-transactional parquet targets.

    `sub_partition_cols` adds partition levels UNDER the epoch (e.g.
    a deterministic hash-shard column) so later readers can prune the
    table below epoch grain; a deterministic batch re-lands the same
    sub-partitions on replay, so dynamic overwrite keeps the
    exactly-once-in-effect contract unchanged.
    """

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        out = batch_df.withColumn(epoch_col,
                                  F.lit(int(epoch_id)).cast("long"))
        if not spark.catalog.tableExists(table):
            # Bootstrap = schema DDL only (ADVICE r4): register the
            # table EMPTY (overwrite clears any half-written leftovers
            # from a crashed earlier bootstrap), then fall through to
            # the same per-epoch overwrite path as every other epoch —
            # so a replayed first epoch is idempotent too, with no
            # ErrorIfExists window between data write and registration.
            (out.limit(0).write.mode("overwrite")
             .partitionBy(epoch_col, *sub_partition_cols)
             .format("parquet")
             .saveAsTable(table))
        mode_key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(mode_key, "static")
        spark.conf.set(mode_key, "dynamic")
        try:
            # insertInto is position-based; align to the table layout
            cols = spark.table(table).columns
            out.select(*cols).write.mode("overwrite").insertInto(table)
        finally:
            spark.conf.set(mode_key, prev)

    return write


def vacuum_epochs(spark: SparkSession, table: str, keep_from: int,
                  epoch_col: str = EPOCH_COL) -> int:
    """Retention for epoch-partitioned sink tables: drop every epoch
    partition BELOW `keep_from` (the watermark the caller derives from
    its replay/compliance policy) and return how many were dropped.

    The other half of the epoch-sink lifecycle (compaction re-lands
    surviving epochs into coarser partitions; vacuum bounds the
    partition count and enforces retention). Partition-METADATA-only
    end to end: epochs are discovered via SHOW PARTITIONS (catalog
    listing — a distinct() over the data would scan every epoch's
    files and silently miss registered-but-empty partitions) and
    removed with batched ALTER TABLE … DROP statements — no data
    pass, no rewrite of surviving epochs; cost is O(dropped
    partitions), never O(rows). Drops are CHUNKED (ADVICE r8): a
    months-idle stream can owe tens of thousands of stale epochs, and
    one ALTER listing them all can exceed parser/metastore statement
    limits — a few hundred specs per statement keeps each round-trip
    bounded while staying O(dropped/chunk) calls. A partition value
    that doesn't parse as an epoch id (corruption, a manually created
    directory) is SKIPPED with a warning instead of failing the whole
    vacuum before anything is dropped — retention must not be
    hostage to one stray directory.
    Idempotent: a rerun with the same watermark drops nothing. A
    replay of a vacuumed epoch would re-create its partition (the
    idempotent sink writes by epoch id); callers must therefore only
    vacuum below their checkpoint's committed offset — the same
    watermark discipline as any state-store eviction."""
    parts = [r[0] for r in spark.sql(f"SHOW PARTITIONS {table}").collect()]
    eps_set, bad, leaves = set(), [], []
    for p in parts:
        if not p.startswith(f"{epoch_col}="):
            continue
        # sub-partitioned sinks (idempotent_epoch_sink's
        # sub_partition_cols) list one row PER LEAF partition —
        # '_epoch_id=N/_hb=K' — so parse the epoch from the FIRST path
        # level (ADVICE r16 #1: the full string failed int() and
        # retention silently no-op'd on exactly the sharded winner
        # tables) and drop by FULL leaf spec: a partial
        # PARTITION (_epoch_id = e) spec under DROP IF EXISTS matches
        # no leaf of a multi-level table and silently drops nothing
        # (verified live).
        levels = [seg.split("=", 1) for seg in p.split("/")]
        raw = levels[0][1]
        try:
            e = int(raw)
        except ValueError:
            bad.append(raw)
            continue
        if e < keep_from:
            eps_set.add(e)
            leaves.append(", ".join(
                "{} = '{}'".format(k, v.replace("'", "''"))
                for k, v in levels))
    if bad:
        import warnings
        warnings.warn(
            f"vacuum_epochs({table}): skipped {len(bad)} partition "
            f"value(s) that do not parse as epoch ids: {bad[:5]}")
    leaves.sort()
    chunk = 200
    for i in range(0, len(leaves), chunk):
        specs = ", ".join(f"PARTITION ({leaf})"
                          for leaf in leaves[i:i + chunk])
        spark.sql(f"ALTER TABLE {table} DROP IF EXISTS {specs}")
    if leaves:
        spark.catalog.refreshTable(table)
    return len(eps_set)
