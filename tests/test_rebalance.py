"""sources.registry.rebalance_single_split gates (r6): rebalance ONLY
when the parquet footer attests the layout caps scan parallelism AND
the input is small; proper row-group layouts and big files keep their
natural splits — the 100 TB no-op-by-construction contract."""

from __future__ import annotations

import contextlib
import io
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from snowflake_azure_etl_spark.sources import registry


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _write(dirpath: str, name: str, row_group_size: int | None = None):
    tbl = pa.table({"id": list(range(10_000)),
                    "v": [float(i) for i in range(10_000)]})
    kwargs = {"row_group_size": row_group_size} if row_group_size else {}
    pq.write_table(tbl, os.path.join(dirpath, f"{name}.parquet"), **kwargs)


def test_single_row_group_is_rebalanced_and_cached(spark):
    d = tempfile.mkdtemp(prefix="rebal_")
    _write(d, "mono")                       # one row group
    rg, nbytes = registry.stage_scan_splits(d, "mono")
    assert rg == 1
    df = spark.read.parquet(f"{d}/mono.parquet")
    out = registry.rebalance_single_split(spark, df, d, "mono")
    plan = explain_str(out)
    assert "RoundRobinPartitioning" in plan or "InMemory" in plan
    assert out.count() == 10_000
    # same call → same cached relation (one compaction per session)
    again = registry.rebalance_single_split(spark, df, d, "mono")
    assert again is out


def test_many_row_groups_keep_natural_splits(spark):
    d = tempfile.mkdtemp(prefix="rebal_")
    _write(d, "split", row_group_size=100)  # 100 row groups >= parallelism
    rg, _ = registry.stage_scan_splits(d, "split")
    assert rg >= spark.sparkContext.defaultParallelism
    df = spark.read.parquet(f"{d}/split.parquet")
    out = registry.rebalance_single_split(spark, df, d, "split")
    assert out is df                        # untouched


def test_big_single_split_keeps_natural_splits(spark):
    d = tempfile.mkdtemp(prefix="rebal_")
    _write(d, "big")
    df = spark.read.parquet(f"{d}/big.parquet")
    out = registry.rebalance_single_split(spark, df, d, "big",
                                          max_bytes=1)  # force "too big"
    assert out is df


def test_missing_footer_is_a_noop(spark):
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    out = registry.rebalance_single_split(spark, df, "/nonexistent", "nope")
    assert out is df


def test_rebalanced_partitions_survive_aqe(spark):
    """The explicit partition count must not be coalesced away by AQE
    (an advisory-size coalesce back to ~1 partition would undo the
    whole point): the materialized relation really has cluster-width
    partitions."""
    d = tempfile.mkdtemp(prefix="rebal_")
    _write(d, "aqe")
    df = spark.read.parquet(f"{d}/aqe.parquet")
    out = registry.rebalance_single_split(spark, df, d, "aqe")
    out.count()                             # materialize the cache
    par = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == par
