"""Content fingerprints (warehouse.manifest, X-MANIFEST): invariance
to layout (order, partitioning, compaction), sensitivity to content
change (drop / duplicate / mutate), the exact-sum overflow guarantee,
and the empty-relation NULL contract."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from snowflake_azure_etl_spark.warehouse import manifest


def _fp(df, *keys):
    return df.agg(manifest.content_fingerprint(*keys).alias("fp")) \
             .collect()[0]["fp"]


def test_invariant_to_order_partitioning_and_compaction(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = manifest.KEY_COLUMNS["lineitem"]
    base = _fp(li, *keys)
    assert base is not None and 0 <= base < manifest.FP_MOD
    assert _fp(li.repartition(13), *keys) == base
    assert _fp(li.orderBy(F.desc("l_partkey")), *keys) == base
    # a re-landed (compacted) copy fingerprints identically — the
    # verify-by-value check a pipeline runs after plans.layout moves
    # bytes around
    out = tempfile.mkdtemp(prefix="manifest_land_")
    li.repartition(1).write.mode("overwrite").parquet(out)
    assert _fp(spark.read.parquet(out), *keys) == base


def test_sensitive_to_content_changes(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = manifest.KEY_COLUMNS["lineitem"]
    base = _fp(li, *keys)
    one = li.limit(1)
    assert _fp(li.subtract(one), *keys) != base          # dropped row
    assert _fp(li.unionByName(one), *keys) != base       # duplicated row
    mutated = li.withColumn(
        "l_linenumber",
        F.when(F.col("l_orderkey") == one.collect()[0]["l_orderkey"],
               F.col("l_linenumber") + 1000).otherwise(F.col("l_linenumber")))
    assert _fp(mutated, *keys) != base                   # mutated key


def test_exact_at_sum_overflow_scale(spark):
    """9 max-hash-magnitude rows already exceed a BIGINT sum
    (2^63 < 9·(2^60−1)); the decimal path must stay exact. Verified
    against Python big-int arithmetic on the same hashes."""
    df = spark.range(9).select(F.col("id").cast("long").alias("k"))
    rows = df.select(manifest.row_key_hash("k").alias("h")).collect()
    want = sum(r["h"] for r in rows) % manifest.FP_MOD
    assert _fp(df, "k") == want
    # and the hashes are genuinely 60-bit scale, so the sum really
    # would overflow a BIGINT if summed naively
    assert sum(r["h"] for r in rows) > (1 << 62)


def test_empty_relation_fingerprints_null(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    assert _fp(df, "k") is None


def test_table_manifest_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = manifest.table_manifest(
        docs, "documents", manifest.KEY_COLUMNS["documents"]).collect()[0]
    assert row["entity"] == "documents"
    assert row["n_rows"] == docs.count()
    assert row["fp"] == _fp(docs, "doc_id")


def test_null_keys_hash_identically_in_both_engines(spark):
    """A NULL natural key is an integrity signal the manifest must
    fingerprint the SAME way in Spark (concat_ws skips NULLs) and the
    SQL oracle (|| propagates them) — the r8 review counterexample:
    without the sentinel, the engines disagree on NULL-bearing data."""
    import duckdb

    rows = [(1, 1), (2, None), (None, 3), (None, None)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = df.agg(manifest.content_fingerprint("a", "b").alias("fp")) \
            .collect()[0]["fp"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        manifest.fingerprint_sql("t", ("a", "b"))).fetchone()[0]
    assert got == want
    # and the NULL rows genuinely participate (vs the keyed-only sum)
    non_null = df.filter("a IS NOT NULL AND b IS NOT NULL")
    partial = non_null.agg(
        manifest.content_fingerprint("a", "b").alias("fp")).collect()[0]["fp"]
    assert got != partial
