"""Stream-stream time-bounded join (streaming/joins.py): the
incremental join across real micro-batches must produce exactly the
batch join's row set, and the plan must carry watermarks on both sides
(the state-pruning contract)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from snowflake_azure_etl_spark.sources.registry import load_tables
from snowflake_azure_etl_spark.streaming import events as sev
from snowflake_azure_etl_spark.streaming.joins import (
    purchases_with_recent_views)

#: streaming micro-batch waits dominate the suite wall-clock (VERDICT r13
#: next #6): the whole module is `slow` — included by default, deselect
#: with -m 'not slow' for the fast loop (pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def staged_events_dir(spark, sf_dir):
    """Files are TIME-RANGED (file k+1 strictly after file k) so the
    stream arrives in order, as a real ingest does — a randomly
    scattered file split would make whole hours arrive later than the
    watermark allows, and the engine would (correctly) drop them."""
    d = tempfile.mkdtemp(prefix="events_ssj_")
    e = load_tables(spark, sf_dir, ("events",))["events"]
    (e.repartitionByRange(4, "ts").sortWithinPartitions("ts")
     .write.mode("overwrite").parquet(d))
    # the file source orders batches by modification time; the parallel
    # write finishes part files in racy order, so pin mtimes to the
    # range order or arrival can be time-disordered past the watermark
    import glob
    import os
    import time as _time
    base = _time.time() - 1000
    for i, f in enumerate(sorted(glob.glob(f"{d}/part-*"))):
        os.utime(f, (base + i, base + i))
    return d


def _sides(df):
    p = (df.filter(F.col("event_type") == "purchase")
         .select("event_id", "user_id", "ts"))
    v = (df.filter(F.col("event_type") == "view")
         .select("event_id", "user_id", "ts", "value"))
    return p, v


def test_stream_stream_join_matches_batch(spark, staged_events_dir):
    stream = (spark.readStream.format("parquet")
              .schema(sev.EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .load(staged_events_dir))
    sp, sv = _sides(stream)
    joined = purchases_with_recent_views(sp, sv)
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("t_ssj").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.purchase_id, r.view_id)
           for r in spark.table("t_ssj").collect()}

    batch = spark.read.parquet(staged_events_dir)
    bp, bv = _sides(batch)
    want = {(r.purchase_id, r.view_id)
            for r in purchases_with_recent_views(bp, bv).collect()}
    assert got == want
    assert got, "no purchase/view pairs within the window — fixture dead"


def test_stream_stream_join_state_is_watermarked(spark, staged_events_dir):
    stream = (spark.readStream.format("parquet")
              .schema(sev.EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", "2")
              .load(staged_events_dir))
    sp, sv = _sides(stream)
    joined = purchases_with_recent_views(sp, sv)
    # both inputs must carry event-time watermarks into the join node
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2


def test_stream_static_enrichment_matches_batch(spark, sf_dir,
                                                staged_events_dir):
    """Stream-static dim enrichment across real micro-batches must
    equal the batch join, carry NO stream state (stateful operator
    count 0 — the static side buffers nothing), and keep the
    per-batch join broadcast."""
    from snowflake_azure_etl_spark.streaming.joins import enrich_with_dim
    dim = (load_tables(spark, sf_dir, ("customer",))["customer"]
           .select(F.col("c_custkey").alias("user_id"),
                   F.col("c_mktsegment").alias("segment")))
    stream = (spark.readStream.format("parquet")
              .schema(sev.EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .load(staged_events_dir))
    enriched = (enrich_with_dim(stream, dim, ["user_id"])
                .select("event_id", "user_id", "segment"))
    q = (enriched.writeStream.outputMode("append").format("memory")
         .queryName("t_enrich").start())
    try:
        q.processAllAvailable()
        prog = q.lastProgress
        assert prog is None or not prog["stateOperators"]
    finally:
        q.stop()
    got = sorted(map(tuple, spark.sql(
        "SELECT * FROM t_enrich").collect()))
    batch = load_tables(spark, sf_dir, ("events",))["events"]
    want = sorted(map(tuple, enrich_with_dim(
        batch, dim, ["user_id"])
        .select("event_id", "user_id", "segment").collect()))
    assert got == want and len(got) > 0
