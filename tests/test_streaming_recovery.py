"""Checkpoint-based restart recovery: a streaming aggregation stopped
after consuming half its input and restarted from its checkpoint must
RESUME (state + committed offsets), not restart. Proof: the
already-processed files are deleted before the restart — only
checkpointed state can account for their counts — and the recovered
totals must equal the batch answer over ALL the data. This is the
stop/recover half of the exactly-once story; the replay-safe sink test
covers the write half."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from snowflake_azure_etl_spark.sources.registry import load_tables
from snowflake_azure_etl_spark.streaming import events as sev

#: streaming micro-batch waits dominate the suite wall-clock (VERDICT r13
#: next #6): the whole module is `slow` — included by default, deselect
#: with -m 'not slow' for the fast loop (pytest.ini)
pytestmark = pytest.mark.slow



def test_restart_from_checkpoint_resumes_not_restarts(spark, sf_dir):
    src = tempfile.mkdtemp(prefix="events_recov_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    out_table = "t_recov_counts"

    e = load_tables(spark, sf_dir, ("events",))["events"] \
        .select(*[f.name for f in sev.EVENTS_SCHEMA.fields])
    half1 = e.filter(F.col("event_id") % 2 == 0)
    half2 = e.filter(F.col("event_id") % 2 == 1)
    # expected = batch answer over BOTH halves, computed up front
    want = {(r.w.start, r.event_type): r.n
            for r in e.groupBy(F.window("ts", "1 hour").alias("w"),
                               "event_type")
            .agg(F.count("*").alias("n")).collect()}

    half1.repartition(2).write.mode("append").parquet(src)

    def start():
        stream = (spark.readStream.format("parquet")
                  .schema(sev.EVENTS_SCHEMA)
                  .option("maxFilesPerTrigger", "1")
                  .load(src))
        agg = sev.tumbling_counts(stream)
        return (agg.writeStream.outputMode("complete").format("memory")
                .queryName(out_table)
                .option("checkpointLocation", ckpt).start())

    # phase 1: consume half the corpus, then stop (mid-stream shutdown)
    q1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()

    # land the second half, then DELETE the processed files: after this,
    # the first half exists only inside the checkpointed state
    processed = set(glob.glob(f"{src}/part-*"))
    half2.repartition(2).write.mode("append").parquet(src)
    for f in processed:
        os.remove(f)

    # phase 2: restart from the same checkpoint; must pick up ONLY the
    # new files and merge them into the recovered state
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {(r.window_start, r.event_type): r.n_events
           for r in spark.table(out_table).collect()}
    assert got == want, "recovered stream diverged from the batch answer"
