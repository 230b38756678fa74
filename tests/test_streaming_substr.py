"""Streaming substring-scrub maintenance (streaming/substr.py): each
epoch's scrub equals the batch operator probing the merged
earlier-epoch index, cross-epoch planted runs are caught, epoch replay
changes nothing, and the index rollup equals the one-shot build."""

from __future__ import annotations

import pytest
import os
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from snowflake_azure_etl_spark.operators import dedup
from snowflake_azure_etl_spark.streaming.sinks import EPOCH_COL
from snowflake_azure_etl_spark.streaming.substr import (
    substr_index_rollup, substr_scrub_ingest_sink)
from snowflake_azure_etl_spark.warehouse import ddl

#: streaming micro-batch waits dominate the suite wall-clock (VERDICT r13
#: next #6): the whole module is `slow` — included by default, deselect
#: with -m 'not slow' for the fast loop (pytest.ini)
pytestmark = pytest.mark.slow


RUN = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
BATCHES = [
    # epoch 0: plants the run once (no repeat yet -> survives)
    [(1, "intro words here " + RUN + " tail one"),
     (2, "a wholly unrelated document body")],
    # epoch 1: the run reappears -> scrubbed HERE (epoch-0 output is
    # already emitted; a stream cannot retro-scrub)
    [(10, RUN + " fresh ending two"),
     (11, "another clean unrelated text")],
    # epoch 2: intra-batch repeat only
    [(20, "q1 q2 q3 q4 q5 q6 q7 q8 mid q1 q2 q3 q4 q5 q6 q7 q8")],
]


def _table(spark, name):
    db = "substr_stream_db"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    t = f"{db}.{name}"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    ddl.drop_orphan_location(spark, t)
    return t


def _stream_dir(batches):
    d = tempfile.mkdtemp(prefix="sx_stream_")
    base = time.time() - 100
    for i, rows in enumerate(batches):
        path = os.path.join(d, f"batch_{i}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }), path)
        os.utime(path, (base + i, base + i))
    return d


def _run(spark, sink, batches):
    src = _stream_dir(batches)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", tempfile.mkdtemp(prefix="sx_ck_"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_stream_scrub_matches_batch_operator_per_epoch(spark):
    ti, ts = _table(spark, "sx_index"), _table(spark, "sx_scrub")
    _run(spark, substr_scrub_ingest_sink(ti, ts), BATCHES)
    got = {r["doc_id"]: (r["n_removed"], r["cleaned"])
           for r in spark.table(ts).collect()}
    # epoch 0: run seen once -> survives; epoch 1: cross-epoch repeat
    # scrubbed; epoch 2: intra-batch repeat scrubbed
    assert got[1][0] == 0 and "alpha" in got[1][1]
    assert got[2][0] == 0
    assert got[10][0] == 10 and "alpha" not in got[10][1]
    assert got[11][0] == 0
    assert got[20] == (16, "mid")
    # every epoch's report equals the BATCH operator probing the
    # merged earlier-epoch index
    for ep, rows in enumerate(BATCHES):
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        earlier = [r2 for e2 in range(ep) for r2 in BATCHES[e2]]
        if earlier:
            idx = dedup.window_hash_index(spark.createDataFrame(
                earlier, "doc_id long, text string"))
        else:
            idx = dedup.window_hash_index(batch).limit(0)
        ref = {r["doc_id"]: (r["n_removed"], r["cleaned"])
               for r in dedup.incremental_scrub_duplicate_substrings(
                   batch, idx).collect()}
        for did, _ in rows:
            assert got[did] == ref[did], (ep, did)


def test_stream_replay_and_rollup(spark):
    ti, ts = _table(spark, "sx_index_r"), _table(spark, "sx_scrub_r")
    sink = substr_scrub_ingest_sink(ti, ts)
    _run(spark, sink, BATCHES)
    before_scrub = sorted(map(tuple, spark.table(ts).collect()))
    before_idx = sorted(map(tuple, substr_index_rollup(spark, ti)
                            .collect()))
    # deliberate at-least-once replay of epoch 1
    sink(spark.createDataFrame(BATCHES[1], "doc_id long, text string"), 1)
    assert sorted(map(tuple, spark.table(ts).collect())) == before_scrub
    assert sorted(map(tuple, substr_index_rollup(spark, ti)
                      .collect())) == before_idx
    # rollup == one-shot index over the concatenated stream
    whole = spark.createDataFrame(
        [r for b in BATCHES for r in b], "doc_id long, text string")
    direct = sorted(map(tuple, dedup.window_hash_index(whole).collect()))
    assert before_idx == direct


def test_rollup_reads_legacy_table_without_min_len(spark):
    """Review finding r11: a pre-provenance index table (no min_len
    column) must still roll up — the shim assumes the caller's
    configured width instead of crashing the stream."""
    t = _table(spark, "sx_legacy")
    docs = spark.createDataFrame(BATCHES[0], "doc_id long, text string")
    legacy = (dedup.window_hash_index(docs).drop("min_len")
              .withColumn(EPOCH_COL, F.lit(0).cast("long")))
    legacy.write.partitionBy(EPOCH_COL).format("parquet").saveAsTable(t)
    got = {r["window_hash"]: (r["n_occurrences"], r["min_len"])
           for r in substr_index_rollup(spark, t).collect()}
    want = {r["window_hash"]: (r["n_occurrences"], 8)
            for r in dedup.window_hash_index(docs).collect()}
    assert got == want
