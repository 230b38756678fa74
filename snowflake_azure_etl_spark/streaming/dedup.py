"""Streaming deduplication (north-star extension): the streaming twin
of `operators.dedup.exact_dedup_groups` — a training-data ingest
pipeline deduplicates *as documents arrive*, not in a nightly batch.

Spark-first shape: content-hash the payload, then the engine's own
stateful `dropDuplicates` family keeps first-arrival per hash — the
dedup state lives in the state store (RocksDB/HDFS-backed at cluster
scale), not in user code.

Scale design:
- state is one entry per DISTINCT content hash, not per row — the
  theoretical minimum for exact streaming dedup;
- with an event-time watermark (`dropDuplicatesWithinWatermark`) the
  state store prunes hashes older than the delay: bounded state under
  the standard assumption that true duplicates arrive within the
  window (the right contract for crawl/ingest streams, where re-crawls
  cluster in time). Without a watermark the state grows with corpus
  distincts — correct, but only for bounded backfills;
- the md5 hash is computed pre-state (a narrow projection), so the
  state key is fixed-width regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(stream: DataFrame, content_col: str = "text",
                 ts_col: str | None = None,
                 watermark: str | None = None) -> DataFrame:
    """Emit only the first-arriving row per content hash.

    With (`ts_col`, `watermark`) set, uses
    `dropDuplicatesWithinWatermark` so the state store evicts hashes
    once the watermark passes them (bounded state); otherwise plain
    stateful `dropDuplicates` (exact over the whole stream, state =
    distinct hashes).

    Eviction boundary (pinned by
    test_stream_dedup_watermark_eviction_replays_late_duplicate): a
    duplicate separated from its original by MORE than the delay is
    emitted again after the state is pruned — the deliberate
    bounded-state trade. Cleanup runs at micro-batch END, after that
    batch's lookups, so suppression still applies within the batch
    that first observes the advanced watermark."""
    hashed = stream.withColumn("content_hash",
                               F.md5(F.col(content_col)))
    if ts_col is not None and watermark is not None:
        return (hashed.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["content_hash"]))
    return hashed.dropDuplicates(["content_hash"])
