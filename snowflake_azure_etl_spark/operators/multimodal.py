"""Multimodal column handling (north-star extension).

Images / audio / video are opaque `binary` columns with typed metadata.
The Spark-side plumbing here is real and tested — schemas, Arrow-batched
mapInPandas operators, partitioning — while the actual media decode is
STUBBED: the container has no image/audio libraries, so `decode_media`
raises NotImplementedError unless `stub=True`, in which case it produces
a deterministic fake derived from the payload's md5 (so the pipeline is
end-to-end testable and oracle-checkable).

Scale design: mapInPandas streams Arrow batches through Python — the
only sane shape for per-blob CPU work (decode, resize, frame-sample) at
100 TB. Batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch; blobs never hit the
driver. Feature extraction downstream of decode stays columnar.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, media_type string, byte_len int, "
                "feature_sig string, width int, height int")


def to_media_table(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Wrap a text corpus as a fake media table: payload = utf-8 bytes of
    the text (stands in for image bytes), plus declared metadata."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a real decoder: 8-hex-char feature
    signature + fake dimensions, all derived from the payload md5."""
    digest = hashlib.md5(payload).hexdigest()
    width = 64 + int(digest[0:2], 16) % 64
    height = 64 + int(digest[2:4], 16) % 64
    return digest[:8], width, height


def decode_media(media: DataFrame, stub: bool = True) -> DataFrame:
    """Decode/feature-extract pass over a media table via mapInPandas.

    stub=False is the real-decoder path and raises NotImplementedError
    (no PIL/ffmpeg in this environment); stub=True runs the
    deterministic fake so partitioning, batch shape, and schema are
    exercised for real.
    """
    if not stub:
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present "
            "in this environment; use stub=True")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_len": pdf["payload"].map(len).astype("int32"),
                "feature_sig": decoded.map(lambda t: t[0]),
                "width": decoded.map(lambda t: t[1]).astype("int32"),
                "height": decoded.map(lambda t: t[2]).astype("int32"),
            })

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = ("doc_id long, media_type string, width int, height int, "
                  "out_width int, out_height int")


def resize_media(media: DataFrame, max_dim: int = 64,
                 stub: bool = True) -> DataFrame:
    """Resize pass: scale each item so its longest side is max_dim,
    preserving aspect ratio (truncating division — engine-portable).
    Real resampling is stubbed (no PIL); geometry + plumbing are real."""
    if not stub:
        raise NotImplementedError("real resize requires an image library; "
                                  "use stub=True")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_fake_decode)
            w = decoded.map(lambda t: t[1])
            h = decoded.map(lambda t: t[2])
            longest = pd.concat([w, h], axis=1).max(axis=1)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": w.astype("int32"),
                "height": h.astype("int32"),
                "out_width": (w * max_dim // longest).astype("int32"),
                "out_height": (h * max_dim // longest).astype("int32"),
            })

    return media.mapInPandas(op, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_sig string"


def frame_sample(media: DataFrame, n_frames: int = 4,
                 stub: bool = True) -> DataFrame:
    """Frame-sampling pass (video analog): emit n_frames rows per item,
    each with a deterministic per-frame signature md5(payload ++ ':i').
    One input batch → n× output rows, all inside the Arrow stream —
    the fan-out never touches the driver."""
    if not stub:
        raise NotImplementedError("real frame extraction requires ffmpeg; "
                                  "use stub=True")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for i in range(n_frames):
                sig = pdf["payload"].map(
                    lambda p, i=i: hashlib.md5(p + f":{i}".encode())
                    .hexdigest()[:8])
                frames.append(pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "frame_idx": i,
                    "frame_sig": sig,
                }))
            yield pd.concat(frames, ignore_index=True)

    return media.mapInPandas(op, schema=FRAMES_SCHEMA)
