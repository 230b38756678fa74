"""REAL video path (operators.multimodal Y4M): hand-built YUV4MPEG2
streams with VARIED frame contents — parse, temporal sampling,
per-frame fingerprints — vs an independent Python reference; C420
plane-size handling; format gates; engine-built payload validity."""

from __future__ import annotations

import hashlib

import pytest

from snowflake_azure_etl_spark.operators import multimodal as M


def _y4m(w, h, frames, cs="444", frame_params=b""):
    hdr = f"YUV4MPEG2 W{w} H{h} F25:1 C{cs}\n".encode()
    return hdr + b"".join(b"FRAME" + frame_params + b"\n" + f
                          for f in frames)


def test_parse_varied_frames_c444():
    w, h = 4, 3
    frames = [bytes((i * 37 + j) % 251 for j in range(w * h * 3))
              for i in range(5)]
    pw, ph, cs, got = M._parse_y4m(_y4m(w, h, frames))
    assert (pw, ph, cs) == (4, 3, "444") and got == frames


def test_parse_c420_plane_size_and_default_colorspace():
    w, h = 4, 2
    frames = [bytes(range(w * h * 3 // 2))]
    hdr = f"YUV4MPEG2 W{w} H{h} F25:1\n".encode()  # C omitted -> 420jpeg
    payload = hdr + b"FRAME\n" + frames[0]
    pw, ph, cs, got = M._parse_y4m(payload)
    assert cs == "420jpeg" and got == frames


def test_format_gates():
    with pytest.raises(ValueError, match="even dimensions"):
        M._parse_y4m(b"YUV4MPEG2 W3 H2 C420\nFRAME\n" + b"x" * 9)
    with pytest.raises(ValueError, match="unsupported Y4M colorspace"):
        M._parse_y4m(b"YUV4MPEG2 W2 H2 C422\nFRAME\n" + b"x" * 8)
    with pytest.raises(ValueError, match="truncated Y4M frame"):
        M._parse_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + b"x" * 5)
    with pytest.raises(ValueError, match="unsupported video format"):
        M._real_decode_video(b"\x00\x00\x00 ftypmp42")


def test_pipeline_temporal_sampling_matches_reference(spark):
    w, h = 2, 2
    frames = [bytes((i + j) % 256 for j in range(w * h * 3))
              for i in range(7)]
    media = spark.createDataFrame(
        [(1, bytearray(_y4m(w, h, frames)), "video/y4m")],
        "doc_id long, payload binary, media_type string")
    rows = sorted(M.video_pipeline(media, every_k=3).collect(),
                  key=lambda r: r["frame_idx"])
    kept = [0, 3, 6]
    assert [r["frame_idx"] for r in rows] == kept
    assert rows[0]["n_frames"] == 7 and rows[0]["n_sampled"] == 3
    assert rows[0]["feature_sig"] == hashlib.md5(
        b"".join(frames)).hexdigest()[:8]
    assert rows[0]["sampled_sig"] == hashlib.md5(
        b"".join(frames[i] for i in kept)).hexdigest()[:8]
    for r, i in zip(rows, kept):
        assert r["frame_sig"] == hashlib.md5(frames[i]).hexdigest()[:8]


def test_engine_built_y4m_is_valid_and_formula_aligned(spark):
    docs = spark.createDataFrame([(7, "some words here")],
                                 "doc_id long, text string")
    p = bytes(M.to_y4m_media_table(docs).collect()[0]["payload"])
    w, h, cs, frames = M._parse_y4m(p)
    dig = hashlib.md5(b"some words here").hexdigest()
    assert w == 8 + int(dig[10:12], 16) % 16
    assert h == 8 + int(dig[12:14], 16) % 16
    assert len(frames) == 3 + int(dig[8:10], 16) % 6
    assert cs == "444" and all(f == b"x" * (w * h * 3) for f in frames)
