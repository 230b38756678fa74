"""Real (non-stubbed) media decode path: pure-Python PPM/BMP parsing,
nearest-neighbor resample, frame/row sampling — verified bit-for-bit
against hand-built binary payloads."""

from __future__ import annotations

import hashlib
import struct

import pytest

from snowflake_azure_etl_spark.operators import multimodal as mm


def make_ppm(w: int, h: int, comment: bool = False) -> tuple[bytes, bytes]:
    """A valid P6 payload with varied pixel bytes; returns (payload, pixels)."""
    pixels = bytes((x * 7 + 13) % 256 for x in range(w * h * 3))
    header = b"P6\n"
    if comment:
        header += b"# generated test image\n"
    header += f"{w} {h}\n255\n".encode()
    return header + pixels, pixels


def make_bmp(w: int, h: int, top_down: bool = False,
             rgb: bytes | None = None) -> tuple[bytes, bytes]:
    """STANDARDS-COMPLIANT uncompressed 24-bit BMP (ADVICE r5): rows
    stored bottom-up (unless top_down), BGR channel order, each row
    padded to a 4-byte stride. Returns (payload, top-down RGB pixels —
    the normalized form _parse_bmp must recover)."""
    if rgb is None:
        rgb = bytes((x * 11 + 5) % 256 for x in range(w * h * 3))
    stride = ((w * 3 + 3) // 4) * 4
    pad = b"\x00" * (stride - w * 3)
    rows = []
    for y in range(h):
        row = rgb[y * w * 3:(y + 1) * w * 3]
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = row[2::3], row[0::3]
        rows.append(bytes(bgr) + pad)
    if not top_down:
        rows.reverse()
    body = b"".join(rows)
    data_off = 54
    header = (b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0,
                                  data_off)
              + struct.pack("<IiiHHIIiiII", 40, w,
                            -h if top_down else h, 1, 24, 0,
                            len(body), 0, 0, 0, 0))
    return header + body, rgb


def test_parse_ppm_roundtrip():
    payload, pixels = make_ppm(5, 4, comment=True)
    w, h, px = mm._parse_ppm(payload)
    assert (w, h) == (5, 4)
    assert px == pixels


def test_parse_ppm_rejects_truncated():
    payload, _ = make_ppm(5, 4)
    with pytest.raises(ValueError, match="truncated"):
        mm._parse_ppm(payload[:-1])


def test_parse_bmp_roundtrip():
    # w=6 → 18 bytes/row, stride 20: exercises real row padding
    payload, pixels = make_bmp(6, 3)
    w, h, px = mm._parse_bmp(payload)
    assert (w, h) == (6, 3)
    assert px == pixels


def test_parse_bmp_top_down_matches_bottom_up():
    """Negative height (top-down) and positive height (bottom-up)
    encodings of the same image normalize to the same pixels."""
    up, pixels = make_bmp(5, 4, top_down=False)
    down, _ = make_bmp(5, 4, top_down=True)
    assert mm._parse_bmp(up) == mm._parse_bmp(down) == (5, 4, pixels)


def test_bmp_and_ppm_reencodings_fingerprint_identically():
    """The _real_decode contract: feature_sig hashes the DECODED
    pixels, so the same image as PPM and as BMP (padded, bottom-up,
    BGR) yields the same signature."""
    w, h = 7, 5                        # 21 bytes/row → stride 24
    rgb = bytes((x * 7 + 13) % 256 for x in range(w * h * 3))
    ppm = b"P6\n" + f"{w} {h}\n255\n".encode() + rgb
    bmp, _ = make_bmp(w, h, rgb=rgb)
    ppm_dec = mm._real_decode(ppm)
    bmp_dec = mm._real_decode(bmp)
    assert ppm_dec[1] == bmp_dec[1]    # feature_sig
    assert ppm_dec[2:] == bmp_dec[2:]  # (w, h, pixels)


def test_parse_bmp_rejects_non_24bpp():
    payload, _ = make_bmp(4, 4)
    bad = bytearray(payload)
    struct.pack_into("<H", bad, 28, 32)
    with pytest.raises(ValueError, match="24-bit"):
        mm._parse_bmp(bytes(bad))


def test_real_decode_rejects_unknown():
    with pytest.raises(ValueError, match="unsupported"):
        mm._real_decode(b"\x89PNG....")


def test_decode_media_real_on_generated_payloads(spark):
    ppm, ppm_px = make_ppm(8, 6)
    bmp, bmp_px = make_bmp(4, 4)
    df = spark.createDataFrame(
        [(1, ppm, "?"), (2, bmp, "?")],
        "doc_id long, payload binary, media_type string")
    rows = {r.doc_id: r for r in mm.decode_media(df, stub=False).collect()}
    assert rows[1].media_type == "image/ppm"
    assert (rows[1].width, rows[1].height) == (8, 6)
    assert rows[1].byte_len == len(ppm)
    assert rows[1].feature_sig == hashlib.md5(ppm_px).hexdigest()[:8]
    assert rows[2].media_type == "image/bmp"
    assert (rows[2].width, rows[2].height) == (4, 4)
    assert rows[2].feature_sig == hashlib.md5(bmp_px).hexdigest()[:8]


def py_resize_nn(pixels: bytes, w: int, h: int, ow: int, oh: int) -> bytes:
    """Independent scalar-loop reference for the numpy resample."""
    out = bytearray()
    for oy in range(oh):
        base = (oy * h // oh) * w * 3
        for ox in range(ow):
            sx = base + (ox * w // ow) * 3
            out += pixels[sx:sx + 3]
    return bytes(out)


def test_resize_media_real_nearest_neighbor(spark):
    payload, pixels = make_ppm(8, 4)
    df = spark.createDataFrame([(1, payload, "?")],
                               "doc_id long, payload binary, media_type string")
    row = mm.resize_media(df, max_dim=4, stub=False).collect()[0]
    assert (row.width, row.height) == (8, 4)
    assert (row.out_width, row.out_height) == (4, 2)
    expected = py_resize_nn(pixels, 8, 4, 4, 2)
    assert len(expected) == 4 * 2 * 3
    assert mm._resize_nn(pixels, 8, 4, 4, 2) == expected
    assert row.resized_sig == hashlib.md5(expected).hexdigest()[:8]


def test_resize_nn_matches_loop_reference_property():
    """The numpy fancy-index resample computes the exact truncating-
    division NN grid of the scalar definition, for any dims."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(w=st.integers(1, 12), h=st.integers(1, 9),
           ow=st.integers(1, 12), oh=st.integers(1, 9),
           seed=st.integers(0, 255))
    def check(w, h, ow, oh, seed):
        px = bytes((x * 13 + seed) % 256 for x in range(w * h * 3))
        assert mm._resize_nn(px, w, h, ow, oh) == py_resize_nn(
            px, w, h, ow, oh)

    check()


def test_frame_sample_real_rows(spark):
    payload, pixels = make_ppm(5, 8)
    df = spark.createDataFrame([(1, payload, "?")],
                               "doc_id long, payload binary, media_type string")
    rows = sorted(mm.frame_sample(df, n_frames=4, stub=False).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    for i, r in enumerate(rows):
        y = i * 8 // 4
        expected_row = pixels[y * 5 * 3:(y + 1) * 5 * 3]
        assert r.frame_sig == hashlib.md5(expected_row).hexdigest()[:8]


def test_to_ppm_media_table_produces_valid_ppm(spark, sf_dir):
    from snowflake_azure_etl_spark.sources.registry import load_tables
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].limit(5)
    payloads = mm.to_ppm_media_table(docs).collect()
    assert payloads
    for r in payloads:
        w, h, px = mm._parse_ppm(bytes(r.payload))
        assert 64 <= w < 128 and 64 <= h < 128
        assert px == b"x" * (w * h * 3)


def test_parse_bmp_property_roundtrip():
    """Property sweep: any dims × row order round-trips to the same
    normalized top-down RGB pixels (stride padding + BGR swap + flip
    all exercised as width mod 4 varies)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(w=st.integers(1, 13), h=st.integers(1, 7),
           top_down=st.booleans(), seed=st.integers(0, 255))
    def check(w, h, top_down, seed):
        rgb = bytes((x * 31 + seed) % 256 for x in range(w * h * 3))
        payload, _ = make_bmp(w, h, top_down=top_down, rgb=rgb)
        assert mm._parse_bmp(payload) == (w, h, rgb)

    check()


@pytest.mark.parametrize("stub", [True, False])
def test_media_pipeline_fusion_equals_join_composition(spark, stub):
    """The fused one-pass media_pipeline must be row-equal to the
    decode ⋈ resize ⋈ frame_sample composition it replaces (q60's
    plan shape) — on both the stub and real codec paths."""
    docs = spark.createDataFrame(
        [(i, f"doc {i} body text {'y' * (i + 3)}") for i in range(12)],
        "doc_id long, text string")
    media = mm.to_ppm_media_table(docs) if not stub \
        else mm.to_media_table(docs)
    fused = mm.media_pipeline(media, max_dim=64, n_frames=4, stub=stub)
    joined = (mm.decode_media(media, stub=stub)
              .join(mm.resize_media(media, max_dim=64, stub=stub)
                    .select("doc_id", "out_width", "out_height",
                            "resized_sig"), "doc_id")
              .join(mm.frame_sample(media, n_frames=4, stub=stub),
                    "doc_id")
              .select(*fused.columns))
    key = ["doc_id", "frame_idx"]
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, joined.collect()))
    assert a == b and len(a) == 48


def test_fused_modalities_equals_three_leg_union(spark):
    """r17 (VERDICT r16 next #4): the single-Arrow-pass
    fused_modalities_pipeline must be row-equal to the three-leg
    img ∪ audio ∪ video union it replaces in q60 — same per-payload
    code paths, one JVM↔Python round-trip instead of three."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"doc {i} body text {'y' * (i + 3)}") for i in range(12)],
        "doc_id long, text string")
    fused = mm.fused_modalities_pipeline(
        docs, max_dim=64, n_frames=4, target_rate=4000, frame_len=256,
        audio_frames=2, every_k=2)
    img = mm.media_pipeline(mm.to_ppm_media_table(docs), max_dim=64,
                            n_frames=4, stub=False)
    audio = (mm.audio_pipeline(mm.to_wav_media_table(docs),
                               target_rate=4000, frame_len=256,
                               n_frames=2)
             .select("doc_id", "media_type", "byte_len", "feature_sig",
                     F.col("sample_rate").alias("width"),
                     F.col("n_samples").alias("height"),
                     F.col("out_rate").alias("out_width"),
                     F.col("out_samples").alias("out_height"),
                     F.col("resampled_sig").alias("resized_sig"),
                     "frame_idx", "frame_sig"))
    video = (mm.video_pipeline(mm.to_y4m_media_table(docs), every_k=2)
             .select("doc_id", "media_type", "byte_len", "feature_sig",
                     "width", "height",
                     F.col("n_frames").alias("out_width"),
                     F.col("n_sampled").alias("out_height"),
                     F.col("sampled_sig").alias("resized_sig"),
                     "frame_idx", "frame_sig"))
    union = img.unionByName(audio).unionByName(video)
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, union.collect()))
    assert a == b
    # every modality present, image fan-out intact
    kinds = {r[1] for r in a}
    assert kinds == {"image/ppm", "audio/wav", "video/y4m"}
