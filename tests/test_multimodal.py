"""Multimodal plumbing tests: schema contract, deterministic feature
extraction through mapInPandas, frame sampling arithmetic, stubbed
decode behavior."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.multimodal import (
    attach_fake_media,
    byte_histogram_features,
    decode_image,
    sample_frames,
)
from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table


def _media(spark, sf_dir):
    return attach_fake_media(load_table(spark, sf_dir, "documents").limit(60))


def test_media_schema_contract(spark, sf_dir):
    m = _media(spark, sf_dir)
    assert dict(m.dtypes)["payload"] == "binary"
    assert dict(m.dtypes)["meta"].startswith("struct<width:int")
    assert m.select("modality").distinct().count() == 3


def test_feature_extraction_deterministic_and_normalized(spark, sf_dir):
    m = _media(spark, sf_dir)
    f1 = {r["media_id"]: r["features"] for r in byte_histogram_features(m).collect()}
    f2 = {r["media_id"]: r["features"] for r in byte_histogram_features(m.repartition(7)).collect()}
    assert f1 == f2  # partitioning-invariant
    for feats in f1.values():
        assert len(feats) == 16
        assert abs(sum(feats) - 1.0) < 1e-9  # normalized histogram


def test_feature_matches_numpy_reference(spark, sf_dir):
    m = _media(spark, sf_dir)
    row = m.where(F.col("media_id") == 0).select("payload").collect()[0]
    arr = np.frombuffer(row["payload"], dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=16, range=(0, 256))
    expected = (hist / arr.size).tolist()
    got = byte_histogram_features(m).where(F.col("media_id") == 0).collect()[0]["features"]
    assert got == pytest.approx(expected)


def test_feature_counts_variant_sums_to_payload_length(spark, sf_dir):
    """normalize=False emits raw integer bin counts (the hash-safe form
    the oracled multimodal_features query uses): each vector must sum to
    the payload byte length and agree with the normalized variant."""
    m = _media(spark, sf_dir)
    lengths = {
        r["media_id"]: r["n"]
        for r in m.select("media_id", F.length("payload").alias("n")).collect()
    }
    counts = {
        r["media_id"]: r["features"]
        for r in byte_histogram_features(m, normalize=False).collect()
    }
    norm = {
        r["media_id"]: r["features"] for r in byte_histogram_features(m).collect()
    }
    for mid, c in counts.items():
        assert all(isinstance(v, int) for v in c)
        assert sum(c) == lengths[mid]
        if lengths[mid]:
            assert norm[mid] == pytest.approx([v / lengths[mid] for v in c])


def test_frame_sampling(spark, sf_dir):
    m = _media(spark, sf_dir)
    frames = sample_frames(m, every_nth=2, frame_bytes=32)
    rows = frames.collect()
    assert rows, "no video frames sampled"
    assert all(r["frame_idx"] % 2 == 0 for r in rows)
    # every frame except possibly the tail is exactly frame_bytes long
    videos = {r["media_id"] for r in rows}
    assert all(len(r["frame"]) <= 32 for r in rows)
    for mid in videos:
        doc_frames = [r for r in rows if r["media_id"] == mid]
        assert len(doc_frames) >= 1


def test_decode_dispatch_contract():
    # unrecognized container without fake= -> explicit NotImplementedError
    with pytest.raises(NotImplementedError):
        decode_image(b"payload")
    fake = decode_image(b"some deterministic payload bytes go here............", fake=True)
    assert fake.shape == (4, 4, 3)
    assert fake.dtype == np.uint8


def test_codec_roundtrips_bit_exact():
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators import codecs as C

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    rgba = rng.integers(0, 256, (5, 7, 4), dtype=np.uint8)
    # PNG: RGB, gray, RGBA; odd widths exercise row padding paths
    for img in (rgb, gray, rgba, rng.integers(0, 256, (1, 1, 3), dtype=np.uint8)):
        assert np.array_equal(C.decode_png(C.encode_png(img)), img)
    # BMP: 24-bit with 4-byte row padding (w=5 -> 15-byte rows, pad 1)
    odd = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    for img in (rgb, odd):
        assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)
    # netpbm P6 / P5
    assert np.array_equal(C.decode_ppm(C.encode_ppm(rgb)), rgb)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(gray)), gray)
    # WAV PCM-16 stereo + mono
    stereo = rng.integers(-32768, 32767, (211, 2), dtype=np.int16)
    out, rate = C.decode_wav(C.encode_wav(stereo, 8000))
    assert np.array_equal(out, stereo) and rate == 8000
    mono = rng.integers(-32768, 32767, 77, dtype=np.int16)
    out, rate = C.decode_wav(C.encode_wav(mono))
    assert np.array_equal(out[:, 0], mono) and rate == 16000
    # dispatch: real containers decode through decode_image even with fake=True
    assert np.array_equal(decode_image(C.encode_png(rgb), fake=True), rgb)
    assert C.sniff_format(b"\xff\xd8\xffJFIF") is None


def test_png_decoder_reconstructs_all_filter_types():
    """The encoder only emits filter 0; externally-produced PNGs use
    Sub/Up/Average/Paeth. Hand-build one scanline of each and check
    reconstruction (the published filter algorithms, PNG spec 9.2)."""
    import struct
    import zlib

    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators import codecs as C

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(int)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    lines = []
    for y, ftype in enumerate([1, 2, 3, 4, 0]):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, int)
        enc = np.zeros(stride, int)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[ftype]
            enc[x] = (cur[x] - pred) % 256
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))

    def chunk(t, d):
        body = t + d
        return struct.pack(">I", len(d)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    png = (
        C.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(C.decode_png(png), img)


def test_real_decode_resize_matches_formula(spark, sf_dir):
    """End-to-end: PNG-encode deterministic images in one Arrow stage,
    real-decode + resize in another; compare against the closed-form
    pixel formula evaluated in numpy."""
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.multimodal import (
        attach_encoded_images,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    out = resize_images(attach_encoded_images(docs), 8, 8, fake_decode=False)
    for r in out.collect():
        i = r["media_id"]
        h, w = i % 48 + 1, i % 64 + 1
        yy, xx, cc = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
        img = ((i * 31 + yy * 7 + xx * 3 + cc) % 256).astype(np.float64)
        yi = np.minimum((np.arange(8) * h) // 8, h - 1)
        xi = np.minimum((np.arange(8) * w) // 8, w - 1)
        expect = img[yi][:, xi].ravel().tolist()
        assert r["pixels"] == expect


def test_audio_stats_matches_formula(spark, sf_dir):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.multimodal import (
        attach_encoded_audio,
        audio_stats,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    rows = audio_stats(attach_encoded_audio(docs)).collect()
    assert rows
    for r in rows:
        i = r["media_id"]
        n = i % 100 + 20
        t = np.arange(n)
        samples = ((i * 7 + t * 13) % 2048 - 1024).astype(np.int64)
        assert r["n_samples"] == n
        assert r["sample_rate"] == 16000
        assert r["sum_amp"] == int(samples.sum())
        assert r["min_amp"] == int(samples.min())
        assert r["max_amp"] == int(samples.max())


def test_resize_images_shape_and_determinism(spark, sf_dir):
    from sycl_mapreduce_cpu_gpu_hybrid_spark.operators.multimodal import (
        attach_fake_media,
        resize_images,
    )
    from sycl_mapreduce_cpu_gpu_hybrid_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    media = attach_fake_media(docs)
    out = resize_images(media, out_w=8, out_h=8)
    rows = out.collect()
    assert rows and all(len(r["pixels"]) == 8 * 8 * 3 for r in rows)
    # deterministic: same input -> same pixels
    again = {r["media_id"]: r["pixels"] for r in resize_images(media, 8, 8).collect()}
    assert all(again[r["media_id"]] == r["pixels"] for r in rows)
