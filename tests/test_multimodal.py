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


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"payload")
    fake = decode_image(b"some deterministic payload bytes go here............", fake=True)
    assert fake.shape == (4, 4, 3)
    assert fake.dtype == np.uint8


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
