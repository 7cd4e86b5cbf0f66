"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
mapInPandas.

The decode step itself is STUBBED (no image/audio libraries in this
environment): ``decode_image`` raises NotImplementedError unless a
deterministic fake decoder is requested. Everything around it — the
schema contract, batch iteration shape, feature extraction, frame
sampling — is real and tested, so dropping in PIL/librosa later only
replaces the innermost function.

Scale notes: payloads stay in executor memory only for the lifetime
of one Arrow batch (bound via spark.sql.execution.arrow
.maxRecordsPerBatch for multi-MB media); metadata-only plans never
touch the binary column thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, modality string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_DIM = 16

# modality cycle for the deterministic fixture — shared with the
# generated DuckDB oracle (queries/extensions.py) so the two sides
# cannot drift
MODALITIES = ("image", "audio", "video")


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media fixture: each document's text bytes become
    an opaque payload with per-row modality metadata — structurally
    identical to a real (id, binary, meta) media table."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.col(id_col) % len(MODALITIES) + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            (F.col(id_col) % 64 + 1).cast("int").alias("width"),
            (F.col(id_col) % 48 + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.length(text_col) % 30 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array. STUB: the real
    implementation needs PIL/opencv (absent here); ``fake=True``
    derives a deterministic 4x4x3 array from the payload bytes so the
    downstream plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv, not available in this environment; "
            "pass fake=True for the deterministic test decoder"
        )
    h = np.frombuffer(payload[:48].ljust(48, b"\0"), dtype=np.uint8)
    return h.reshape(4, 4, 3)


def byte_histogram_features(
    df: DataFrame, bins: int = FEATURE_DIM, normalize: bool = True
) -> DataFrame:
    """mapInPandas feature extractor: ``bins``-bucket byte histogram
    per payload — normalized array<double> by default, raw counts
    array<bigint> with ``normalize=False`` (the exact-integer form the
    oracled declared query uses: integer outputs hash identically
    across engines, unlike the normalized ratio doubles). The
    iterator-of-batches signature is the real contract a decode/embed
    stage uses; the histogram stands in for the model forward pass."""

    feat_type = "array<double>" if normalize else "array<bigint>"
    out_schema = f"media_id bigint, modality string, features {feat_type}"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * bins if normalize else [0] * bins)
                    continue
                hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
                feats.append((hist / arr.size).tolist() if normalize else hist.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                }
            )

    return df.mapInPandas(extract, schema=out_schema)


def sample_frames(df: DataFrame, every_nth: int = 2, frame_bytes: int = 32) -> DataFrame:
    """Frame sampling for 'video' payloads without Python: slice the
    payload into fixed-size frames and keep every n-th — JVM-side
    substring arithmetic on the binary column, exploded to one row per
    kept frame."""
    # length(payload) > 0 guard: sequence(0, -1) descends in Spark,
    # yielding [0, -1] — an empty payload would emit a phantom frame
    frames = df.where(
        (F.col("modality") == "video") & (F.length("payload") > 0)
    ).select(
        "media_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int(floor((length(payload) - 1) / {frame_bytes}))),"
                f" i -> substring(payload, i * {frame_bytes} + 1, {frame_bytes}))"
            )
        ).alias("frame_idx", "frame"),
    )
    return frames.where(F.col("frame_idx") % every_nth == 0)


def resize_images(
    df: DataFrame, out_w: int = 8, out_h: int = 8, fake_decode: bool = True
) -> DataFrame:
    """Resize stage: decode -> nearest-neighbor resample to
    (out_h, out_w, 3) -> flattened pixel array + updated meta. The
    resample math is real numpy (index-gather nearest neighbor); only
    the decode is the stubbed step (decode_image). Runs over 'image'
    rows only, payloads live for one Arrow batch."""
    out_schema = (
        "media_id bigint, width int, height int, pixels array<double>"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "pixels": []}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(payload, fake=fake_decode).astype(np.float64)
                h, w = img.shape[:2]
                yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                resized = img[yi][:, xi]
                out["media_id"].append(media_id)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["pixels"].append(resized.ravel().tolist())
            yield pd.DataFrame(out)

    return (
        df.where(F.col("modality") == "image")
        .select("media_id", "payload")
        .mapInPandas(resize, schema=out_schema)
    )
