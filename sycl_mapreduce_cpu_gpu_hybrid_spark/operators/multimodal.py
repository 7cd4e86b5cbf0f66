"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
mapInPandas.

The decode step is REAL for PNG / BMP / PPM-PGM images and RIFF/WAVE
PCM audio: ``operators/codecs.py`` implements those container formats
directly in stdlib zlib + numpy (no PIL/opencv in this environment,
none needed). ``decode_image`` dispatches on magic bytes; only
formats requiring external codec libraries (JPEG, MP3, H.264, ...)
raise NotImplementedError, with the ``fake=True`` deterministic
decoder retained for arbitrary-bytes fixtures.

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

from .codecs import decode_image_bytes, decode_wav, encode_png, encode_wav, sniff_format

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
    """Decode an image payload to an ndarray. REAL decode for PNG,
    BMP, and PPM/PGM containers (pure stdlib+numpy parsers in
    operators/codecs.py — round-trip pinned by tests); ``fake=True``
    keeps the legacy deterministic 4x4x3 derivation for
    arbitrary-bytes fixtures whose payloads aren't a recognized
    container. Formats needing external codec libraries (JPEG, ...)
    raise NotImplementedError."""
    if fake and sniff_format(payload) is None:
        h = np.frombuffer(payload[:48].ljust(48, b"\0"), dtype=np.uint8)
        return h.reshape(4, 4, 3)
    return decode_image_bytes(payload)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM-16 payload to ((n, ch) int16 samples,
    sample_rate) via the real RIFF chunk parser in codecs.py."""
    return decode_wav(payload)


def attach_encoded_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real-container media fixture: one deterministic RGB image per
    document, ENCODED TO ACTUAL PNG BYTES (codecs.encode_png) in an
    Arrow-batched mapInPandas stage. Dimensions follow the metadata
    contract of attach_fake_media (h = id%48+1, w = id%64+1); pixel
    (y, x, c) = (id*31 + y*7 + x*3 + c) % 256 — a closed form a SQL
    oracle can replay without any codec, so a hash-gated consumer of
    this fixture proves the PNG encode->decode round-trip end to end.

    r14 (guide §2.5 input skew / §4): the id projection is fanned out
    before the encode stage — the parquet scan arrives as ONE split
    below cluster scale, so the whole per-image encode loop (zlib
    deflate + scanline assembly, the dominant cost) ran single-task;
    the exchange moves 8-byte ids only. Deflate level 1: the pixel
    pattern is high-entropy (compresses poorly at any level), decode
    output is bit-identical, and the gate hashes decoded PIXELS, not
    container bytes."""
    from ..sources.tables import fan_out

    out_schema = "media_id bigint, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                h, w = i % 48 + 1, i % 64 + 1
                yy, xx, cc = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                img = ((i * 31 + yy * 7 + xx * 3 + cc) % 256).astype(np.uint8)
                payloads.append(encode_png(img, level=1))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "modality": "image",
                    "payload": payloads,
                }
            )

    return fan_out(docs.select(id_col)).mapInPandas(gen, schema=out_schema)


def attach_encoded_audio(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real-container audio fixture: PCM-16 mono RIFF/WAVE payloads
    (codecs.encode_wav) with n = id%100+20 samples, sample t =
    ((id*7 + t*13) % 2048) - 1024 — again a closed form an oracle can
    replay codec-free. Fanned out like attach_encoded_images (r14):
    the single-split scan serialized the whole encode loop."""
    from ..sources.tables import fan_out

    out_schema = "media_id bigint, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                n = i % 100 + 20
                t = np.arange(n)
                samples = (((i * 7 + t * 13) % 2048) - 1024).astype(np.int16)
                payloads.append(encode_wav(samples, sample_rate=16000))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "modality": "audio",
                    "payload": payloads,
                }
            )

    return fan_out(docs.select(id_col)).mapInPandas(gen, schema=out_schema)


def audio_stats(df: DataFrame) -> DataFrame:
    """Decode WAV payloads (real RIFF parse) and reduce each to
    integer sample statistics — the audio analog of the image
    decode->feature stage."""
    out_schema = (
        "media_id bigint, sample_rate int, n_samples bigint,"
        " sum_amp bigint, min_amp int, max_amp int, amp_md5 string"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "sample_rate", "n_samples", "sum_amp",
                    "min_amp", "max_amp", "amp_md5")}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_audio(bytes(payload))
                mono = samples[:, 0].astype(np.int64)
                out["media_id"].append(media_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(mono))
                out["sum_amp"].append(int(mono.sum()))
                out["min_amp"].append(int(mono.min()))
                out["max_amp"].append(int(mono.max()))
                # digest of the full decoded sample vector: a hash
                # mismatch downstream localizes to this media_id
                out["amp_md5"].append(
                    hashlib.md5(
                        ",".join(str(int(v)) for v in mono).encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(out)

    return (
        df.where(F.col("modality") == "audio")
        .select("media_id", "payload")
        .mapInPandas(stats, schema=out_schema)
    )


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

    # integer bin width when bins divides 256: histogram(range=(0,256))
    # bin membership is then exactly byte DIV width, so np.bincount of
    # the shifted bytes reproduces np.histogram bit-for-bit at ~10x
    # less per-row overhead (no edge computation / searchsorted)
    width = 256 // bins if 256 % bins == 0 else None

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * bins if normalize else [0] * bins)
                    continue
                if width is not None:
                    hist = np.bincount(arr // width, minlength=bins)
                else:
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
