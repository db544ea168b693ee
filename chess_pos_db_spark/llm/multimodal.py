"""Multimodal binary-column operators (SURVEY.md §2.11 N5).

Images/audio/video are opaque `BinaryType` columns with typed metadata
(the same philosophy as the reference's CompressedPosition: an opaque
fixed encoding plus interpretable key columns). The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas signatures,
partition sizing — is real and tested; the codec itself is stubbed
behind `decode_image`, because no image/audio libraries exist in this
container. Swapping in a real decoder (PIL/librosa/ffmpeg) changes ONE
function.

Scale notes: featurization streams per Arrow batch (`mapInPandas`), so
peak memory is one batch of blobs per core, never a partition of
decoded media; `spark.sql.files.maxPartitionBytes` (and
`maxRecordsPerBatch`) size the batches. Blobs should live in their own
column family (parquet column) so metadata-only queries never read
bytes — column pruning gives that for free.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("blob", T.BinaryType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_digest", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_image(blob: bytes) -> np.ndarray:
    """STUB — no imaging libraries in this container.

    A real deployment replaces this body with e.g. PIL.Image.open.
    The deterministic fake derives a pseudo-pixel array from the blob
    bytes so downstream plumbing (shapes, dtypes, batching) is
    exercised honestly.
    """
    h = hashlib.sha256(blob).digest()
    arr = np.frombuffer((h * 8)[:256], dtype=np.uint8).astype(np.float32)
    return arr.reshape(16, 16)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (fixtures carry no binary column)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        blob = struct.pack("<q", i) * (8 + i % 5)
        rows.append(
            (
                i,
                kind,
                16 if kind == "image" else None,
                16 if kind == "image" else None,
                1000 * (i % 7) if kind != "image" else None,
                bytearray(blob),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out_rows = []
        for _, row in pdf.iterrows():
            blob = bytes(row["blob"])
            pixels = decode_image(blob)  # stubbed codec
            # 16-bin intensity histogram as the feature vector
            hist, _ = np.histogram(pixels, bins=16, range=(0, 256))
            feat = (hist / max(1, pixels.size)).astype(np.float32)
            out_rows.append(
                {
                    "media_id": row["media_id"],
                    "kind": row["kind"],
                    "n_bytes": len(blob),
                    "content_digest": hashlib.sha256(blob).hexdigest(),
                    "feature": feat.tolist(),
                }
            )
        yield pd.DataFrame(out_rows)


def featurize(media: DataFrame) -> DataFrame:
    """Media table → per-item feature rows (Arrow-batched mapInPandas)."""
    return media.mapInPandas(_featurize_batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → sampled frame timestamps (explode of a generated range):
    the video analogue of the game→positions import explode. Pure
    built-ins; the per-frame decode would chain featurize() after."""
    vids = media.filter(F.col("kind") == "video").filter(
        F.col("duration_ms") > 0
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.FloatType()), False),
    ]
)


def resize(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Image resize via block-mean pooling over the decoded pixel array
    (deterministic, numpy-only — a real deployment swaps the pooling
    for PIL/cv2 interpolation; decode_image stays the single codec
    seam). Output is the flattened resized image, row-major."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                pixels = decode_image(bytes(row["blob"]))
                h, w = pixels.shape
                # Images smaller than the target grid: edge-replicate up
                # to (out_h, out_w) first — the block-mean reshape below
                # requires at least one source row/col per output cell.
                if h < out_h or w < out_w:
                    pixels = np.pad(
                        pixels,
                        ((0, max(0, out_h - h)), (0, max(0, out_w - w))),
                        mode="edge",
                    )
                    h, w = pixels.shape
                bh, bw = max(1, h // out_h), max(1, w // out_w)
                pooled = (
                    pixels[: bh * out_h, : bw * out_w]
                    .reshape(out_h, bh, out_w, bw)
                    .mean(axis=(1, 3))
                    .astype(np.float32)
                )
                out.append(
                    {
                        "media_id": row["media_id"],
                        "out_w": out_w,
                        "out_h": out_h,
                        "pixels": pooled.ravel().tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# Audio: decode stub + per-window waveform features — completes the
# image / audio / video triple. The decode seam mirrors decode_image
# (swap for soundfile/librosa in a real deployment); the feature pass
# is the standard frame-level front end: fixed-length windows, RMS
# energy + zero-crossing count + peak per window, vectorized numpy over
# Arrow batches. One media row fans out to duration/window feature
# rows — the audio analogue of frame_sample's explode, but computed,
# so it runs in mapInPandas rather than a generated sequence.
# ---------------------------------------------------------------------------

AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), False),
        T.StructField("rms", T.FloatType(), False),
        T.StructField("zero_crossings", T.IntegerType(), False),
        T.StructField("peak", T.FloatType(), False),
    ]
)


def decode_audio(blob: bytes, duration_ms: int) -> np.ndarray:
    """STUB — no audio libraries in this container.

    A real deployment replaces this body with e.g. soundfile.read.
    The deterministic fake synthesizes a waveform (float32 in [-1, 1],
    8 samples/ms) from the blob digest so window math, dtypes, and
    batch shapes are exercised honestly.
    """
    n = max(1, duration_ms * 8)
    h = np.frombuffer(
        (hashlib.sha256(blob).digest() * ((n * 4) // 32 + 1))[: n * 4],
        dtype=np.uint32,
    )
    return (h.astype(np.float64) / np.float64(2**31) - 1.0).astype(
        np.float32
    )[:n]


def audio_features(media: DataFrame, window: int = 2048) -> DataFrame:
    """Audio table → per-window waveform features (Arrow-batched
    mapInPandas; trailing partial window dropped, matching the usual
    frame-synchronous front ends)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                wave = decode_audio(
                    bytes(row["blob"]), int(row["duration_ms"])
                )
                n_win = len(wave) // window
                if n_win == 0:
                    continue
                frames = wave[: n_win * window].reshape(n_win, window)
                rms = np.sqrt((frames.astype(np.float64) ** 2).mean(axis=1))
                zc = (np.diff(np.signbit(frames), axis=1) != 0).sum(axis=1)
                peak = np.abs(frames).max(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            "media_id": row["media_id"],
                            "window_idx": np.arange(n_win, dtype=np.int32),
                            "rms": rms.astype(np.float32),
                            "zero_crossings": zc.astype(np.int32),
                            "peak": peak.astype(np.float32),
                        }
                    )
                )
            yield (
                pd.concat(out, ignore_index=True)
                if out
                else pd.DataFrame(
                    {f.name: pd.Series(dtype="object") for f in AUDIO_FRAME_SCHEMA}
                )
            )

    aud = media.filter(F.col("kind") == "audio").filter(
        F.col("duration_ms") > 0
    )
    return aud.mapInPandas(batches, schema=AUDIO_FRAME_SCHEMA)


# --- media near-dup: the multimodal → dedup wiring ---------------------------
#
# Featurize (Arrow-batched decode → 16-bin intensity histogram) feeds
# the SAME bucketed near-dup shape the text/embedding paths use:
# sign-LSH bucket the feature vectors (md5-derived hyperplanes, no RNG),
# generate candidate pairs per bucket, verify with exact cosine — never
# media×media. Exact dedup falls out of the content digest for free.
# With the stubbed codec only identical blobs land near each other (the
# fake decoder is a hash, so similarity has no gradient); a real
# decoder changes decode_image ONLY, the pipeline below is unchanged.

_MEDIA_PLANES = 6
_MEDIA_FEAT_DIMS = 16
_MEDIA_COS_THRESHOLD = 0.98


def _media_plane(p: int) -> list:
    return [
        int(hashlib.md5(f"m{p}:{d}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5
        for d in range(_MEDIA_FEAT_DIMS)
    ]


def _media_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def media_near_dup(
    media: DataFrame, threshold: float = _MEDIA_COS_THRESHOLD
) -> DataFrame:
    """(media_a, media_b, cos_sim) candidate pairs from sign buckets,
    exact-cosine-verified at `threshold` (media_a < media_b)."""
    feats = featurize(media).select("media_id", "feature")
    bucket = F.lit(0).cast("long")
    for p in range(_MEDIA_PLANES):
        plane = F.array(*[F.lit(x) for x in _media_plane(p)])
        bit = F.when(_media_dot(F.col("feature"), plane) > 0, 1).otherwise(0)
        bucket = bucket + F.shiftleft(bit.cast("long"), p)
    b = feats.select("media_id", "feature", bucket.alias("bucket"))
    a_side = b.select(
        F.col("media_id").alias("media_a"),
        F.col("feature").alias("feat_a"),
        "bucket",
    )
    b_side = b.select(
        F.col("media_id").alias("media_b"),
        F.col("feature").alias("feat_b"),
        "bucket",
    )
    cos = _media_dot(F.col("feat_a"), F.col("feat_b")) / (
        F.sqrt(_media_dot(F.col("feat_a"), F.col("feat_a")))
        * F.sqrt(_media_dot(F.col("feat_b"), F.col("feat_b")))
    )
    return (
        a_side.join(b_side, "bucket")
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def media_exact_dup_groups(media: DataFrame) -> DataFrame:
    """(keep_id, n_copies) per identical-content group — the digest
    groupBy, byte-exact regardless of codec."""
    feats = featurize(media)
    return (
        feats.groupBy("content_digest")
        .agg(
            F.min("media_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )
