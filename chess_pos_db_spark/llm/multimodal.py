"""Multimodal binary-column operators (SURVEY.md §2.11 N5).

Images/audio/video are opaque `BinaryType` columns with typed metadata
(the same philosophy as the reference's CompressedPosition: an opaque
fixed encoding plus interpretable key columns). The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas signatures,
partition sizing — is real and tested. The codec seam is ONE function
per modality (`decode_image` / `decode_audio`): as of round 12 both
carry REAL stdlib+numpy decoders for the self-describing formats —
PNG (8-bit, all scanline filters), BMP (uncompressed 24/32-bit),
binary PGM/PPM, and RIFF/WAVE PCM (8/16/32-bit, downmixed mono) —
with the deterministic pseudo-content fake as the documented fallback
for formats that need codec libraries this container lacks (JPEG,
MP3, video containers). Swapping the fallback for PIL/soundfile/ffmpeg
still changes only that one function.

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


def _png_decode(blob: bytes) -> np.ndarray:
    """Minimal real PNG decoder (stdlib zlib + numpy): 8-bit depth,
    grayscale / gray+alpha / RGB / RGBA, non-interlaced. Full filter
    reconstruction (None/Sub/Up/Average/Paeth). Raises ValueError on
    anything outside that envelope so the caller falls back loudly-
    documented rather than mis-decoding."""
    import zlib

    pos = 8  # past signature
    width = height = None
    bitdepth = colortype = interlace = None
    idat = []
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(colortype)
    if (
        width is None
        or channels is None
        or bitdepth != 8
        or interlace != 0
        or not idat
    ):
        raise ValueError("unsupported PNG variant")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG raster")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            recon = row
        elif f == 2:  # Up
            recon = (row + prev) % 256
        elif f == 1:  # Sub: per channel-phase cumulative sum mod 256
            recon = row.copy()
            for c in range(bpp):
                recon[c::bpp] = np.cumsum(row[c::bpp]) % 256
        elif f == 3:  # Average (left-sequential)
            recon = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (row[x] + (left + int(prev[x])) // 2) % 256
        elif f == 4:  # Paeth (left-sequential)
            recon = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                c = int(out[y - 1, x - bpp]) if (x >= bpp and y > 0) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = recon.astype(np.uint8)
        prev = out[y]
    px = out.reshape(height, width, channels).astype(np.float32)
    if channels == 1:
        return px[:, :, 0]
    if channels == 2:  # gray + alpha
        return px[:, :, 0]
    # RGB(A) -> Rec.601 luma, alpha ignored
    return (
        0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    ).astype(np.float32)


def _bmp_decode(blob: bytes) -> np.ndarray:
    """Minimal real BMP decoder: uncompressed 24/32-bit BITMAPINFOHEADER
    (the interchange baseline), bottom-up or top-down. Raises
    ValueError outside that envelope."""
    if len(blob) < 54:
        raise ValueError("truncated BMP")
    (data_off,) = struct.unpack("<I", blob[10:14])
    width, height = struct.unpack("<ii", blob[18:26])
    (bits,) = struct.unpack("<H", blob[28:30])
    (compression,) = struct.unpack("<I", blob[30:34])
    if bits not in (24, 32) or compression != 0 or width <= 0:
        raise ValueError("unsupported BMP variant")
    flip = height > 0  # positive height = bottom-up storage
    height = abs(height)
    bytepp = bits // 8
    stride = ((width * bytepp + 3) // 4) * 4
    need = data_off + stride * height
    if len(blob) < need:
        raise ValueError("truncated BMP raster")
    rows = (
        np.frombuffer(blob, dtype=np.uint8, count=stride * height,
                      offset=data_off)
        .reshape(height, stride)[:, : width * bytepp]
        .reshape(height, width, bytepp)
        .astype(np.float32)
    )
    if flip:
        rows = rows[::-1]
    # BMP stores BGR(A)
    return (
        0.299 * rows[:, :, 2] + 0.587 * rows[:, :, 1] + 0.114 * rows[:, :, 0]
    ).astype(np.float32)


def _pnm_decode(blob: bytes) -> np.ndarray:
    """Minimal real binary PGM/PPM (P5/P6) decoder, maxval <= 255,
    '#' header comments handled."""
    tokens: list[bytes] = []
    i = 2  # past magic
    while len(tokens) < 3 and i < len(blob):
        ch = blob[i : i + 1]
        if ch == b"#":
            while i < len(blob) and blob[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif ch.isspace():
            i += 1
        else:
            j = i
            while j < len(blob) and not blob[j : j + 1].isspace():
                j += 1
            tokens.append(blob[i:j])
            i = j
    if len(tokens) < 3:
        raise ValueError("truncated PNM header")
    width, height, maxval = (int(t) for t in tokens)
    if maxval > 255 or width <= 0 or height <= 0:
        raise ValueError("unsupported PNM variant")
    i += 1  # single whitespace after maxval
    channels = 3 if blob[:2] == b"P6" else 1
    need = width * height * channels
    if len(blob) < i + need:
        raise ValueError("truncated PNM raster")
    px = (
        np.frombuffer(blob, dtype=np.uint8, count=need, offset=i)
        .reshape(height, width, channels)
        .astype(np.float32)
    )
    if channels == 1:
        return px[:, :, 0]
    return (
        0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    ).astype(np.float32)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_image(blob: bytes) -> np.ndarray:
    """Image blob → float32 grayscale H×W in [0, 255].

    REAL decode paths (round 12 — stdlib + numpy only, no imaging
    libraries needed): PNG (8-bit gray/gray+alpha/RGB/RGBA,
    non-interlaced, all five scanline filters), BMP (uncompressed
    24/32-bit), binary PGM/PPM. Color reduces to Rec.601 luma.

    Formats needing codec libraries this container lacks (JPEG, WebP,
    GIF, ...) — and unparseable/synthetic blobs — fall back to the
    DETERMINISTIC PSEUDO-PIXEL fake (sha256-derived 16×16), which keeps
    every downstream pipeline (featurize, phash, resize, near-dup)
    exercised honestly on fixture blobs; a real deployment swaps the
    fallback for PIL.Image.open — still one function.
    """
    try:
        if blob[:8] == _PNG_MAGIC:
            return _png_decode(blob)
        if blob[:2] == b"BM":
            return _bmp_decode(blob)
        if blob[:2] in (b"P5", b"P6"):
            return _pnm_decode(blob)
    except Exception:
        # Unsupported variant OR malformed blob -> deterministic
        # fallback below. Broad by design: a blob with a valid magic
        # can still die deep in the decoder with struct.error
        # (truncated chunk), zlib.error (corrupt IDAT), or an index/
        # shape error — the contract is that NO blob content can fail
        # the surrounding mapInPandas task (decode_audio's WAV path
        # makes the same promise).
        pass
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


def _blob_feature(blob: bytes) -> np.ndarray:
    """blob → the canonical 16-bin intensity-histogram feature. ONE
    definition, shared by featurize (near-dup buckets) and
    media_embeddings (cross-modal retrieval) — if the feature ever
    changes (bins, normalization), both consumers move together
    instead of silently diverging into inconsistent feature spaces."""
    pixels = decode_image(blob)  # stubbed codec
    hist, _ = np.histogram(pixels, bins=16, range=(0, 256))
    return (hist / max(1, pixels.size)).astype(np.float32)


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out_rows = []
        # direct column zip, not iterrows(): iterrows materializes a
        # pandas Series per row, pure overhead for this access pattern
        for media_id, kind, blob in zip(
            pdf["media_id"], pdf["kind"], pdf["blob"]
        ):
            blob = bytes(blob)
            feat = _blob_feature(blob)
            out_rows.append(
                {
                    "media_id": media_id,
                    "kind": kind,
                    "n_bytes": len(blob),
                    "content_digest": hashlib.sha256(blob).hexdigest(),
                    "feature": feat.tolist(),
                }
            )
        yield pd.DataFrame(out_rows)


def featurize(media: DataFrame) -> DataFrame:
    """Media table → per-item feature rows (Arrow-batched mapInPandas).

    Input is pruned to the three columns the batch function touches
    (guide §4.2): mapInPandas is opaque to Catalyst, so without the
    explicit select the scan would read and Arrow-serialize every media
    column (width/height/duration_ms) into each Python worker."""
    return media.select("media_id", "kind", "blob").mapInPandas(
        _featurize_batches, schema=FEATURE_SCHEMA
    )


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
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                pixels = decode_image(bytes(blob))
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
                        "media_id": media_id,
                        "out_w": out_w,
                        "out_h": out_h,
                        "pixels": pooled.ravel().tolist(),
                    }
                )
            yield pd.DataFrame(out)

    # select before mapInPandas (guide §4.2): only the id and the blob
    # cross the Python boundary, not the whole media row.
    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "blob")
        .mapInPandas(batches, schema=RESIZED_SCHEMA)
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


def _wav_decode(blob: bytes) -> np.ndarray:
    """Minimal real WAV decoder (stdlib `wave` + numpy): PCM 8/16/32
    bit, any channel count (downmixed to mono by mean) → float32
    waveform in [-1, 1]. Raises on non-PCM/exotic containers so the
    caller falls back."""
    import io
    import wave as wave_mod

    with wave_mod.open(io.BytesIO(blob), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if sw == 1:  # unsigned 8-bit
        x = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    elif sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return x.astype(np.float32)


def decode_audio(blob: bytes, duration_ms: int) -> np.ndarray:
    """Audio blob → float32 mono waveform in [-1, 1].

    REAL decode path (round 12 — stdlib `wave` + numpy, no audio
    libraries needed): RIFF/WAVE PCM at 8/16/32-bit, multi-channel
    downmixed to mono; ``duration_ms`` is ignored for real WAVs (the
    container knows its own length). Compressed formats (MP3, OGG,
    FLAC, ...) — and synthetic fixture blobs — fall back to the
    DETERMINISTIC FAKE below (float32 in [-1, 1], 8 samples/ms) built
    from POSITION-CHAINED blob digests — tiling one digest would make
    the wave periodic (every window identical), which degenerates
    window-level ops like fingerprinting; chained blocks give each
    window honest distinct content. A real deployment swaps the
    fallback for soundfile.read — still one function.
    """
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        try:
            return _wav_decode(blob)
        except Exception:
            pass  # malformed/exotic RIFF -> deterministic fallback
    n = max(1, duration_ms * 8)
    n_blocks = (n * 4) // 32 + 1
    seed = hashlib.sha256(blob).digest()
    buf = b"".join(
        hashlib.sha256(seed + struct.pack("<q", i)).digest()
        for i in range(n_blocks)
    )[: n * 4]
    h = np.frombuffer(buf, dtype=np.uint32)
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
            for media_id, duration_ms, blob in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["blob"]
            ):
                wave = decode_audio(bytes(blob), int(duration_ms))
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
                            "media_id": media_id,
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

    aud = (
        media.filter(F.col("kind") == "audio")
        .filter(F.col("duration_ms") > 0)
        # prune to the columns the batch function touches (guide §4.2)
        .select("media_id", "duration_ms", "blob")
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


# shared with the embedding operators — one dot/cosine definition
# repo-wide (llm/similarity.py), so a null-handling or cast fix there
# cannot silently miss the media path
from .similarity import _dot as _media_dot  # noqa: E402
from .similarity import cosine as _media_cosine  # noqa: E402


def media_near_dup(
    media: DataFrame, threshold: float = _MEDIA_COS_THRESHOLD
) -> DataFrame:
    """(media_a, media_b, cos_sim) candidate pairs from sign buckets,
    exact-cosine-verified at `threshold` (media_a < media_b)."""
    # materialize once: the bucket self-join consumes this twice with
    # different projections (no exchange reuse), and featurize's
    # decode+histogram Arrow pass is the dominant cost — without the
    # checkpoint every blob decodes twice
    feats = (
        featurize(media).select("media_id", "feature")
        .localCheckpoint(eager=True)
    )
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
    cos = _media_cosine(F.col("feat_a"), F.col("feat_b"))
    return (
        a_side.join(b_side, "bucket")
        .filter(F.col("media_a") < F.col("media_b"))
        # threshold on the RAW cosine, rounding only for display —
        # filtering the rounded value admits pairs just below threshold
        # (the repo-wide raw-threshold discipline)
        .filter(cos >= threshold)
        .select("media_a", "media_b", F.round(cos, 6).alias("cos_sim"))
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


# --- perceptual hash (aHash family) ------------------------------------------
#
# decode → pool to 8×8 → bit per cell (above/below mean) → 64-bit hash.
# Near-dup at hamming ≤ 3 is found WITHOUT pairwise comparison: the 64
# bits split into 4 16-bit bands; ≤3 differing bits can dirty at most 3
# bands (pigeonhole), so every true pair shares ≥1 exact band — the
# same banding soundness argument as MinHash-LSH, but exact rather than
# probabilistic. Band-bucket equi-join generates candidates; bit_count
# of the XOR verifies, JVM-side. The hash computes in the SAME Arrow
# pass as featurize at 8 B/item of state — at 100 TB the pair join
# moves 4 × (16-bit band, 64-bit hash) rows per item, never pixels.

_PHASH_BANDS = 4
_PHASH_BAND_BITS = 16

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def _phash_from_pixels(pixels: np.ndarray) -> int:
    h, w = pixels.shape
    if h < 8 or w < 8:
        pixels = np.pad(
            pixels, ((0, max(0, 8 - h)), (0, max(0, 8 - w))), mode="edge"
        )
        h, w = pixels.shape
    bh, bw = h // 8, w // 8
    pooled = (
        pixels[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    )
    bits = (pooled > pooled.mean()).ravel()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    # two's-complement into signed 64-bit (Spark LongType)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash(media: DataFrame) -> DataFrame:
    """Image table → (media_id, 64-bit perceptual hash)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                px = decode_image(bytes(blob))
                out.append(
                    {
                        "media_id": media_id,
                        "phash": _phash_from_pixels(px),
                    }
                )
            yield pd.DataFrame(out)

    # prune to (media_id, blob) before the Python boundary (guide §4.2)
    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "blob")
        .mapInPandas(batches, schema=PHASH_SCHEMA)
    )


def phash_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(media_a, media_b, hamming) pairs at hamming ≤ max_hamming via
    exact 4-band blocking (sound for max_hamming ≤ 3) + XOR popcount
    verify. Takes the hash table so callers can persist hashes once."""
    if max_hamming >= _PHASH_BANDS:
        # pigeonhole soundness bound: k dirty bits can dirty at most k
        # of the 4 bands, so ≥ 4 differing bits may share NO exact band
        # — the result would silently under-report pairs it claims to
        # cover
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the blocking soundness "
            f"bound ({_PHASH_BANDS - 1}) — add bands or use multi-probe"
        )
    bands = []
    for b in range(_PHASH_BANDS):
        band_val = F.shiftrightunsigned(
            F.col("phash"), b * _PHASH_BAND_BITS
        ).bitwiseAND(F.lit((1 << _PHASH_BAND_BITS) - 1))
        bands.append(
            hashes.select(
                "media_id",
                "phash",
                F.lit(b).alias("band_idx"),
                band_val.alias("band_val"),
            )
        )
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionByName(extra)
    a = banded.select(
        F.col("media_id").alias("media_a"),
        F.col("phash").alias("ha"),
        "band_idx",
        "band_val",
    )
    b2 = banded.select(
        F.col("media_id").alias("media_b"),
        F.col("phash").alias("hb"),
        "band_idx",
        "band_val",
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b2, ["band_idx", "band_val"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a close pair may share several bands
    )


# --- video scene cuts --------------------------------------------------------
#
# frame_sample generates timestamps; decode_frame (stub seam, like
# decode_image/decode_audio) yields per-frame pixels; the cut detector
# is then pure relational: per-frame quadrant-mean features, LAG window
# per media_id ordered by frame_ts, L1 delta > threshold ⇒ cut. The
# window is media-keyed so a 100 TB corpus parallelizes per video; per
# frame only a 4-float feature row survives the decode pass.

FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("quad", T.ArrayType(T.FloatType()), False),
    ]
)

_SCENE_LEN_MS = 5000


def decode_frame(blob: bytes, frame_ts_ms: int) -> np.ndarray:
    """STUB — a real deployment seeks the container to frame_ts_ms and
    decodes (ffmpeg). The deterministic fake derives pixels from
    (blob digest, ts // scene_len): frames inside the same simulated
    5-second scene decode identically, so cut GROUND TRUTH exists for
    the detector test — honest semantics, fake pixels."""
    scene = frame_ts_ms // _SCENE_LEN_MS
    h = hashlib.sha256(blob + struct.pack("<q", scene)).digest()
    arr = np.frombuffer((h * 8)[:256], dtype=np.uint8).astype(np.float32)
    return arr.reshape(16, 16)


def frame_features(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sampled frames → 4-quadrant mean-intensity features.

    ONE blob row per video enters the Arrow pass, carrying the sampled
    timestamp LIST (frame_sample's range kept in-row, not exploded);
    the per-frame fan-out happens inside the batch loop. Exploding
    first and joining the blob in would ship one full copy of the blob
    per frame — a 2-hour video at every_ms=1000 is 7200 blob copies —
    which is what the section's "per frame only a 4-float feature row
    survives" claim forbids. Map-only: zero shuffles."""
    frames = (
        media.filter(F.col("kind") == "video")
        .filter(F.col("duration_ms") > 0)
        .select(
            "media_id",
            "blob",
            F.sequence(
                F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
            ).alias("ts_list"),
        )
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, blob, ts_list in zip(
                pdf["media_id"], pdf["blob"], pdf["ts_list"]
            ):
                blob = bytes(blob)
                for ts in ts_list:
                    px = decode_frame(blob, int(ts))
                    qh, qw = px.shape[0] // 2, px.shape[1] // 2
                    quad = [
                        float(px[:qh, :qw].mean()),
                        float(px[:qh, qw:].mean()),
                        float(px[qh:, :qw].mean()),
                        float(px[qh:, qw:].mean()),
                    ]
                    out.append(
                        {
                            "media_id": media_id,
                            "frame_ts_ms": int(ts),
                            "quad": quad,
                        }
                    )
            yield pd.DataFrame(out)

    return frames.mapInPandas(batches, schema=FRAME_FEATURE_SCHEMA)


def scene_cuts(media: DataFrame, every_ms: int = 1000, threshold: float = 1.0) -> DataFrame:
    """(media_id, frame_ts_ms) rows where the frame's feature L1-delta
    vs the previous frame exceeds threshold — scene boundaries."""
    from pyspark.sql.window import Window

    feats = frame_features(media, every_ms)
    w = Window.partitionBy("media_id").orderBy("frame_ts_ms")
    prev = F.lag("quad").over(w)
    l1 = F.aggregate(
        F.zip_with(F.col("quad"), prev, lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return (
        feats.withColumn("delta", l1)
        .filter(F.col("delta") > threshold)
        .select("media_id", "frame_ts_ms", F.round("delta", 4).alias("delta"))
    )


# --- audio fingerprint match -------------------------------------------------
#
# Shazam-lite: the windowed RMS sequence (audio_features) quantizes to
# a bit per step (energy rising/falling); 16 consecutive bits shingle
# into a fingerprint hash at each window index. Matching joins probe
# fingerprints against corpus fingerprints on the hash and votes on
# the ALIGNMENT OFFSET (corpus_idx - probe_idx): a true containment
# match concentrates votes at one offset, noise spreads them. All
# relational after the feature pass: one equi-join on fp_hash + one
# (probe, candidate, offset) count — at 100 TB the corpus fingerprint
# table is the only big side and it shuffles once on fp_hash.

_FP_BITS = 16


def audio_fingerprints(media: DataFrame, window: int = 2048) -> DataFrame:
    """(media_id, widx, fp_hash): one hash per window position from the
    next _FP_BITS rising/falling-energy bits."""
    from pyspark.sql.window import Window

    feats = audio_features(media, window)
    w = Window.partitionBy("media_id").orderBy("window_idx")
    bit = (F.lead("rms").over(w) > F.col("rms")).cast("long")
    with_bits = feats.select(
        "media_id", F.col("window_idx").alias("widx"), bit.alias("bit")
    ).filter(F.col("bit").isNotNull())
    fp = F.lit(0).cast("long")
    cols = {}
    for i in range(_FP_BITS):
        cols[f"b{i}"] = F.lead("bit", i).over(
            Window.partitionBy("media_id").orderBy("widx")
        )
    df = with_bits.select("media_id", "widx", *[c.alias(n) for n, c in cols.items()])
    for i in range(_FP_BITS):
        fp = fp + F.shiftleft(F.coalesce(F.col(f"b{i}"), F.lit(0)).cast("long"), i)
    return (
        df.filter(F.col(f"b{_FP_BITS - 1}").isNotNull())  # full shingles only
        .select("media_id", "widx", fp.alias("fp_hash"))
    )


def audio_match(corpus_fps: DataFrame, probe_fps: DataFrame) -> DataFrame:
    """(probe_id, media_id, offset, votes) ranked by votes — which
    corpus track contains each probe clip, and where."""
    p = probe_fps.select(
        F.col("media_id").alias("probe_id"),
        F.col("widx").alias("p_idx"),
        "fp_hash",
    )
    c = corpus_fps.select("media_id", F.col("widx").alias("c_idx"), "fp_hash")
    return (
        p.join(c, "fp_hash")
        .groupBy("probe_id", "media_id", (F.col("c_idx") - F.col("p_idx")).alias("offset"))
        .agg(F.count("*").alias("votes"))
    )


# --- cross-modal retrieval ---------------------------------------------------
#
# Media features (16-dim histograms) project into the shared 64-dim
# embedding space through a FIXED md5-derived matrix (the stand-in for
# a trained CLIP-style projection head; swapping in learned weights
# changes one constant). After projection, media rows are ordinary
# vectors: retrieval against the embeddings corpus reuses the exact
# JVM-side cosine machinery (zip_with/aggregate) — no new join shapes,
# which is the point: multimodal search is the SAME plan family as
# text-embedding search once the projection has run.

_XMODAL_IN = _MEDIA_FEAT_DIMS
_XMODAL_OUT = 64


def _projection_matrix() -> np.ndarray:
    rows = []
    for i in range(_XMODAL_OUT):
        row = [
            int(hashlib.md5(f"xm{i}:{j}".encode()).hexdigest()[:8], 16)
            / 2**32
            - 0.5
            for j in range(_XMODAL_IN)
        ]
        rows.append(row)
    return np.asarray(rows, dtype=np.float32)


def media_embeddings(media: DataFrame) -> DataFrame:
    """(media_id, embedding[64]): featurize → fixed linear projection,
    one Arrow pass (the matmul rides the same batch as the decode)."""
    proj = _projection_matrix()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                emb = proj @ _blob_feature(bytes(blob))
                out.append({"media_id": media_id, "embedding": emb.tolist()})
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    )
    # prune to (media_id, blob) before the Python boundary (guide §4.2)
    return media.select("media_id", "blob").mapInPandas(batches, schema=schema)


def cross_modal_topk(
    media: DataFrame, query_vec: list, k: int = 5
) -> DataFrame:
    """Top-k media for a 64-dim query vector (e.g. a text embedding):
    broadcast query, JVM cosine, TakeOrdered — identical plan shape to
    llm/similarity.similarity_topk, media side instead of corpus."""
    if len(query_vec) != _XMODAL_OUT:
        # zip_with over mismatched lengths pads with NULLs, so the
        # cosine would come back NULL for every row and the top-k would
        # be silently arbitrary instead of failing the bad query
        raise ValueError(
            f"cross_modal_topk: query_vec has {len(query_vec)} dims, "
            f"the shared embedding space is {_XMODAL_OUT}"
        )
    emb = media_embeddings(media)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = _media_cosine(F.col("embedding"), qlit)
    return (
        emb.select("media_id", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("media_id"))
        .limit(k)
    )
