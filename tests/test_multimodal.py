"""Multimodal plumbing tests (N5): binary columns survive the Arrow
round-trip, featurization is deterministic and batch-shaped correctly,
frame sampling explodes as expected."""

from __future__ import annotations

from chess_pos_db_spark.llm import multimodal as mm


def test_featurize_schema_and_determinism(spark):
    media = mm.synthetic_media(spark, n=32)
    feats = mm.featurize(media)
    rows1 = {r["media_id"]: r for r in feats.collect()}
    rows2 = {r["media_id"]: r for r in mm.featurize(media).collect()}
    assert len(rows1) == 32
    for mid, r in rows1.items():
        assert len(r["feature"]) == 16
        assert abs(sum(r["feature"]) - 1.0) < 1e-5  # normalized histogram
        assert len(r["content_digest"]) == 64
        assert rows2[mid]["content_digest"] == r["content_digest"]
        assert rows2[mid]["feature"] == r["feature"]


def test_blob_binary_roundtrip(spark, tmp_path):
    media = mm.synthetic_media(spark, n=12)
    path = str(tmp_path / "media")
    media.write.parquet(path)
    back = spark.read.parquet(path)
    a = {r["media_id"]: bytes(r["blob"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["blob"]) for r in back.collect()}
    assert a == b


def test_frame_sample(spark):
    media = mm.synthetic_media(spark, n=30)
    frames = mm.frame_sample(media, every_ms=1000)
    rows = frames.collect()
    # every sampled ts is a multiple of the stride within duration
    vids = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter("kind = 'video' AND duration_ms > 0").collect()
    }
    got = {}
    for r in rows:
        assert r["frame_ts_ms"] % 1000 == 0
        assert r["frame_ts_ms"] < vids[r["media_id"]]
        got.setdefault(r["media_id"], 0)
        got[r["media_id"]] += 1
    for mid, dur in vids.items():
        assert got[mid] == (dur + 999) // 1000


def test_resize_block_mean(spark):
    media = mm.synthetic_media(spark, 12)
    out = mm.resize(media, out_w=4, out_h=4)
    rows = out.collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images
    for r in rows:
        assert (r.out_w, r.out_h) == (4, 4)
        assert len(r.pixels) == 16
        assert all(0.0 <= p <= 255.0 for p in r.pixels)
    # determinism: same blobs → same pixels
    again = {x.media_id: x.pixels for x in mm.resize(media, 4, 4).collect()}
    assert {r.media_id: r.pixels for r in rows} == again


def test_resize_upscales_small_images(spark):
    """Images smaller than the target grid edge-replicate instead of
    crashing in the block-mean reshape (decoded fakes are 16×16, so a
    32×32 target exercises the upscale path)."""
    media = mm.synthetic_media(spark, 6)
    rows = mm.resize(media, out_w=32, out_h=32).collect()
    assert len(rows) == media.filter("kind = 'image'").count()
    for r in rows:
        assert len(r.pixels) == 32 * 32
        assert all(0.0 <= p <= 255.0 for p in r.pixels)


def test_audio_features_window_math(spark):
    media = mm.synthetic_media(spark, n=30)
    out = mm.audio_features(media, window=2048)
    rows = out.collect()
    auds = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter("kind = 'audio' AND duration_ms > 0").collect()
    }
    got = {}
    for r in rows:
        assert -1.0 <= r["rms"] <= 1.0
        assert 0 <= r["zero_crossings"] < 2048
        assert 0.0 <= r["peak"] <= 1.0
        got.setdefault(r["media_id"], []).append(r["window_idx"])
    for mid, dur in auds.items():
        n_win = (dur * 8) // 2048
        idx = sorted(got.get(mid, []))
        assert idx == list(range(n_win)), (mid, dur)
    # determinism across runs (stubbed codec is content-derived)
    again = sorted(tuple(r) for r in mm.audio_features(media).collect())
    assert sorted(tuple(r) for r in rows) == again


def test_media_near_dup_finds_identical_content(spark):
    """Two media rows with identical blob bytes must surface as a
    near-dup pair through the BUCKETED path (and as one exact-dup
    group); unrelated rows must not pair."""
    from chess_pos_db_spark.llm import multimodal as M
    import struct

    base = M.synthetic_media(spark, n=12)
    dup_blob = struct.pack("<q", 7777) * 10
    extra = spark.createDataFrame(
        [
            (100, "image", 16, 16, None, bytearray(dup_blob)),
            (101, "image", 16, 16, None, bytearray(dup_blob)),
        ],
        M.MEDIA_SCHEMA,
    )
    media = base.unionAll(extra)
    pairs = {
        (r["media_a"], r["media_b"]) for r in M.media_near_dup(media).collect()
    }
    assert (100, 101) in pairs
    groups = {
        r["keep_id"]: r["n_copies"]
        for r in M.media_exact_dup_groups(media).collect()
    }
    assert groups[100] == 2
    # every synthetic blob is distinct content: no other multi-copy group
    assert all(n == 1 for k, n in groups.items() if k != 100)


def test_phash_identical_blobs_hamming_zero(spark):
    """synthetic_media reuses blob content across ids (blob depends on
    i and i%5 only through repetition count... construct explicitly):
    two media rows with the SAME bytes must collide at hamming 0."""
    rows = [
        (1, "image", 16, 16, None, bytearray(b"samebytes")),
        (2, "image", 16, 16, None, bytearray(b"samebytes")),
        (3, "image", 16, 16, None, bytearray(b"different")),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    hashes = mm.phash(media)
    pairs = mm.phash_pairs(hashes, max_hamming=0).collect()
    assert [(r.media_a, r.media_b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_phash_band_blocking_sound_at_hamming_3(spark):
    """Hand-built hashes differing in exactly 3 bits spread across 3
    DIFFERENT bands must still be found (pigeonhole: one clean band
    remains), and a 4-bits-in-4-bands pair must NOT appear at
    max_hamming=3 (it is genuinely farther than the radius)."""
    base = 0x0123456789ABCDEF
    three = base ^ (1 << 0) ^ (1 << 16) ^ (1 << 32)  # 3 bands dirtied
    four = base ^ (1 << 0) ^ (1 << 16) ^ (1 << 32) ^ (1 << 48)  # all 4

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    hashes = spark.createDataFrame(
        [(1, signed(base)), (2, signed(three)), (3, signed(four))],
        mm.PHASH_SCHEMA,
    )
    got = {
        (r.media_a, r.media_b): r.hamming
        for r in mm.phash_pairs(hashes, max_hamming=3).collect()
    }
    assert got.get((1, 2)) == 3
    assert (1, 3) not in got  # hamming 4 > radius
    # (2,3) differ in exactly 1 bit (bit 48) -> must be found
    assert got.get((2, 3)) == 1


def test_scene_cuts_at_simulated_boundaries(spark):
    """decode_frame simulates 5-second scenes; sampling at 1 fps must
    report cuts exactly at the 5000/10000/... ms frames."""
    rows = [(1, "video", None, None, 15000, bytearray(b"vid-a"))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    cuts = sorted(
        r.frame_ts_ms for r in mm.scene_cuts(media, every_ms=1000).collect()
    )
    assert cuts == [5000, 10000]


def test_audio_fingerprint_match_finds_clip(spark):
    """A probe made from a contiguous widx slice of one track's
    fingerprints must vote that track at the slicing offset."""
    rows = [
        (1, "audio", None, None, 6000, bytearray(b"track-one")),
        (2, "audio", None, None, 6000, bytearray(b"track-two")),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    fps = mm.audio_fingerprints(media, window=512).cache()
    from pyspark.sql import functions as F

    probe = (
        fps.filter((F.col("media_id") == 1) & F.col("widx").between(10, 40))
        .select(
            F.lit(99).alias("media_id"),
            (F.col("widx") - 10).alias("widx"),
            "fp_hash",
        )
    )
    ranked = (
        mm.audio_match(fps, probe)
        .orderBy(F.col("votes").desc())
        .collect()
    )
    top = ranked[0]
    assert (top.probe_id, top.media_id, top.offset) == (99, 1, 10)
    # the true alignment must dominate: full agreement over the slice
    assert top.votes == 31


def test_cross_modal_retrieval_shape_and_selfmatch(spark):
    """Projection + retrieval: querying WITH a media item's own
    projected embedding must rank that item first (cos 1.0), and the
    plan must be the broadcast-cosine/TakeOrdered family (no join,
    no shuffle on the media side beyond the top-k merge)."""
    media = mm.synthetic_media(spark, n=24)
    embs = {r["media_id"]: r["embedding"] for r in mm.media_embeddings(media).collect()}
    probe_id = sorted(embs)[3]
    top = mm.cross_modal_topk(media, embs[probe_id], k=3).collect()
    assert top[0]["media_id"] == probe_id
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-6
    plan = mm.cross_modal_topk(media, embs[probe_id], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_cross_modal_wrong_query_dims_fail_loudly(spark):
    """A query vector outside the shared 64-dim space must raise —
    zip_with over mismatched lengths NULL-pads, so the cosine would be
    NULL for every row and the top-k silently arbitrary."""
    import pytest

    media = mm.synthetic_media(spark, 6)
    with pytest.raises(ValueError, match="dims"):
        mm.cross_modal_topk(media, [1.0] * 16, k=3)


# --- round 12: REAL codec paths (stdlib-only PNG/BMP/PNM/WAV) ---------------


def _png_encode(gray: "np.ndarray", filters: list[int]) -> bytes:
    """Tiny test-side PNG writer: 8-bit grayscale, one explicit filter
    type per row (so every reconstruction branch of the decoder is
    exercised against independently-computed filter output)."""
    import struct
    import zlib

    import numpy as np

    h, w = gray.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        row = gray[y].astype(np.int64)
        f = filters[y % len(filters)]
        raw.append(f)
        if f == 0:
            enc = row
        elif f == 1:  # Sub
            left = np.concatenate(([0], row[:-1]))
            enc = (row - left) % 256
        elif f == 2:  # Up
            enc = (row - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate(([0], row[:-1]))
            enc = (row - (left + prev) // 2) % 256
        else:  # Paeth
            enc = np.zeros(w, dtype=np.int64)
            for x in range(w):
                a = int(row[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (row[x] - pred) % 256
        raw.extend(int(v) for v in enc)
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_image_real_png_all_filters():
    """The PNG path is a REAL decoder: an image encoded with every
    scanline filter type (None/Sub/Up/Average/Paeth) reconstructs
    bit-exactly."""
    import numpy as np

    from chess_pos_db_spark.llm import multimodal as MM

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, size=(10, 9)).astype(np.uint8)
    blob = _png_encode(gray, filters=[0, 1, 2, 3, 4])
    got = MM.decode_image(blob)
    assert got.shape == (10, 9)
    assert got.dtype == np.float32
    assert np.array_equal(got, gray.astype(np.float32))


def test_decode_image_real_png_rgb_luma():
    """RGB PNGs reduce to Rec.601 luma."""
    import struct
    import zlib

    import numpy as np

    from chess_pos_db_spark.llm import multimodal as MM

    # 1x2 RGB image: pure red, pure white — filter 0 rows
    w, h = 2, 1
    raw = bytes([0, 255, 0, 0, 255, 255, 255])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = MM.decode_image(blob)
    assert got.shape == (1, 2)
    assert abs(got[0, 0] - 0.299 * 255) < 1e-3
    assert abs(got[0, 1] - 255.0) < 1e-3


def test_decode_image_real_bmp_and_pnm():
    """BMP (24-bit, bottom-up, padded stride) and binary PGM (header
    comment included) decode for real."""
    import struct

    import numpy as np

    from chess_pos_db_spark.llm import multimodal as MM

    # 2x2 BMP, 24-bit: stride = 8 bytes (2*3 -> padded to 8). Pixels
    # (BGR): bottom row first in the file.
    top = [(10, 10, 10), (20, 20, 20)]      # logical row 0
    bottom = [(30, 30, 30), (40, 40, 40)]   # logical row 1
    raster = b""
    for row in (bottom, top):  # bottom-up storage
        for bgr in row:
            raster += bytes(bgr)
        raster += b"\x00\x00"  # stride padding
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster),
                      2835, 2835, 0, 0)
    )
    got = MM.decode_image(header + raster)
    assert got.shape == (2, 2)
    assert np.allclose(got, [[10, 20], [30, 40]])

    pgm = b"P5 # a comment\n2 2\n255\n" + bytes([1, 2, 3, 4])
    got2 = MM.decode_image(pgm)
    assert np.array_equal(got2, np.array([[1, 2], [3, 4]], dtype=np.float32))


def test_decode_image_fallback_still_deterministic():
    """Unknown formats (and truncated real headers) keep the
    deterministic 16x16 pseudo-pixel fallback — the fixture-blob
    contract every existing pipeline test relies on."""
    import numpy as np

    from chess_pos_db_spark.llm import multimodal as MM

    a = MM.decode_image(b"\x00\x01\x02 not an image")
    b = MM.decode_image(b"\x00\x01\x02 not an image")
    assert a.shape == (16, 16) and np.array_equal(a, b)
    # a PNG magic with garbage body must not crash — falls back
    c = MM.decode_image(b"\x89PNG\r\n\x1a\n garbage")
    assert c.shape == (16, 16)


def test_decode_image_malformed_real_headers_fall_back():
    """Round-13 ADVICE regression: a blob with a VALID magic that dies
    deep in the decoder (struct.error on a truncated chunk, zlib.error
    on a corrupt IDAT, short BMP header) must hit the deterministic
    fallback, not escape and fail the whole mapInPandas task — the
    documented contract is that no blob content can kill the job."""
    import numpy as np

    from chess_pos_db_spark.llm import multimodal as MM

    gray = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    good = _png_encode(gray.astype(np.float32), filters=[0, 1, 2, 3, 4])
    # truncated mid-chunk: the length word promises bytes that are gone
    truncated = good[: len(good) // 2]
    # corrupt IDAT payload: valid chunk framing, garbage zlib stream
    idat = good.find(b"IDAT")
    corrupted = good[: idat + 4] + bytes(
        (b ^ 0xFF) for b in good[idat + 4 : idat + 12]
    ) + good[idat + 12 :]
    # BMP magic with a header too short to parse
    short_bmp = b"BM\x01\x02\x03"
    # PNM with a non-numeric dimension token
    bad_pnm = b"P5\n12 xx\n255\n\x00"
    for blob in (truncated, corrupted, short_bmp, bad_pnm):
        out = MM.decode_image(blob)
        assert out.shape == (16, 16)
        assert np.array_equal(out, MM.decode_image(blob))


def test_decode_audio_real_wav_pcm():
    """The WAV path is a REAL decoder: 16-bit PCM round-trips with
    correct normalization, stereo downmixes to mono by mean, 8-bit
    unsigned centers at zero; malformed RIFF falls back."""
    import io
    import wave as wave_mod

    import numpy as np

    from chess_pos_db_spark.llm import multimodal as MM

    def wav_bytes(samples_by_channel, sampwidth):
        buf = io.BytesIO()
        nch = len(samples_by_channel)
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(sampwidth)
            w.setframerate(8000)
            inter = np.stack(samples_by_channel, axis=1).ravel()
            if sampwidth == 2:
                w.writeframes(inter.astype("<i2").tobytes())
            else:
                w.writeframes(inter.astype(np.uint8).tobytes())
        return buf.getvalue()

    mono = wav_bytes([np.array([0, 16384, -16384, 32767])], 2)
    got = MM.decode_audio(mono, duration_ms=999)  # duration ignored
    assert got.dtype == np.float32 and len(got) == 4
    assert np.allclose(got, [0.0, 0.5, -0.5, 32767 / 32768], atol=1e-6)

    stereo = wav_bytes(
        [np.array([16384, 0]), np.array([0, -16384])], 2
    )
    got2 = MM.decode_audio(stereo, duration_ms=1)
    assert np.allclose(got2, [0.25, -0.25], atol=1e-6)

    eight = wav_bytes([np.array([128, 255, 0])], 1)
    got3 = MM.decode_audio(eight, duration_ms=1)
    assert np.allclose(got3, [0.0, 127 / 128, -1.0], atol=1e-6)

    bad = b"RIFF\x00\x00\x00\x00WAVEgarbage"
    fb = MM.decode_audio(bad, duration_ms=2)
    assert fb.dtype == np.float32 and len(fb) == 16  # 8 samples/ms fake


def test_real_codecs_flow_through_pipelines(spark):
    """Real-format blobs ride the SAME Spark pipelines as fixture
    blobs: a PNG through featurize (histogram over real pixels), phash
    and resize; a WAV through audio_features — near-identical images
    now land NEAR each other (the fallback hash never gave similarity
    a gradient)."""
    import numpy as np

    from chess_pos_db_spark.llm import multimodal as MM

    base = np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))
    near = base.copy()
    near[0, 0] = min(255, int(near[0, 0]) + 1)  # one-pixel perturbation
    # a genuinely different intensity DISTRIBUTION (an inverted ramp
    # would have the identical histogram — the feature is a histogram)
    far = np.full((16, 16), 7, dtype=np.uint8)
    blobs = [
        _png_encode(img, filters=[0, 1, 2, 3, 4])
        for img in (base, near, far)
    ]
    rows = [
        (i, "image", 16, 16, None, bytearray(b))
        for i, b in enumerate(blobs)
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)

    feats = {r["media_id"]: r["feature"] for r in MM.featurize(media).collect()}
    a, b, c = (np.array(feats[i]) for i in range(3))
    cos = lambda x, y: float(
        np.dot(x, y) / max(1e-9, np.linalg.norm(x) * np.linalg.norm(y))
    )
    assert cos(a, b) > 0.999, "near-identical real images must be near"
    assert cos(a, b) > cos(a, c)

    hashes = {r["media_id"]: r["phash"] for r in MM.phash(media).collect()}
    ham = bin(hashes[0] ^ hashes[1]).count("1")
    assert ham <= 3, f"near-dup phash hamming {ham}"

    rs = MM.resize(media, out_w=4, out_h=4).collect()
    assert all(len(r["pixels"]) == 16 for r in rs)

    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        t = np.arange(4096)
        w.writeframes(
            (np.sin(t / 10.0) * 20000).astype("<i2").tobytes()
        )
    arows = [(10, "audio", None, None, 512, bytearray(buf.getvalue()))]
    audio = spark.createDataFrame(arows, MM.MEDIA_SCHEMA)
    af = MM.audio_features(audio, window=2048).collect()
    assert len(af) == 2  # 4096 real samples / 2048
    assert all(0.0 < r["rms"] < 1.0 for r in af)
