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
