"""Generic ingest sources: CSV/JSONL round-trips must reproduce the
parquet-read fixture exactly, and malformed rows must quarantine
instead of failing or vanishing."""

from __future__ import annotations

from pyspark.sql import functions as F

from chess_pos_db_spark.sources import formats
from chess_pos_db_spark.tables import t


def _docs(spark, sf_dir):
    return t(spark, sf_dir, "documents")


def test_jsonl_roundtrip_exact(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(path)
    back = formats.read_jsonl(spark, path, formats.DOCUMENTS_SCHEMA)
    clean, bad = formats.split_quarantine(back)
    assert bad.count() == 0
    assert sorted(map(tuple, clean.collect())) == sorted(
        map(tuple, docs.collect())
    )


def test_csv_roundtrip_exact(spark, sf_dir, tmp_path):
    # documents text has no commas/quotes/newlines; orders exercises
    # timestamps + doubles. Round-trip both.
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "docs_csv")
    docs.write.mode("overwrite").option("header", True).csv(path)
    back = formats.read_csv(spark, path, formats.DOCUMENTS_SCHEMA)
    clean, bad = formats.split_quarantine(back)
    assert bad.count() == 0
    assert sorted(map(tuple, clean.collect())) == sorted(
        map(tuple, docs.collect())
    )


def test_jsonl_malformed_rows_quarantine(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok doc", "lang": "en", "source": "s", "n_chars": 6}\n'
        "this is not json at all\n"
        '{"doc_id": "NOT_A_NUMBER", "text": "bad id", "lang": "en", "source": "s", "n_chars": 6}\n'
        '{"doc_id": 2, "text": "another ok", "lang": "de", "source": "s", "n_chars": 10}\n'
    )
    back = formats.read_jsonl(spark, str(p), formats.DOCUMENTS_SCHEMA)
    clean, bad = formats.split_quarantine(back)
    got = {r["doc_id"] for r in clean.collect()}
    assert got == {1, 2}
    assert bad.count() == 2  # the non-JSON line and the bad-typed row


def test_csv_malformed_rows_quarantine(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,ok doc,en,s,6\n"
        "NOT_A_NUMBER,bad id,en,s,6\n"
        "2,another ok,de,s,10\n"
    )
    back = formats.read_csv(spark, str(p), formats.DOCUMENTS_SCHEMA)
    clean, bad = formats.split_quarantine(back)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    assert bad.count() == 1


def test_pgn_stream_source_incremental(spark, tmp_path):
    """Streaming form of the pgn data source: new files in the watched
    directory arrive as new micro-batches; the checkpointed seen-file
    offset makes re-imports exactly-once across restarts; accumulated
    stream output equals a batch read of the same files."""
    from chess_pos_db_spark.chess.datasource import PgnDataSource
    from .test_chess import PGN_TEXT

    try:
        spark.dataSource.register(PgnDataSource)
    except Exception:
        pass  # already registered by an earlier test

    watch = tmp_path / "incoming"
    watch.mkdir()
    (watch / "a.pgn").write_text(PGN_TEXT)

    out_dir = str(tmp_path / "out")
    chk = str(tmp_path / "chk")

    def drain():
        q = (
            spark.readStream.format("pgn")
            .load(str(watch))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 4  # PGN_TEXT holds 4 kept games

    # second file arrives; restart the stream from the checkpoint
    (watch / "b.pgn").write_text(PGN_TEXT)
    drain()
    got = spark.read.parquet(out_dir)
    assert got.count() == 8
    # a.pgn was NOT re-imported (exactly-once over the offset log)
    assert got.filter("path LIKE '%a.pgn'").count() == 4

    batch = spark.read.format("pgn").load(str(watch))
    assert sorted(
        (r["path"], r["game_offset"], r["result"]) for r in got.collect()
    ) == sorted(
        (r["path"], r["game_offset"], r["result"]) for r in batch.collect()
    )


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC as the alternate columnar container: sorted-run write,
    byte-identical read-back, and probe predicates pushed to the scan
    (stripe-pruning analogue of the Parquet path)."""
    from chess_pos_db_spark.sources import formats
    from chess_pos_db_spark.tables import t

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    path = str(tmp_path / "orc_run")
    formats.write_orc_run(li, path, key=["l_orderkey"])

    back = formats.read_orc(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in li.collect()
    )

    probe = back.filter("l_orderkey = 7")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_orderkey" in plan
    assert probe.count() == li.filter("l_orderkey = 7").count()


def test_stream_reader_rejects_grown_files_and_unique_file_idx(tmp_path):
    """Offset bookkeeping (no Spark needed): a seen file that GREW
    fails loudly (immutability contract — silent skip loses games,
    re-read duplicates ids), and file_idx allocation continues across
    micro-batches so game ids never collide."""
    import pytest

    from chess_pos_db_spark.chess.datasource import PgnStreamReader

    a, b, c = (str(tmp_path / f"{n}.pgn") for n in "abc")
    for f in (a, b, c):
        with open(f, "w") as fh:
            fh.write('[Event "x"]\n\n1. e4 e5 1-0\n')
    rd = PgnStreamReader({"path": str(tmp_path)})

    batch1 = rd.partitions({"seen": []}, {"seen": [[a, 30], [b, 30]]})
    batch2 = rd.partitions(
        {"seen": [[a, 30], [b, 30]]},
        {"seen": [[a, 30], [b, 30], [c, 30]]},
    )
    idx1 = {p.file_idx for p in batch1 if p.end > p.start}
    idx2 = {p.file_idx for p in batch2 if p.end > p.start}
    assert idx1 == {0, 1}
    assert idx2 == {2}  # continues, never reuses batch 1's ids

    with pytest.raises(ValueError, match="changed size"):
        rd.partitions(
            {"seen": [[a, 30]]}, {"seen": [[a, 99], [b, 30]]}
        )
    # a SHRUNK/rewritten file is the same immutability violation: a
    # crash-replay would re-read different content than the committed
    # plan imported
    with pytest.raises(ValueError, match="changed size"):
        rd.partitions(
            {"seen": [[a, 30]]}, {"seen": [[a, 12], [b, 30]]}
        )

    # legacy plain-path offsets still parse (size unknown -> no check)
    legacy = rd.partitions({"seen": [a]}, {"seen": [[a, 99], [b, 30]]})
    assert {p.file_idx for p in legacy if p.end > p.start} == {1}

    # a seen file that DISAPPEARED also fails loudly: file_idx is
    # allocated from the cumulative seen count, so a deletion would
    # shrink the base and a later new file would silently reuse an
    # already-assigned idx (colliding game_ids) — e.g. delete a.pgn,
    # then c.pgn would get idx 1, already held by b.pgn
    with pytest.raises(ValueError, match="disappeared"):
        rd.partitions(
            {"seen": [[a, 30], [b, 30]]},
            {"seen": [[b, 30], [c, 30]]},
        )


def test_stream_reader_glob_expands_directories(tmp_path):
    """A glob that matches a SUBDIRECTORY must expand to its .pgn files
    (as the batch reader always did) — planning a byte-range partition
    over the directory inode wedges the stream permanently, because the
    poison batch is already in the checkpoint on every restart."""
    from chess_pos_db_spark.chess.datasource import PgnStreamReader

    sub = tmp_path / "dump1"
    sub.mkdir()
    (sub / "x.pgn").write_text('[Event "x"]\n\n1. e4 e5 1-0\n')
    rd = PgnStreamReader({"path": str(tmp_path / "*")})
    files = rd._current_files()
    assert files == [str(sub / "x.pgn")]
    off = rd.latestOffset()
    assert [e[0] for e in off["seen"]] == [str(sub / "x.pgn")]


def test_stream_reader_legacy_new_file_size_fallback(tmp_path):
    """A legacy plain-path offset entry appearing as a NEW file in the
    end offset (pre-size checkpoint with an uncommitted planned batch)
    must fall back to the live file size, not crash with a TypeError
    from integer arithmetic on None — and a clear error if the file is
    gone."""
    import pytest

    from chess_pos_db_spark.chess.datasource import PgnStreamReader

    a = str(tmp_path / "a.pgn")
    with open(a, "w") as fh:
        fh.write('[Event "x"]\n\n1. e4 e5 1-0\n')
    rd = PgnStreamReader({"path": str(tmp_path)})
    parts = rd.partitions({"seen": []}, {"seen": [a]})
    assert [p for p in parts if p.end > p.start]

    import os

    os.remove(a)
    with pytest.raises(ValueError, match="no recorded size"):
        rd.partitions({"seen": []}, {"seen": [a]})


def test_csv_header_order_mismatch_fails_loudly(spark, tmp_path):
    """A CSV whose header order disagrees with the declared schema must
    FAIL the read, not silently bind columns by position (Spark's
    enforceSchema default discards the header): text landing in lang
    and lang in text would corrupt every downstream operator with zero
    signal. Matching headers (any case) still read clean — the
    quarantine tests above cover that path with the corrupt column."""
    import pytest

    p = tmp_path / "swapped.csv"
    p.write_text(
        "text,doc_id,lang,source,n_chars\n"  # first two columns swapped
        "ok doc,1,en,s,6\n"
    )
    back = formats.read_csv(spark, str(p), formats.DOCUMENTS_SCHEMA)
    with pytest.raises(Exception, match="header|conform|CSV"):
        back.collect()
