"""SBGN binary format tests: codec round-trip, 1-byte/move density,
and Spark-source parity with the PGN import path."""

from __future__ import annotations

import os

from chess_pos_db_spark.chess import bcgn, importer, pgn
from tests.test_chess import PGN_TEXT


def _games():
    out = []
    for g in pgn.parse_file(PGN_TEXT):
        g = dict(g)
        g["level"] = "human"
        tags = g.pop("tags")
        g["event"] = tags.get("Event")
        g["white"] = tags.get("White")
        g["black"] = tags.get("Black")
        g["white_elo"] = int(tags["WhiteElo"]) if "WhiteElo" in tags else None
        g["black_elo"] = int(tags["BlackElo"]) if "BlackElo" in tags else None
        out.append(g)
    return out


def test_codec_roundtrip(tmp_path):
    games = _games()
    path = str(tmp_path / "games.sbgn")
    bcgn.write_file(games, path)
    back = list(bcgn.decode_file(open(path, "rb").read()))
    assert len(back) == len(games)
    for a, b in zip(games, back):
        assert a["sans"] == b["sans"]
        assert a["result"] == b["result"]
        assert a["white_elo"] == b["white_elo"]
        assert a.get("year") == b["year"]


def test_move_density(tmp_path):
    games = _games()
    path = str(tmp_path / "games.sbgn")
    bcgn.write_file(games, path)
    total_plies = sum(len(g["sans"]) for g in games)
    size = os.path.getsize(path)
    # movetext is exactly 1 byte/ply; the rest is fixed+string header
    header_overhead = size - total_plies
    assert header_overhead < len(games) * 80


def test_spark_source_parity(spark, tmp_path):
    """Importing the same games via SBGN must produce the identical
    aggregated entries table as importing via PGN."""
    pgn_path = tmp_path / "g.pgn"
    pgn_path.write_text(PGN_TEXT)
    sbgn_path = str(tmp_path / "g.sbgn")
    bcgn.write_file(_games(), sbgn_path)

    games_pgn = importer.parse_games(
        importer.read_pgn_files(spark, [(str(pgn_path), "human")])
    )
    games_bin = bcgn.read_sbgn(spark, [(sbgn_path, "human")])

    agg_pgn = importer.build_agg_entries(importer.explode_positions(games_pgn))
    agg_bin = importer.build_agg_entries(importer.explode_positions(games_bin))
    a = {tuple(r) for r in agg_pgn.collect()}
    b = {tuple(r) for r in agg_bin.collect()}
    assert a == b and len(a) > 0


def test_sbgn_corrupt_records_fail_loudly():
    """Truncated movetext / strings / records must raise, not silently
    decode a SHORTER game: read_sbgn recomputes ply_count from
    len(sans), so a silent short slice would make the corruption
    invisible downstream — an imported database with wrong games and
    ok:true."""
    import struct

    import pytest

    from chess_pos_db_spark.chess import bcgn

    good = bcgn.MAGIC + bytes([bcgn.VERSION]) + struct.pack("<I", 1)
    rec = bcgn.encode_game(
        {"result": "W", "level": "human", "sans": ["e4", "e5", "Nf3", "Nc6"]}
    )
    assert list(bcgn.decode_file(good + rec))  # sanity: intact decodes

    # chop two move bytes off the end: declared 4 plies, 2 remain
    truncated = good + rec[:-2]
    with pytest.raises(ValueError, match="plies|record"):
        list(bcgn.decode_file(truncated))


def test_read_sbgn_rejects_duplicate_paths(spark, tmp_path):
    """Duplicate input paths collapse the (idx, level) maps silently
    and emit colliding game_ids — the same loud contract as
    importer.read_pgn_files."""
    import pytest

    from chess_pos_db_spark.chess import bcgn

    f = str(tmp_path / "x.sbgn")
    bcgn.write_file(
        [{"result": "W", "level": "human", "sans": ["e4"]}], f
    )
    with pytest.raises(ValueError, match="duplicate input paths"):
        bcgn.read_sbgn(spark, [(f, "human"), (f, "engine")])
