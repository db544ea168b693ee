"""Wire-protocol tests: the create→query→stats lifecycle through the
Engine dispatcher and over a real TCP socket (the reference's GUI
integration surface)."""

from __future__ import annotations

import pytest

from chess_pos_db_spark.app import server
from chess_pos_db_spark.chess.board import START_FEN
from tests.test_chess import PGN_TEXT


@pytest.fixture(scope="module")
def engine_db(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("srv")
    pgn_path = root / "games.pgn"
    pgn_path.write_text(PGN_TEXT)
    eng = server.Engine(spark)
    resp = eng.handle(
        {
            "command": "create",
            "destination": str(root / "db"),
            "files": {"human": [str(pgn_path)]},
            "format": "pgn",
        }
    )
    assert resp["ok"], resp
    return eng


def test_create_and_stats(engine_db):
    resp = engine_db.handle({"command": "stats"})
    assert resp["ok"]
    assert resp["stats"]["games"] == 4
    assert resp["stats"]["positions"] == 14


def test_query_command(engine_db):
    resp = engine_db.handle(
        {
            "command": "query",
            "query": {
                "token": "q1",
                "positions": [{"fen": START_FEN, "move": "e4"}],
                "fetchChildren": True,
            },
        }
    )
    assert resp["ok"]
    node = resp["response"]["positions"][0]
    assert node["stats"]["continuation"]["human"]["W"]["count"] == 1
    assert "e5" in node["children"]


def test_error_does_not_kill_session(engine_db):
    bad = engine_db.handle({"command": "query", "query": {"positions": [{"fen": "garbage"}]}})
    assert not bad["ok"] and "error" in bad
    ok = engine_db.handle({"command": "stats"})
    assert ok["ok"]


def test_unknown_command(engine_db):
    resp = engine_db.handle({"command": "frobnicate"})
    assert not resp["ok"]


def test_tcp_roundtrip(engine_db):
    srv, thread, port = server.serve_tcp(engine_db)
    try:
        out = server.request_over_tcp(
            "127.0.0.1",
            port,
            [
                {"command": "stats"},
                {
                    "command": "query",
                    "query": {"positions": [{"fen": START_FEN}], "fetchChildren": False},
                },
                {"command": "nope"},
                {"command": "exit"},
            ],
        )
    finally:
        srv.shutdown()
    assert out[0]["ok"] and out[0]["stats"]["games"] == 4
    assert out[1]["ok"]
    stats = out[1]["response"]["positions"][0]["stats"]["all"]["human"]
    assert {k: v["count"] for k, v in stats.items()} == {"W": 1, "B": 1, "D": 1}
    assert not out[2]["ok"]
