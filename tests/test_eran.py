"""ERAN invariants: describe→unmove must exactly invert make_move along
random games (including castles, en passant, promotions), and the text
form must round-trip."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from chess_pos_db_spark.chess import eran
from chess_pos_db_spark.chess.board import Position, START_FEN
from tests.test_properties import random_game


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_unmove_inverts_make_move(seed):
    import random

    rng = random.Random(seed)
    pos = Position.from_fen(START_FEN)
    for _ in range(40):
        moves = pos.legal_moves()
        if not moves:
            break
        m = rng.choice(sorted(moves, key=lambda x: x.uci()))
        desc = eran.describe(pos, m)
        nxt = pos.make_move(m)
        back = eran.unmove(nxt, desc)
        assert back.board == pos.board
        assert back.side == pos.side
        assert back.castling == pos.castling
        assert back.ep == pos.ep
        assert back.halfmove == pos.halfmove
        assert back.fullmove == pos.fullmove
        assert back.key() == pos.key()
        pos = nxt


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_eran_text_roundtrip(seed):
    import random

    rng = random.Random(seed)
    pos = Position.from_fen(START_FEN)
    for _ in range(30):
        moves = pos.legal_moves()
        if not moves:
            break
        m = rng.choice(sorted(moves, key=lambda x: x.uci()))
        desc = eran.describe(pos, m)
        assert eran.Eran.parse(desc.text()) == desc
        pos = pos.make_move(m)


def test_special_moves_explicit():
    # en passant
    p = Position.from_fen(START_FEN)
    for san in ["e4", "a6", "e5", "d5"]:
        p = p.make_move(p.parse_san(san))
    m = p.parse_san("exd6")
    desc = eran.describe(p, m)
    assert desc.captured == "p" and "$e" in desc.text()
    assert eran.unmove(p.make_move(m), desc).fen() == p.fen()
    # castling
    p2 = Position.from_fen("r3k2r/8/8/8/8/8/8/R3K2R w KQkq - 0 1")
    m2 = p2.parse_san("O-O")
    desc2 = eran.describe(p2, m2)
    assert eran.unmove(p2.make_move(m2), desc2).fen() == p2.fen()
    # promotion with capture
    p3 = Position.from_fen("rn2k3/1P6/8/8/8/8/8/4K3 w - - 0 1")
    m3 = p3.parse_san("bxa8=Q")
    desc3 = eran.describe(p3, m3)
    assert desc3.captured == "r" and desc3.promo == "q"
    assert eran.unmove(p3.make_move(m3), desc3).fen() == p3.fen()
