"""Property-based invariants for the rules kernel (SURVEY.md §5.2.3):
random legal games must preserve every round-trip the storage and
query layers rely on. No SparkSession needed — pure Python, fast."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from chess_pos_db_spark.chess import pgn
from chess_pos_db_spark.chess.board import (
    Position,
    START_FEN,
    pack_move,
    unpack_move,
)


def random_game(seed: int, max_plies: int = 60):
    """Deterministic random legal game: positions visited + sans."""
    rng = random.Random(seed)
    pos = Position.from_fen(START_FEN)
    path = [pos]
    sans = []
    for _ in range(max_plies):
        moves = pos.legal_moves()
        if not moves:
            break
        m = rng.choice(sorted(moves, key=lambda x: x.uci()))
        sans.append(pos.san(m))
        pos = pos.make_move(m)
        path.append(pos)
    return path, sans


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_random_game_invariants(seed):
    path, sans = random_game(seed, max_plies=40)
    for pos in path[:: max(1, len(path) // 8)]:
        fen = pos.fen()
        back = Position.from_fen(fen)
        # FEN round trip preserves state and key
        assert back.fen() == fen
        assert back.key() == pos.key()
        # compression round trip preserves board/side/castling/key;
        # ep round-trips iff CAPTURABLE — compress masks phantom ep
        # exactly like key() (X-FEN convention), so one logical
        # position has one pos_cmp
        dec = Position.decompress(pos.compress())
        assert dec.board == pos.board
        assert dec.side == pos.side
        assert dec.castling == pos.castling
        want_ep = pos.ep if (
            pos.ep is not None and pos._ep_capturable()
        ) else None
        assert dec.ep == want_ep  # ep RANK was decompressed wrong once
        assert dec.key() == pos.key()
        # exactly one king each
        flat = [p for p in pos.board if p]
        assert flat.count("K") == 1 and flat.count("k") == 1


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_san_and_pack_roundtrip(seed):
    path, sans = random_game(seed, max_plies=30)
    # replay from SAN must reproduce the identical position sequence
    pos = Position.from_fen(START_FEN)
    for i, san in enumerate(sans):
        m = pos.parse_san(san)
        u = unpack_move(pack_move(m), m.piece)
        assert (u.from_sq, u.to_sq, u.promo, u.flag) == (
            m.from_sq,
            m.to_sq,
            m.promo,
            m.flag,
        )
        pos = pos.make_move(m)
        assert pos.key() == path[i + 1].key()


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_pgn_format_parse_roundtrip(seed):
    _, sans = random_game(seed, max_plies=24)
    text = pgn.format_game(
        {"Event": "prop", "White": "X", "Black": "Y", "Date": "2020.??.??"},
        sans,
        "D",
    )
    games = list(pgn.parse_file(text))
    assert len(games) == 1
    assert games[0]["sans"] == sans
    assert games[0]["result"] == "D"
    assert games[0]["year"] == 2020 and games[0]["month"] is None


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_san_move_cached_equals_uncached(seed):
    """Replaying through the transition memo (cold then warm) must
    reproduce the exact uncached position sequence — the cache may
    never change semantics, only skip work."""
    from chess_pos_db_spark.chess.board import san_move_cached

    path, sans = random_game(seed, max_plies=30)
    cache: dict = {}
    for _pass in range(2):  # second pass exercises the hit path
        pos = Position.from_fen(START_FEN)
        for i, san in enumerate(sans):
            m, pos = san_move_cached(pos, san, cache)
            assert pos.key() == path[i + 1].key()


def test_san_move_cached_rejects_implausible_hit():
    """Zobrist-collision guard: a poisoned cache entry whose move does
    not fit the board (wrong mover / occupied destination / wrong side)
    must be ignored and re-resolved, not blindly replayed."""
    from chess_pos_db_spark.chess.board import (
        F_CAPTURE,
        Move,
        san_move_cached,
        sq,
    )

    pos = Position.from_fen(START_FEN)
    good = pos.parse_san("Nf3")

    # wrong mover: claims a knight sits on a1
    bad_mover = Move(sq(0, 0), sq(2, 2), "N")
    # right mover, but flagged capture onto an empty square
    bad_capture = Move(good.from_sq, good.to_sq, "N", flag=F_CAPTURE)
    # black piece while white is to move
    bad_side = Move(sq(6, 7), sq(5, 5), "n")

    for poison in (bad_mover, bad_capture, bad_side):
        cache = {(pos.key(), "Nf3"): poison}
        m, child = san_move_cached(pos, "Nf3", cache)
        assert (m.from_sq, m.to_sq, m.piece, m.flag) == (
            good.from_sq,
            good.to_sq,
            good.piece,
            good.flag,
        )
        # the stale entry is overwritten with the re-resolved move
        assert cache[(pos.key(), "Nf3")] == good
        assert child.key() == pos.make_move(good).key()


def test_sample_hash_partition_invariant(spark, sf_dir):
    """The hash sampler must select the same keys regardless of
    physical partitioning — the reproducibility contract that RNG-based
    df.sample() cannot give."""
    import chess_pos_db_spark as engine

    q = engine.get_queries()["sample_hash"]
    base = sorted(r.o_orderkey for r in q(spark, sf_dir).collect())
    from chess_pos_db_spark.tables import t
    from pyspark.sql import functions as F

    o7 = t(spark, sf_dir, "orders").repartition(7)
    h = (F.col("o_orderkey") % 1000003) * F.lit(2654435761) % 1000
    got = sorted(
        r.o_orderkey
        for r in o7.filter(h < 100).select("o_orderkey").collect()
    )
    assert got == base and len(base) > 0


def test_dedup_components_roots_are_members(spark, sf_dir):
    """Connected-components invariants: every cluster root labels
    itself (fixpoint actually reached), every doc appears exactly once,
    and labels never exceed the doc's own id (min-label semantics)."""
    import chess_pos_db_spark as engine

    rows = engine.get_queries()["dedup_components"](spark, sf_dir).collect()
    labels = {r.doc_id: r.cluster_id for r in rows}
    assert len(labels) == len(rows)
    assert all(c <= d for d, c in labels.items())
    assert all(labels[c] == c for c in set(labels.values()))


def test_key_accepts_noncanonical_castling_order():
    """from_fen stores the castling field verbatim, and XOR commutes:
    a legal FEN with reordered rights ("QKkq") must produce the SAME
    key as its canonical form, not a KeyError (regression: the
    precomputed castling-string table only held canonical subsets)."""
    canon = Position.from_fen("r3k2r/8/8/8/8/8/8/R3K2R w KQkq - 0 1")
    reordered = Position.from_fen("r3k2r/8/8/8/8/8/8/R3K2R w QKkq - 0 1")
    assert reordered.key() == canon.key()
    partial = Position.from_fen("r3k2r/8/8/8/8/8/8/R3K2R w qK - 0 1")
    partial_canon = Position.from_fen("r3k2r/8/8/8/8/8/8/R3K2R w Kq - 0 1")
    assert partial.key() == partial_canon.key()


def test_compress_roundtrip_preserves_ep():
    """Regression (two layers): decompress once rebuilt the ep target
    on the wrong rank (5/2 swapped for side-to-move); and compress once
    stored PHANTOM ep that key() masks, so one logical position had
    multiple pos_cmp encodings splitting its EPD count. Contract now:
    capturable ep round-trips on the correct rank; phantom ep is
    masked identically to key()."""
    pos = Position.from_fen(START_FEN)
    child = pos.make_move(pos.parse_san("e4"))
    rt = Position.decompress(child.compress())
    # after 1.e4 the ep right is PHANTOM (no black pawn attacks e3):
    # masked in compress exactly like in key()
    assert rt.ep is None
    assert rt.key() == child.key()
    assert rt.board == child.board

    # a CAPTURABLE ep must round-trip on the correct rank: after
    # 1.e4 a6 2.e5 d5 the e5 pawn can take d6 en passant
    p2 = child
    for san in ("a6", "e5", "d5"):
        p2 = p2.make_move(p2.parse_san(san))
    assert p2._ep_capturable()
    rt2 = Position.decompress(p2.compress())
    # compress drops the move counters by design — compare state + key
    assert rt2.ep == p2.ep  # d6, not d3
    assert rt2.fen().rsplit(" ", 2)[0] == p2.fen().rsplit(" ", 2)[0]
    assert rt2.key() == p2.key()


def test_pgn_tag_escaping_roundtrip():
    """Tag values containing quotes/backslashes survive
    format_game → parse_file (the lossless-export contract)."""
    tags = {"White": 'OKelly "Bobby"', "Site": "c:\\games\\x"}
    text = pgn.format_game(tags, ["e4", "e5"], "W")
    g = list(pgn.parse_file(text))[0]
    assert g["tags"]["White"] == tags["White"]
    assert g["tags"]["Site"] == tags["Site"]


def test_pgn_comment_cannot_inject_tags():
    """A bracketed quoted pair inside a movetext comment must not
    override real tags (tag extraction is scoped to tag-section
    lines)."""
    chunk = '[White "Carlsen"]\n\n1. e4 {[White "FAKE"] nice} e5 1-0\n'
    g = pgn.parse_game(chunk)
    assert g["tags"]["White"] == "Carlsen"
    assert g["sans"] == ["e4", "e5"]


def test_pgn_concatenated_files_with_bom():
    """cat a.pgn b.pgn where b starts with a BOM: sequential
    split_games must yield two games (matching the chunked scanner),
    not silently merge them."""
    cat = (
        '[Event "A"]\n\n1. e4 e5 1-0\n'
        "\ufeff" '[Event "B"]\n\n1. d4 d5 0-1\n'
    )
    games = list(pgn.parse_file(cat))
    assert [g["tags"]["Event"] for g in games] == ["A", "B"]
    assert games[1]["sans"] == ["d4", "d5"]
