"""ERAN — Extended Reversible Algebraic Notation (reference:
`src/chess/Eran.h/.cpp` †, SURVEY.md §2.8 F3).

A reversible move descriptor: everything needed to UNDO a move on the
position it produced — moving piece, from/to, captured piece, promo,
special flags, plus the prior castling rights, en-passant square and
halfmove clock (which a plain move cannot recover). This is what makes
retraction queries ("which positions lead into this one?") resolvable
to concrete parent positions.

Text form (one token, parse-friendly):

    <piece><from>[x<captured>]<to>[=<promo>][$<flags>]/<castling>/<ep>/<halfmove>

    e.g.  Ng1f3/KQkq/-/0      (quiet knight move, all rights, no ep)
          Pe5xpd6$e/KQkq/d6/0 (en-passant capture)
          Ke1g1$k/KQkq/-/4    (king-side castle)

The packed reverse move stored in the entries fact (board.pack_move)
is the 24-bit prefix of this descriptor (move + captured); the
castling/ep/halfmove tail exists only where full reversibility is
needed (retraction resolution, BCGN-style backward iteration).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .board import (
    BLACK,
    F_CAPTURE,
    F_CASTLE_K,
    F_CASTLE_Q,
    F_DOUBLE_PUSH,
    F_EP,
    Move,
    Position,
    WHITE,
    captured_piece,
    parse_sq,
    sq,
    sq_name,
)

_FLAG_CODE = {F_DOUBLE_PUSH: "d", F_EP: "e", F_CASTLE_K: "k", F_CASTLE_Q: "q"}
_FLAG_FROM_CODE = {v: k for k, v in _FLAG_CODE.items()}


@dataclass(frozen=True)
class Eran:
    piece: str
    from_sq: int
    to_sq: int
    captured: str  # '' if quiet
    promo: str  # '' or nbrq
    flag: int
    prior_castling: str
    prior_ep: Optional[int]
    prior_halfmove: int

    # -- text form ------------------------------------------------------------

    def text(self) -> str:
        s = self.piece + sq_name(self.from_sq)
        if self.captured:
            s += "x" + self.captured
        s += sq_name(self.to_sq)
        if self.promo:
            s += "=" + self.promo
        if self.flag in _FLAG_CODE:
            s += "$" + _FLAG_CODE[self.flag]
        return "/".join(
            [
                s,
                self.prior_castling or "-",
                sq_name(self.prior_ep) if self.prior_ep is not None else "-",
                str(self.prior_halfmove),
            ]
        )

    @classmethod
    def parse(cls, text: str) -> "Eran":
        move_part, castling, ep, halfmove = text.split("/")
        piece = move_part[0]
        rest = move_part[1:]
        from_sq = parse_sq(rest[:2])
        rest = rest[2:]
        captured = ""
        if rest.startswith("x"):
            captured = rest[1]
            rest = rest[2:]
        to_sq = parse_sq(rest[:2])
        rest = rest[2:]
        promo = ""
        flag = 0
        if rest.startswith("="):
            promo = rest[1]
            rest = rest[2:]
        if rest.startswith("$"):
            flag = _FLAG_FROM_CODE[rest[1]]
        elif captured:
            flag = F_CAPTURE  # plain capture: implied by the x-piece
        return cls(
            piece=piece,
            from_sq=from_sq,
            to_sq=to_sq,
            captured=captured,
            promo=promo,
            flag=flag,
            prior_castling=castling if castling != "-" else "",
            prior_ep=parse_sq(ep) if ep != "-" else None,
            prior_halfmove=int(halfmove),
        )


def describe(pos: Position, m: Move) -> Eran:
    """Reversible descriptor for applying `m` in `pos`."""
    return Eran(
        piece=m.piece,
        from_sq=m.from_sq,
        to_sq=m.to_sq,
        captured=captured_piece(pos, m),
        promo=m.promo,
        flag=m.flag,
        prior_castling=pos.castling,
        prior_ep=pos.ep,
        prior_halfmove=pos.halfmove,
    )


def unmove(pos: Position, e: Eran) -> Position:
    """Position AFTER the described move → position BEFORE it (exact
    inverse of Position.make_move for that move)."""
    board = pos.board[:]
    mover_color = BLACK if pos.side == WHITE else WHITE  # side that moved

    # undo the piece movement (promotion reverts to a pawn)
    board[e.from_sq] = e.piece
    board[e.to_sq] = ""
    if e.captured:
        if e.flag == F_EP:
            cap_sq = e.to_sq + (-16 if mover_color == WHITE else 16)
            board[cap_sq] = e.captured
        else:
            board[e.to_sq] = e.captured
    if e.flag == F_CASTLE_K:
        rank = 0 if mover_color == WHITE else 7
        board[sq(7, rank)] = board[sq(5, rank)]
        board[sq(5, rank)] = ""
    elif e.flag == F_CASTLE_Q:
        rank = 0 if mover_color == WHITE else 7
        board[sq(0, rank)] = board[sq(3, rank)]
        board[sq(3, rank)] = ""

    return Position(
        board=board,
        side=mover_color,
        castling=e.prior_castling,
        ep=e.prior_ep,
        halfmove=e.prior_halfmove,
        fullmove=pos.fullmove - (1 if mover_color == BLACK else 0),
    )
