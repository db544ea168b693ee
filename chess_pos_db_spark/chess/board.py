"""Chess rules kernel: board state, legal move generation, FEN, SAN,
position keys, reverse-move packing, position compression.

Functional parity targets in the reference (all †, see SURVEY.md
provenance): `src/chess/Position.h/.cpp` (board state, FEN,
CompressedPosition), `src/chess/MoveGenerator.h` (legal movegen),
`src/chess/San.h/.cpp` (SAN parse/format), `src/chess/Zobrist.h`
(position hashing), format headers' `PackedReverseMove` (~27-bit
packed move).

Pure Python by design: this module runs inside Arrow-batched
`mapInPandas` workers (the import explode and probe building), never
row-at-a-time inside a SQL expression. Representation is 0x88 mailbox
(128-slot list): off-board detection is `sq & 0x88`, attack deltas are
plain integer offsets.

Everything here is deterministic: zobrist tables derive from a fixed
splitmix64 seed, so pos_key values are stable across sessions,
executors, and reruns (a hard requirement — keys are join/storage
keys).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Optional

# --- squares -----------------------------------------------------------------

FILES = "abcdefgh"
RANKS = "12345678"


def sq(file: int, rank: int) -> int:
    return rank * 16 + file


def sq_file(s: int) -> int:
    return s & 7


def sq_rank(s: int) -> int:
    return s >> 4


def sq_name(s: int) -> str:
    return FILES[sq_file(s)] + RANKS[sq_rank(s)]


def parse_sq(name: str) -> int:
    return sq(FILES.index(name[0]), RANKS.index(name[1]))


def on_board(s: int) -> bool:
    return not (s & 0x88)


# 0..63 index for zobrist/compression (rank-major, a1=0)
def sq64(s: int) -> int:
    return sq_rank(s) * 8 + sq_file(s)


# --- pieces ------------------------------------------------------------------

WHITE, BLACK = "w", "b"
PIECE_CHARS = "PNBRQKpnbrqk"


def piece_color(p: str) -> str:
    return WHITE if p.isupper() else BLACK


KNIGHT_DELTAS = (-33, -31, -18, -14, 14, 18, 31, 33)
KING_DELTAS = (-17, -16, -15, -1, 1, 15, 16, 17)
BISHOP_DELTAS = (-17, -15, 15, 17)
ROOK_DELTAS = (-16, -1, 1, 16)


# --- moves -------------------------------------------------------------------

# flags
F_QUIET = 0
F_CAPTURE = 1
F_DOUBLE_PUSH = 2
F_EP = 3
F_CASTLE_K = 4
F_CASTLE_Q = 5


@dataclass(frozen=True)
class Move:
    from_sq: int
    to_sq: int
    piece: str
    promo: str = ""  # 'q','r','b','n' (lowercase) or ''
    flag: int = F_QUIET

    def uci(self) -> str:
        return sq_name(self.from_sq) + sq_name(self.to_sq) + self.promo


# Packed reverse-move layout (reference: PackedReverseMove, ~27 bits —
# enough to classify continuations AND unmake the move for retractions):
#   bits 0-6   from square (0x88 index fits in 7 bits)
#   bits 7-13  to square
#   bits 14-16 promo code (0 none, 1 n, 2 b, 3 r, 4 q)
#   bits 17-19 flag
#   bits 20-23 captured piece (index into PIECE_CHARS + 1; 0 = none)
_PROMO_CODE = {"": 0, "n": 1, "b": 2, "r": 3, "q": 4}
_PROMO_FROM_CODE = {v: k for k, v in _PROMO_CODE.items()}

NO_REVERSE_MOVE = -1  # first position of a game has no incoming move


def pack_move(m: Move, captured: str = "") -> int:
    cap = PIECE_CHARS.index(captured) + 1 if captured else 0
    return (
        m.from_sq
        | (m.to_sq << 7)
        | (_PROMO_CODE[m.promo] << 14)
        | (m.flag << 17)
        | (cap << 20)
    )


def unpack_move(packed: int, piece: str = "?") -> Move:
    return Move(
        from_sq=packed & 0x7F,
        to_sq=(packed >> 7) & 0x7F,
        piece=piece,
        promo=_PROMO_FROM_CODE[(packed >> 14) & 0x7],
        flag=(packed >> 17) & 0x7,
    )


def unpack_captured(packed: int) -> str:
    cap = (packed >> 20) & 0xF
    return PIECE_CHARS[cap - 1] if cap else ""


def captured_piece(pos: "Position", m: Move) -> str:
    """The piece a move captures in `pos` ('' if quiet)."""
    if m.flag == F_EP:
        return "p" if pos.side == WHITE else "P"
    return pos.board[m.to_sq]


# --- zobrist -----------------------------------------------------------------


_SAN_CORE_CACHE: dict = {}


def _parse_san_core(core: str):
    """SAN core (castling excluded) → (pt, dest, dis_file, dis_rank,
    capture, promo), or None for unparseable cores. Pure function of
    the string — memoized module-wide, shared by every position."""
    spec = _SAN_CORE_CACHE.get(core, False)
    if spec is not False:
        return spec
    body = core
    promo = ""
    if "=" in body:
        parts = body.split("=")
        # only q/r/b/n are legal promotion pieces: 'e8=K' or 'e8=P'
        # must be UNPARSEABLE, not a position with two kings / an
        # eighth-rank pawn (pack_move would also KeyError on them).
        # exactly ONE char — substring membership would let multi-char
        # suffixes that happen to be substrings through (e8=QR, e8=rb)
        if len(parts) != 2 or len(parts[1]) != 1 or parts[1] not in "QRBNqrbn":
            _SAN_CORE_CACHE[core] = None
            return None
        body, promo = parts
        promo = promo.lower()
    elif body and body[-1] in "QRBNqrbn" and body[0] in FILES:
        promo = body[-1].lower()
        body = body[:-1]
    pt = "P"
    if body and body[0] in "NBRQK":
        pt = body[0]
        body = body[1:]
    capture = "x" in body
    body = body.replace("x", "")
    if len(body) < 2 or body[-1] not in RANKS or body[-2] not in FILES:
        spec = None
    else:
        dest = parse_sq(body[-2:])
        dis = body[:-2]
        dis_file = next((FILES.index(c) for c in dis if c in FILES), None)
        dis_rank = next((RANKS.index(c) for c in dis if c in RANKS), None)
        spec = (pt, dest, dis_file, dis_rank, capture, promo)
    if len(_SAN_CORE_CACHE) >= 65536:
        _SAN_CORE_CACHE.clear()
    _SAN_CORE_CACHE[core] = spec
    return spec


def _splitmix64(state: int) -> tuple[int, int]:
    state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return state, z ^ (z >> 31)


def _zobrist_tables():
    state = 0x5EED_C0DE_2024_0001
    piece_sq = {}
    for p in PIECE_CHARS:
        for s in range(64):
            state, v = _splitmix64(state)
            piece_sq[(p, s)] = v
    castling = {}
    for c in "KQkq":
        state, v = _splitmix64(state)
        castling[c] = v
    ep_file = []
    for _ in range(8):
        state, v = _splitmix64(state)
        ep_file.append(v)
    state, black_to_move = _splitmix64(state)
    return piece_sq, castling, ep_file, black_to_move


_Z_PIECE, _Z_CASTLE, _Z_EP, _Z_BLACK = _zobrist_tables()

# Precomputed hot-path lookup tables (replay runs make_move + key() per
# ply millions of times; list indexing beats a function call / a
# tuple-keyed dict hash measurably):
#   _SQ64[s]        — 0x88 square → 0..63 (0 on off-board, never read)
#   _Z_PS[p][s]     — zobrist term for piece p on 0x88 square s
#   _Z_CASTLE_STR[c]— XOR of _Z_CASTLE over a castling-rights string
_SQ64 = tuple((s >> 4) * 8 + (s & 7) if not (s & 0x88) else 0 for s in range(128))
_Z_PS = {
    p: tuple(
        _Z_PIECE[(p, _SQ64[s])] if not (s & 0x88) else 0 for s in range(128)
    )
    for p in PIECE_CHARS
}
_Z_CASTLE_STR = {
    c: (
        (_Z_CASTLE["K"] if "K" in c else 0)
        ^ (_Z_CASTLE["Q"] if "Q" in c else 0)
        ^ (_Z_CASTLE["k"] if "k" in c else 0)
        ^ (_Z_CASTLE["q"] if "q" in c else 0)
    )
    for i in range(16)
    for c in ["".join(r for j, r in enumerate("KQkq") if i & (1 << j))]
}


# --- position ----------------------------------------------------------------

START_FEN = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1"


@dataclass
class Position:
    board: list = field(default_factory=lambda: [""] * 128)
    side: str = WHITE
    castling: str = "KQkq"
    ep: Optional[int] = None  # en-passant target square (0x88)
    halfmove: int = 0
    fullmove: int = 1
    # per-instance king-square / in-check memos, created lazily (a
    # dict-per-Position factory measurably slows make_move);
    # compare=False keeps Position equality semantic
    _ksq: Optional[dict] = field(default=None, repr=False, compare=False)
    _chk: Optional[dict] = field(default=None, repr=False, compare=False)

    # -- FEN ------------------------------------------------------------------

    @classmethod
    def from_fen(cls, fen: str) -> "Position":
        parts = fen.split()
        if len(parts) < 4:
            raise ValueError(f"bad FEN: {fen!r}")
        placement, side, castling, ep = parts[0], parts[1], parts[2], parts[3]
        halfmove = int(parts[4]) if len(parts) > 4 else 0
        fullmove = int(parts[5]) if len(parts) > 5 else 1
        board = [""] * 128
        rank = 7
        file = 0
        for ch in placement:
            if ch == "/":
                if file != 8:
                    raise ValueError(
                        f"bad FEN row width {file} (expected 8): {fen!r}"
                    )
                rank -= 1
                if rank < 0:
                    raise ValueError(f"bad FEN: too many rows: {fen!r}")
                file = 0
            elif ch.isdigit():
                file += int(ch)
            else:
                if ch not in PIECE_CHARS:
                    raise ValueError(f"bad FEN piece {ch!r}")
                if file > 7:
                    # a ninth piece would land on an off-board 0x88
                    # slot — invisible to key()/movegen/fen(), so a
                    # probe built from this FEN would silently query a
                    # DIFFERENT position than the user supplied
                    raise ValueError(
                        f"bad FEN row wider than 8 files: {fen!r}"
                    )
                board[sq(file, rank)] = ch
                file += 1
        if file != 8 or rank != 0:
            raise ValueError(f"bad FEN placement shape: {fen!r}")
        # side / castling validated HERE, loudly: an unknown side char
        # would otherwise silently play as Black (every `us == WHITE`
        # comparison fails), and a malformed castling field would
        # surface as a raw KeyError deep in key() — or worse, duplicate
        # chars XOR-cancel into the key of a position WITHOUT that
        # right (round-13 hardening sweep)
        if side not in (WHITE, BLACK):
            raise ValueError(f"bad FEN side {side!r}: {fen!r}")
        if castling != "-" and (
            any(c not in "KQkq" for c in castling)
            or len(set(castling)) != len(castling)
        ):
            raise ValueError(f"bad FEN castling field {castling!r}: {fen!r}")
        return cls(
            board=board,
            side=side,
            castling=castling if castling != "-" else "",
            ep=parse_sq(ep) if ep != "-" else None,
            halfmove=halfmove,
            fullmove=fullmove,
        )

    def fen(self) -> str:
        rows = []
        for rank in range(7, -1, -1):
            row = ""
            empty = 0
            for file in range(8):
                p = self.board[sq(file, rank)]
                if p:
                    if empty:
                        row += str(empty)
                        empty = 0
                    row += p
                else:
                    empty += 1
            if empty:
                row += str(empty)
            rows.append(row)
        return " ".join(
            [
                "/".join(rows),
                self.side,
                self.castling or "-",
                sq_name(self.ep) if self.ep is not None else "-",
                str(self.halfmove),
                str(self.fullmove),
            ]
        )

    # -- hashing (the pos_key of the entries fact table) ----------------------

    def _piece_hash(self) -> int:
        """XOR of piece-square zobrist terms, cached per instance and
        maintained incrementally by make_move (the import hot path keys
        every position; a full-board rescan per ply was ~45% of replay
        time). The cache lives outside the dataclass fields so eq/repr
        are unaffected."""
        ph = getattr(self, "_ph", None)
        if ph is None:
            ph = 0
            for s in range(128):
                if not (s & 0x88) and self.board[s]:
                    ph ^= _Z_PS[self.board[s]][s]
            self._ph = ph
        return ph

    def key(self) -> int:
        """64-bit zobrist key as a SIGNED int64 (Spark LongType)."""
        cz = _Z_CASTLE_STR.get(self.castling)
        if cz is None:
            # from_fen stores the castling field verbatim, so a legal
            # FEN with non-canonical rights order (e.g. "QKkq") misses
            # the precomputed table; XOR commutes, so fold per char and
            # memoize the variant (KeyError for genuinely bad chars,
            # matching the pre-table behavior).
            cz = 0
            for c in self.castling:
                cz ^= _Z_CASTLE[c]
            _Z_CASTLE_STR[self.castling] = cz
        h = self._piece_hash() ^ cz
        if self.ep is not None and self._ep_capturable():
            h ^= _Z_EP[self.ep & 7]
        if self.side == BLACK:
            h ^= _Z_BLACK
        return h - 0x10000000000000000 if h >= 0x8000000000000000 else h

    def _ep_capturable(self) -> bool:
        """EP square only hashes if a pawn can actually capture — makes
        transpositions with phantom ep rights collapse to one key."""
        if self.ep is None:
            return False
        pawn = "P" if self.side == WHITE else "p"
        delta = -16 if self.side == WHITE else 16
        for d in (-1, 1):
            s = self.ep + delta + d
            if on_board(s) and self.board[s] == pawn:
                return True
        return False

    # -- compression (reference: CompressedPosition, ~24 bytes) ---------------

    def compress(self) -> bytes:
        """8-byte occupancy bitboard + nibble-packed piece codes +
        1 byte side/castling + 1 byte ep file (0xFF none)."""
        occ = 0
        codes = []
        for s64 in range(64):
            s = (s64 >> 3) * 16 + (s64 & 7)
            p = self.board[s]
            if p:
                occ |= 1 << s64
                codes.append(PIECE_CHARS.index(p))
        packed = bytearray(occ.to_bytes(8, "little"))
        for i in range(0, len(codes), 2):
            lo = codes[i]
            hi = codes[i + 1] if i + 1 < len(codes) else 0
            packed.append(lo | (hi << 4))
        flags = (0 if self.side == WHITE else 1) << 4
        for i, c in enumerate("KQkq"):
            if c in self.castling:
                flags |= 1 << i
        packed.append(flags)
        # mask phantom ep exactly like key(): two encodings for one
        # logical position would split its count across duplicate
        # pos_cmp groups in the EPD dump while the store's pos_key
        # already collapses them
        packed.append(
            sq_file(self.ep)
            if self.ep is not None and self._ep_capturable()
            else 0xFF
        )
        return bytes(packed)

    @classmethod
    def decompress(cls, data: bytes) -> "Position":
        occ = int.from_bytes(data[:8], "little")
        n = bin(occ).count("1")
        nibbles = []
        body = data[8 : 8 + (n + 1) // 2]
        for b in body:
            nibbles.append(b & 0xF)
            nibbles.append(b >> 4)
        board = [""] * 128
        i = 0
        for s64 in range(64):
            if occ & (1 << s64):
                s = (s64 >> 3) * 16 + (s64 & 7)
                board[s] = PIECE_CHARS[nibbles[i]]
                i += 1
        flags = data[8 + (n + 1) // 2]
        side = BLACK if (flags >> 4) & 1 else WHITE
        castling = "".join(c for i, c in enumerate("KQkq") if flags & (1 << i))
        ep_file = data[8 + (n + 1) // 2 + 1]
        ep = None
        if ep_file != 0xFF:
            # ep TARGET rank: white just double-pushed (black to move)
            # → rank index 2 (e3); black just pushed (white to move)
            # → rank index 5 (e6)
            ep = sq(ep_file, 2 if side == BLACK else 5)
        return cls(board=board, side=side, castling=castling, ep=ep)

    # -- attacks --------------------------------------------------------------

    def king_sq(self, color: str) -> int:
        memo = self._ksq
        if memo is None:
            memo = self._ksq = {}
        cached = memo.get(color)
        if cached is not None:
            return cached
        k = "K" if color == WHITE else "k"
        for s in range(128):
            if not (s & 0x88) and self.board[s] == k:
                memo[color] = s
                return s
        raise ValueError("no king on board")

    def attacked(self, target: int, by: str) -> bool:
        # Replay hot path: 0x88 bounds checks inlined (s & 0x88 == 0),
        # per-color piece letters bound to locals once.
        b = self.board
        if by == WHITE:
            pawn, knight, king, bq, rq, pdelta = "P", "N", "K", "BQ", "RQ", 16
        else:
            pawn, knight, king, bq, rq, pdelta = "p", "n", "k", "bq", "rq", -16
        # pawns
        for d in (-1, 1):
            s = target - pdelta + d
            if not (s & 0x88) and b[s] == pawn:
                return True
        # knights
        for d in KNIGHT_DELTAS:
            s = target + d
            if not (s & 0x88) and b[s] == knight:
                return True
        # king
        for d in KING_DELTAS:
            s = target + d
            if not (s & 0x88) and b[s] == king:
                return True
        # sliders
        for deltas, pieces in ((BISHOP_DELTAS, bq), (ROOK_DELTAS, rq)):
            for d in deltas:
                s = target + d
                while not (s & 0x88):
                    p = b[s]
                    if p:
                        if p in pieces:
                            return True
                        break
                    s += d
        return False

    def in_check(self, color: Optional[str] = None) -> bool:
        c = color or self.side
        memo = self._chk
        if memo is None:
            memo = self._chk = {}
        cached = memo.get(c)
        if cached is not None:
            return cached
        other = BLACK if c == WHITE else WHITE
        result = self.attacked(self.king_sq(c), other)
        memo[c] = result
        return result

    # -- move generation ------------------------------------------------------

    def _pseudo_moves(self) -> Iterator[Move]:
        b = self.board
        us = self.side
        own = (lambda p: p.isupper()) if us == WHITE else (lambda p: p.islower())
        enemy = (lambda p: p.islower()) if us == WHITE else (lambda p: p.isupper())
        for s in range(128):
            if s & 0x88 or not b[s] or not own(b[s]):
                continue
            p = b[s]
            pt = p.upper()
            if pt == "P":
                fwd = 16 if us == WHITE else -16
                start_rank = 1 if us == WHITE else 6
                promo_rank = 7 if us == WHITE else 0
                one = s + fwd
                if on_board(one) and not b[one]:
                    if sq_rank(one) == promo_rank:
                        for pr in "qrbn":
                            yield Move(s, one, p, pr)
                    else:
                        yield Move(s, one, p)
                    two = one + fwd
                    if sq_rank(s) == start_rank and on_board(two) and not b[two]:
                        yield Move(s, two, p, flag=F_DOUBLE_PUSH)
                for d in (-1, 1):
                    cap = s + fwd + d
                    if not on_board(cap):
                        continue
                    if b[cap] and enemy(b[cap]):
                        if sq_rank(cap) == promo_rank:
                            for pr in "qrbn":
                                yield Move(s, cap, p, pr, F_CAPTURE)
                        else:
                            yield Move(s, cap, p, flag=F_CAPTURE)
                    elif self.ep is not None and cap == self.ep:
                        yield Move(s, cap, p, flag=F_EP)
            elif pt == "N":
                for d in KNIGHT_DELTAS:
                    to = s + d
                    if on_board(to) and (not b[to] or enemy(b[to])):
                        yield Move(s, to, p, flag=F_CAPTURE if b[to] else F_QUIET)
            elif pt == "K":
                for d in KING_DELTAS:
                    to = s + d
                    if on_board(to) and (not b[to] or enemy(b[to])):
                        yield Move(s, to, p, flag=F_CAPTURE if b[to] else F_QUIET)
                yield from self._castle_moves()
            else:
                deltas = (
                    BISHOP_DELTAS
                    if pt == "B"
                    else ROOK_DELTAS
                    if pt == "R"
                    else BISHOP_DELTAS + ROOK_DELTAS
                )
                for d in deltas:
                    to = s + d
                    while on_board(to):
                        if not b[to]:
                            yield Move(s, to, p)
                        else:
                            if enemy(b[to]):
                                yield Move(s, to, p, flag=F_CAPTURE)
                            break
                        to += d

    def _castle_moves(self) -> Iterator[Move]:
        b = self.board
        us = self.side
        other = BLACK if us == WHITE else WHITE
        rank = 0 if us == WHITE else 7
        king = "K" if us == WHITE else "k"
        ks = sq(4, rank)
        if b[ks] != king or self.attacked(ks, other):
            return
        krights = "K" if us == WHITE else "k"
        qrights = "Q" if us == WHITE else "q"
        rook = "R" if us == WHITE else "r"
        if krights in self.castling and b[sq(7, rank)] == rook:
            if not b[sq(5, rank)] and not b[sq(6, rank)]:
                if not self.attacked(sq(5, rank), other) and not self.attacked(
                    sq(6, rank), other
                ):
                    yield Move(ks, sq(6, rank), king, flag=F_CASTLE_K)
        if qrights in self.castling and b[sq(0, rank)] == rook:
            if not b[sq(1, rank)] and not b[sq(2, rank)] and not b[sq(3, rank)]:
                if not self.attacked(sq(3, rank), other) and not self.attacked(
                    sq(2, rank), other
                ):
                    yield Move(ks, sq(2, rank), king, flag=F_CASTLE_Q)

    def legal_moves(self) -> list[Move]:
        return [m for m in self._pseudo_moves() if self._king_safe(m)]

    def _king_safe(self, m: Move) -> bool:
        """King-safety filter WITHOUT building the child position (the
        replay hot path — saves a board copy + zobrist update per
        candidate). Full make/check only for the hard cases: king moves
        (incl. castling), en passant, or when already in check.
        Otherwise a non-king move is legal unless the mover is the
        single blocker on a slider ray to its own king AND leaves that
        ray — the standard pin test. Perft (incl. kiwipete) and the SAN
        round-trip suite pin equivalence with the make-move check."""
        us = self.side
        if m.piece in "Kk" or m.flag == F_EP or self.in_check(us):
            return not self.make_move(m).in_check(us)
        b = self.board
        k = self.king_sq(us)
        for deltas, sliders in (
            (BISHOP_DELTAS, "bq" if us == WHITE else "BQ"),
            (ROOK_DELTAS, "rq" if us == WHITE else "RQ"),
        ):
            for d in deltas:
                s = k + d
                while on_board(s) and not b[s]:
                    s += d
                if not on_board(s) or s != m.from_sq:
                    continue
                # mover is the first piece from the king along d; it is
                # pinned iff the next piece beyond it is an enemy slider
                # matching the ray type
                s2 = s + d
                while on_board(s2) and not b[s2]:
                    s2 += d
                if not on_board(s2) or b[s2] not in sliders:
                    return True
                # pinned: legal iff the destination stays on the open
                # ray between king (exclusive) and slider (inclusive)
                t = k + d
                while t != s2:
                    if t == m.to_sq:
                        return True
                    t += d
                return m.to_sq == s2
        return True

    # -- make move ------------------------------------------------------------

    def make_move(self, m: Move) -> "Position":
        b = self.board[:]
        us = self.side
        them = BLACK if us == WHITE else WHITE
        p = b[m.from_sq]
        b[m.from_sq] = ""
        capture = bool(b[m.to_sq]) or m.flag == F_EP
        if m.flag == F_EP:
            b[m.to_sq + (-16 if us == WHITE else 16)] = ""
        if m.promo:
            b[m.to_sq] = m.promo.upper() if us == WHITE else m.promo
        else:
            b[m.to_sq] = p
        if m.flag == F_CASTLE_K:
            rank = 0 if us == WHITE else 7
            b[sq(5, rank)] = b[sq(7, rank)]
            b[sq(7, rank)] = ""
        elif m.flag == F_CASTLE_Q:
            rank = 0 if us == WHITE else 7
            b[sq(3, rank)] = b[sq(0, rank)]
            b[sq(0, rank)] = ""
        castling = self.castling
        if p in "Kk":
            castling = castling.replace("K" if us == WHITE else "k", "")
            castling = castling.replace("Q" if us == WHITE else "q", "")
        if castling:
            # corner squares a1/h1/a8/h8 in 0x88 coords
            for s_rook, right in ((0, "Q"), (7, "K"), (112, "q"), (119, "k")):
                if m.from_sq == s_rook or m.to_sq == s_rook:
                    castling = castling.replace(right, "")
        ep = None
        if m.flag == F_DOUBLE_PUSH:
            ep = m.from_sq + (16 if us == WHITE else -16)
        child = Position(
            board=b,
            side=them,
            castling=castling,
            ep=ep,
            halfmove=0 if (p in "Pp" or capture) else self.halfmove + 1,
            fullmove=self.fullmove + (1 if us == BLACK else 0),
        )
        # Incremental zobrist piece-hash: XOR out/in only the squares
        # this move touched (self.board is the untouched parent board).
        ph = self._piece_hash()
        ph ^= _Z_PS[p][m.from_sq]
        if self.board[m.to_sq]:
            ph ^= _Z_PS[self.board[m.to_sq]][m.to_sq]
        if m.flag == F_EP:
            cap_sq = m.to_sq + (-16 if us == WHITE else 16)
            ph ^= _Z_PS["p" if us == WHITE else "P"][cap_sq]
        placed = (m.promo.upper() if us == WHITE else m.promo) if m.promo else p
        ph ^= _Z_PS[placed][m.to_sq]
        if m.flag in (F_CASTLE_K, F_CASTLE_Q):
            rank = 0 if us == WHITE else 7
            src, dst = (
                (sq(7, rank), sq(5, rank))
                if m.flag == F_CASTLE_K
                else (sq(0, rank), sq(3, rank))
            )
            rook = self.board[src]
            ph ^= _Z_PS[rook][src] ^ _Z_PS[rook][dst]
        child._ph = ph
        # Propagate king squares: the mover's king is at m.to_sq iff the
        # king moved (castle targets are king destinations too); the
        # opponent's king is untouched. Only warm entries the parent
        # already knows are carried — a cold parent memo stays cold.
        pksq = self._ksq
        if pksq:
            cksq = {}
            for color, s in pksq.items():
                if color == us and p in "Kk":
                    cksq[color] = m.to_sq
                else:
                    cksq[color] = s
            child._ksq = cksq
        elif p in "Kk":
            child._ksq = {us: m.to_sq}
        return child

    # -- SAN ------------------------------------------------------------------

    def san(self, m: Move) -> str:
        """Standard algebraic notation for a legal move of this position."""
        if m.flag == F_CASTLE_K:
            s = "O-O"
        elif m.flag == F_CASTLE_Q:
            s = "O-O-O"
        else:
            pt = m.piece.upper()
            capture = bool(self.board[m.to_sq]) or m.flag == F_EP
            if pt == "P":
                s = (FILES[sq_file(m.from_sq)] + "x" if capture else "") + sq_name(
                    m.to_sq
                )
                if m.promo:
                    s += "=" + m.promo.upper()
            else:
                # disambiguation among same-type pieces reaching to_sq
                others = [
                    x
                    for x in self.legal_moves()
                    if x.piece == m.piece
                    and x.to_sq == m.to_sq
                    and x.from_sq != m.from_sq
                ]
                dis = ""
                if others:
                    same_file = any(
                        sq_file(x.from_sq) == sq_file(m.from_sq) for x in others
                    )
                    same_rank = any(
                        sq_rank(x.from_sq) == sq_rank(m.from_sq) for x in others
                    )
                    if not same_file:
                        dis = FILES[sq_file(m.from_sq)]
                    elif not same_rank:
                        dis = RANKS[sq_rank(m.from_sq)]
                    else:
                        dis = sq_name(m.from_sq)
                s = pt + dis + ("x" if capture else "") + sq_name(m.to_sq)
        nxt = self.make_move(m)
        if nxt.in_check():
            s += "#" if not nxt.legal_moves() else "+"
        return s

    def parse_san(self, san: str) -> Move:
        """SAN string → legal move (raises ValueError if no/ambiguous
        match). Tolerates check/mate/annotation suffixes."""
        return self.parse_san_child(san)[0]

    def parse_san_child(self, san: str) -> tuple[Move, "Position"]:
        """SAN string → (legal move, child position after it).

        Import hot path: SAN is matched against PSEUDO-legal moves
        first and only the matching candidates pay the make-move
        legality check — ~1 king-safety test per ply instead of one per
        pseudo-legal move (≈10× on replay throughput). SAN's minimal-
        disambiguation rule is relative to legal moves, so the
        legality filter runs before the ambiguity decision. The child
        built for that legality check IS the next replay state, so it
        is returned rather than rebuilt — one make_move per ply instead
        of two (the replay loop's other board construction)."""
        core = san.rstrip("+#!?").replace("0", "O")
        # NOTE: the make-move child check is optimal here (measured):
        # with ~1 candidate per SAN it costs exactly one attack scan,
        # which also subsumes the in-check test _king_safe would need.
        candidates = []
        for m in self._san_candidates(core):
            child = self.make_move(m)
            if not child.in_check(self.side):
                candidates.append((m, child))
        if len(candidates) == 1:
            return candidates[0]
        if not candidates:
            raise ValueError(f"illegal SAN {san!r} in {self.fen()!r}")
        raise ValueError(f"ambiguous SAN {san!r} in {self.fen()!r}")

    def _san_candidates(self, core: str) -> list[Move]:
        """Pseudo-legal candidate moves for a SAN core, computed from the
        destination square backwards — no full move generation. The
        string-parsing half is memoized module-wide (_parse_san_core):
        a corpus's SAN vocabulary is tiny relative to its ply count."""
        b = self.board
        us = self.side
        if core in ("O-O", "O-O-O"):
            want = F_CASTLE_K if core == "O-O" else F_CASTLE_Q
            return [m for m in self._castle_moves() if m.flag == want]
        spec = _parse_san_core(core)
        if spec is None:
            return []
        pt, dest, dis_file, dis_rank, capture, promo = spec
        piece = pt if us == WHITE else pt.lower()
        out: list[Move] = []
        if pt == "P":
            fwd = 16 if us == WHITE else -16
            promo_rank = 7 if us == WHITE else 0
            promos = [promo] if promo else [""]
            if sq_rank(dest) == promo_rank and not promo:
                return []  # promotion square requires a promo piece
            if promo and sq_rank(dest) != promo_rank:
                # the converse: a promo suffix off the last rank
                # ('e4=Q') must be unparseable, not a move that
                # materializes a queen mid-board
                return []
            if capture:
                for d in (-1, 1):
                    frm = dest - fwd + d
                    if (frm & 0x88) or b[frm] != piece:
                        continue
                    if dis_file is not None and sq_file(frm) != dis_file:
                        continue
                    if b[dest] and piece_color(b[dest]) != us:
                        for pr in promos:
                            out.append(Move(frm, dest, piece, pr, F_CAPTURE))
                    elif self.ep is not None and dest == self.ep:
                        out.append(Move(frm, dest, piece, "", F_EP))
            else:
                if b[dest]:
                    return []
                frm = dest - fwd
                if not (frm & 0x88) and b[frm] == piece:
                    for pr in promos:
                        out.append(Move(frm, dest, piece, pr))
                elif (
                    not (frm & 0x88)
                    and not b[frm]
                    and sq_rank(dest) == (3 if us == WHITE else 4)
                ):
                    frm2 = dest - 2 * fwd
                    if not (frm2 & 0x88) and b[frm2] == piece:
                        out.append(Move(frm2, dest, piece, flag=F_DOUBLE_PUSH))
            return out
        # piece move: destination must be empty or enemy
        if b[dest] and piece_color(b[dest]) == us:
            return []
        flag = F_CAPTURE if b[dest] else F_QUIET
        if pt in ("N", "K"):
            deltas = KNIGHT_DELTAS if pt == "N" else KING_DELTAS
            for d in deltas:
                frm = dest + d
                if (frm & 0x88) or b[frm] != piece:
                    continue
                if dis_file is not None and sq_file(frm) != dis_file:
                    continue
                if dis_rank is not None and sq_rank(frm) != dis_rank:
                    continue
                out.append(Move(frm, dest, piece, flag=flag))
            return out
        deltas = (
            BISHOP_DELTAS
            if pt == "B"
            else ROOK_DELTAS
            if pt == "R"
            else BISHOP_DELTAS + ROOK_DELTAS
        )
        for d in deltas:
            frm = dest + d
            while not (frm & 0x88):
                if b[frm]:
                    if (
                        b[frm] == piece
                        and (dis_file is None or sq_file(frm) == dis_file)
                        and (dis_rank is None or sq_rank(frm) == dis_rank)
                    ):
                        out.append(Move(frm, dest, piece, flag=flag))
                    break
                frm += d
        return out


def san_move_cached(
    pos: Position, san: str, cache: dict, cap: int = 200_000
) -> tuple[Move, Position]:
    """Replay-loop SAN resolution with a position-transition memo.

    Real corpora replay the SAME positions millions of times (every
    game walks the opening tree — the premise of the whole entries
    store), so the resolved move for (position key, SAN) is memoized:
    a hit skips candidate generation and the legality attack-scan and
    pays only make_move, which must still run so halfmove/fullmove
    counters (not part of the key, ERAN needs them) stay exact.

    Keyed by ``pos.key()`` — the same 64-bit zobrist (side + castling
    + capturable-ep included) the entries fact table itself is keyed
    by, so the cache accepts exactly the collision risk the data model
    already accepts. ``cap`` bounds worker memory; the dict is cleared
    when full (opening-skewed hit mass makes LRU bookkeeping not worth
    its cost). Raises ValueError on illegal/ambiguous SAN like
    parse_san_child.
    """
    k = (pos.key(), san)
    m = cache.get(k)
    if m is not None and _cached_move_plausible(pos, m):
        return m, pos.make_move(m)
    m, child = pos.parse_san_child(san)
    if len(cache) >= cap:
        cache.clear()
    cache[k] = m
    return m, child


def _cached_move_plausible(pos: Position, m: Move) -> bool:
    """Cheap board-state guard before replaying a memoized move: a
    64-bit zobrist collision between distinct positions would otherwise
    make make_move (which mutates blindly) play an illegal move and
    corrupt every subsequent position of the game — a worse failure
    mode than the stats-merge the entries table accepts for the same
    collision. O(1) square probes; on mismatch the caller falls back to
    parse_san_child (and overwrites the stale entry)."""
    if pos.board[m.from_sq] != m.piece:
        return False
    if (m.piece.isupper()) != (pos.side == WHITE):
        return False
    dst = pos.board[m.to_sq]
    if m.flag == F_CAPTURE:
        # destination must hold an enemy piece
        return bool(dst) and dst.isupper() != m.piece.isupper()
    if m.flag == F_EP:
        return not dst and pos.ep == m.to_sq
    # quiet / double-push / castle: destination must be empty
    return not dst


def perft(pos: Position, depth: int) -> int:
    """Movegen correctness oracle (standard perft node counts)."""
    if depth == 0:
        return 1
    if depth == 1:
        return len(pos.legal_moves())
    return sum(perft(pos.make_move(m), depth - 1) for m in pos.legal_moves())
