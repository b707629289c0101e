"""FEN I/O for the chess environment (host-side).

Reference parity: ``ChessState::toFEN``/``setFromFEN``
(``src/games/chess/chess_state.cpp`` FEN section).  Standard FEN; castling
rights KQkq (Chess960 starts are configured through ``ChessEnv`` instead of
Shredder-FEN).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from alphazero_tpu.games.chess_tables import (
    BISHOP, KING, KNIGHT, PAWN, QUEEN, ROOK,
)

_PIECE_CHARS = {
    PAWN: "P", KNIGHT: "N", BISHOP: "B", ROOK: "R", QUEEN: "Q", KING: "K",
}
_CHAR_PIECES = {}
for p, ch in _PIECE_CHARS.items():
    _CHAR_PIECES[ch] = p  # white
    _CHAR_PIECES[ch.lower()] = 6 + p  # black


def board_from_fen(placement: str) -> np.ndarray:
    board = np.full((8, 8), -1, np.int8)
    ranks = placement.split("/")
    if len(ranks) != 8:
        raise ValueError(f"bad FEN placement {placement!r}")
    for i, rank in enumerate(ranks):
        r = 7 - i  # FEN starts at rank 8
        c = 0
        for ch in rank:
            if ch.isdigit():
                c += int(ch)
            else:
                board[r, c] = _CHAR_PIECES[ch]
                c += 1
        if c != 8:
            raise ValueError(f"bad FEN rank {rank!r}")
    return board


def square_from_alg(s: str) -> int:
    return (int(s[1]) - 1) * 8 + (ord(s[0]) - ord("a"))


def alg_from_square(sq: int) -> str:
    return chr(ord("a") + sq % 8) + str(sq // 8 + 1)


def state_from_fen(env, fen: str):
    """Build a ChessState from a FEN string (legal mask + hash computed)."""
    from alphazero_tpu.games.chess import ChessState

    parts = fen.split()
    board = board_from_fen(parts[0])
    to_play = 0 if parts[1] == "w" else 1
    cast = np.zeros((2, 2), bool)
    if len(parts) > 2 and parts[2] != "-":
        cast[0, 0] = "K" in parts[2]
        cast[0, 1] = "Q" in parts[2]
        cast[1, 0] = "k" in parts[2]
        cast[1, 1] = "q" in parts[2]
    ep = -1
    if len(parts) > 3 and parts[3] != "-":
        ep = square_from_alg(parts[3])
    halfmove = int(parts[4]) if len(parts) > 4 else 0
    fullmove = int(parts[5]) if len(parts) > 5 else 1
    move_count = (fullmove - 1) * 2 + to_play

    board_j = jnp.asarray(board)
    cast_j = jnp.asarray(cast)
    ep_j = jnp.asarray(ep, jnp.int32)
    tp_j = jnp.asarray(to_play, jnp.int32)
    h = env._hash_board(board_j) + env._hash_extras(cast_j, ep_j, tp_j)
    hist = jnp.zeros((env.history_len, 2), jnp.uint32).at[0].set(h)
    state = ChessState(
        board=board_j,
        to_play=tp_j,
        castling=cast_j,
        rook_start=jnp.asarray([[7, 0], [7, 0]], jnp.int32),
        king_start=jnp.asarray([4, 4], jnp.int32),
        ep_square=ep_j,
        halfmove=jnp.asarray(halfmove, jnp.int32),
        move_count=jnp.asarray(move_count, jnp.int32),
        terminal=jnp.zeros((), jnp.bool_),
        winner=jnp.full((), -1, jnp.int32),
        in_check=jnp.zeros((), jnp.bool_),
        legal=jnp.zeros((env.num_actions,), jnp.bool_),
        hash=h,
        history=hist,
        rep_count=jnp.ones((), jnp.int32),
    )
    legal, in_check = env._legal_mask_impl(state)
    # Adjudicate the loaded position like step() would (mate/stalemate/
    # 50-move/insufficient material).
    no_moves = ~jnp.any(legal)
    checkmate = no_moves & in_check
    terminal = (
        no_moves
        | (state.halfmove >= 100)
        | env._insufficient_material(state.board)
    )
    winner = jnp.where(
        checkmate, 1 - state.to_play, jnp.full((), -1, jnp.int32)
    )
    return state.replace(
        legal=legal & ~terminal,
        in_check=in_check,
        terminal=terminal,
        winner=winner,
    )


def fen_from_state(state) -> str:
    board = np.asarray(state.board)
    ranks = []
    for r in range(7, -1, -1):
        out, empties = "", 0
        for c in range(8):
            p = int(board[r, c])
            if p < 0:
                empties += 1
            else:
                if empties:
                    out += str(empties)
                    empties = 0
                ch = _PIECE_CHARS[p % 6]
                out += ch if p < 6 else ch.lower()
        if empties:
            out += str(empties)
        ranks.append(out)
    placement = "/".join(ranks)
    stm = "w" if int(state.to_play) == 0 else "b"
    cast = np.asarray(state.castling)
    rights = (
        ("K" if cast[0, 0] else "")
        + ("Q" if cast[0, 1] else "")
        + ("k" if cast[1, 0] else "")
        + ("q" if cast[1, 1] else "")
    ) or "-"
    ep = int(state.ep_square)
    ep_s = alg_from_square(ep) if ep >= 0 else "-"
    half = int(state.halfmove)
    full = int(state.move_count) // 2 + 1
    return f"{placement} {stm} {rights} {ep_s} {half} {full}"


def action_to_san(env, state, action: int) -> str:
    """Standard Algebraic Notation for a legal action in ``state``
    (reference SAN support, chess_state.cpp SAN section).  Host-side."""
    import numpy as np

    from alphazero_tpu.games import chess_tables as T
    from alphazero_tpu.games.chess_tables import (
        BISHOP, KING, KNIGHT, PAWN, QUEEN, ROOK,
    )

    piece_letter = {KNIGHT: "N", BISHOP: "B", ROOK: "R", QUEEN: "Q",
                    KING: "K"}
    board = np.asarray(state.board)
    legal = np.asarray(env.legal_mask(state))
    if not legal[action]:
        raise ValueError("action is not legal in this position")

    import jax.numpy as jnp

    after = env.step(state, jnp.asarray(action))
    suffix = ""
    if bool(after.terminal) and int(after.winner) >= 0:
        suffix = "#"
    elif bool(after.in_check):
        suffix = "+"

    from_sq, mtype = divmod(int(action), 73)
    fr, fc = divmod(from_sq, 8)
    p = int(board[fr, fc])
    ptype = p % 6
    us = p // 6

    # Resolve target square like step() does.
    tab = T.TABLES
    if tab["is_knight"][mtype]:
        dr, dc = T.KNIGHT_OFFSETS[mtype - 56]
    elif mtype >= 64:
        fwd = 1 if us == 0 else -1
        dr, dc = fwd, (0, -1, 1)[(mtype - 64) // 3]
    else:
        d, dist = int(tab["dir_of"][mtype]), int(tab["dist_of"][mtype])
        dr, dc = T.QUEEN_DIRS[d][0] * dist, T.QUEEN_DIRS[d][1] * dist
    tr, tc = fr + dr, fc + dc
    target = int(board[tr, tc])

    # Castling (KxR encoding).
    if ptype == KING and target >= 0 and target // 6 == us and \
            target % 6 == ROOK:
        return ("O-O" if tc > fc else "O-O-O") + suffix

    dest = alg_from_square(tr * 8 + tc)
    capture = target >= 0 or (
        ptype == PAWN and dc != 0 and target < 0  # en passant
    )

    if ptype == PAWN:
        out = (chr(ord("a") + fc) + "x" + dest) if capture else dest
        if mtype >= 64:
            promo = T.UNDERPROMO_PIECES[(mtype - 64) % 3]
            out += "=" + piece_letter[promo]
        elif tr in (0, 7):
            out += "=Q"
        return out + suffix

    # Disambiguation: other same-type pieces that can legally reach dest.
    amb_file = amb_rank = False
    need = False
    legal2 = legal.reshape(64, 73)
    for s in range(64):
        if s == from_sq:
            continue
        pp = int(board[s // 8, s % 8])
        if pp != p:
            continue
        for t in range(73):
            if not legal2[s, t]:
                continue
            if tab["is_knight"][t]:
                odr, odc = T.KNIGHT_OFFSETS[t - 56]
            elif t >= 64:
                continue
            else:
                dd, dist2 = int(tab["dir_of"][t]), int(tab["dist_of"][t])
                odr, odc = (T.QUEEN_DIRS[dd][0] * dist2,
                            T.QUEEN_DIRS[dd][1] * dist2)
            if (s // 8 + odr, s % 8 + odc) == (tr, tc):
                need = True
                if s % 8 == fc:
                    amb_rank = True
                else:
                    amb_file = True
    dis = ""
    if need:
        if amb_file and amb_rank:
            dis = alg_from_square(from_sq)
        elif amb_rank:
            dis = str(fr + 1)
        else:
            dis = chr(ord("a") + fc)
    return (piece_letter[ptype] + dis + ("x" if capture else "") + dest
            + suffix)


def _normalize_san(s: str) -> str:
    """Strip decorations that don't identify the move: check/mate marks,
    annotations (!?), e.p. tag; normalize zero-castling to O-O form."""
    s = s.strip().rstrip("+#!?").replace("e.p.", "").strip()
    s = s.replace("0-0-0", "O-O-O")
    if s == "0-0":
        s = "O-O"
    return s


def san_to_action(env, state, san: str) -> int:
    """Parse Standard Algebraic Notation into an action index (reference
    ``ChessState::fromSAN``, include/alphazero/games/chess/chess_state.h:290).

    Matches the given SAN against the SAN of every legal action, tolerating
    missing check/mate suffixes, annotations, and redundant disambiguation
    (e.g. accepts ``Ngf3`` when plain ``Nf3`` is unambiguous).  Host-side.
    """
    import numpy as np

    want = _normalize_san(san)
    legal = np.flatnonzero(np.asarray(env.legal_mask(state)))
    candidates = []
    for a in legal:
        got = _normalize_san(action_to_san(env, state, int(a)))
        if got == want:
            return int(a)
        # Tolerate extra/absent disambiguation: compare with the
        # disambiguation field stripped from both sides.
        if _strip_disambiguation(got) == _strip_disambiguation(want):
            candidates.append(int(a))
    if len(candidates) == 1:
        return candidates[0]
    if candidates:
        raise ValueError(f"ambiguous SAN {san!r}")
    raise ValueError(f"no legal move matches SAN {san!r}")


def _strip_disambiguation(s: str) -> str:
    if not s or s[0] not in "NBRQK":
        return s  # pawn moves / castling carry no disambiguation field
    body, tail = s[1:], ""
    if "=" in body:
        body, tail = body.split("=", 1)
        tail = "=" + tail
    cap = "x" in body
    body = body.replace("x", "")
    dest = body[-2:]
    return s[0] + ("x" if cap else "") + dest + tail
