"""Chess (+Chess960) as a pure, vmappable TPU-native environment.

Capability-parity target: the reference ``ChessState``/``ChessRules``/
``Chess960`` (``src/games/chess/chess_state.cpp``, ``chess_rules.cpp``,
``chess960.cpp``; ``include/alphazero/games/chess/chess_state.h:87-402``):
full legal move generation (castling incl. 960, en passant, promotions),
threefold repetition, 50-move rule, check/checkmate/stalemate, basic
12-plane and enhanced 18-plane tensors (chess_state.cpp:665-769).
FEN I/O lives in games/chess_fen.py.

TPU-first design (not a translation):
  * Whole-board plane algebra replaces per-square move loops: sliding
    attacks/paths are 7-step shift chains per direction on [8,8] planes; all
    4672 actions get their pseudo-legality computed at once.
  * Check legality uses pin/evasion logic (checkers, check rays, pin rays,
    king-danger squares with x-ray through the king) — branch-free, no
    per-move make-and-test.
  * En passant discovered-check cases are handled by dedicated ray tests;
    ep capture of a checking pawn is special-cased into the evasion set.
  * Castling is encoded KxR (king takes own rook), sound for Chess960.
  * Repetition state is an additive-Zobrist hash ring (like games/go.py);
    threefold and the 50-move rule auto-adjudicate to a draw.
  * Action space: AlphaZero 8x8x73 in absolute orientation (decision record
    in games/chess_tables.py; the reference is inconsistent between two
    encodings, SURVEY.md §2.2).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from alphazero_tpu.core import zobrist
from alphazero_tpu.core.types import GameType
from alphazero_tpu.games import chess_tables as T
from alphazero_tpu.games.chess_tables import (
    BISHOP, KING, KNIGHT, PAWN, QUEEN, ROOK,
)

_DIRS = T.QUEEN_DIRS  # N, NE, E, SE, S, SW, W, NW
_ORTHO = (0, 2, 4, 6)
_DIAG = (1, 3, 5, 7)


@struct.dataclass
class ChessState:
    board: jax.Array  # int8 [8, 8]: -1 empty, else color*6 + piece_type
    to_play: jax.Array  # i32: 0 white, 1 black
    castling: jax.Array  # bool [2, 2]: [color][0=kingside(h), 1=queenside(a)]
    rook_start: jax.Array  # i32 [2, 2]: castling rook start files (960-aware)
    king_start: jax.Array  # i32 [2]: king start file per color
    ep_square: jax.Array  # i32: flat ep target square, -1 none
    halfmove: jax.Array  # i32: 50-move-rule clock (plies)
    move_count: jax.Array  # i32: total plies played
    terminal: jax.Array  # bool
    winner: jax.Array  # i32: -1 draw/none, 0 white, 1 black
    in_check: jax.Array  # bool: side to move is in check
    legal: jax.Array  # bool [4672]: cached legal mask for side to move
    hash: jax.Array  # u32 [2] additive situational hash
    history: jax.Array  # u32 [H, 2] repetition ring
    rep_count: jax.Array  # i32: occurrences of current position (incl. now)


# ---------------------------------------------------------------------------
# plane helpers


def _shift(x: jax.Array, dr: int, dc: int) -> jax.Array:
    """Move plane contents by (+dr, +dc): a set bit at square s appears at
    s + (dr, dc); zero fill."""
    n, m = x.shape
    if abs(dr) >= n or abs(dc) >= m:
        return jnp.zeros_like(x)
    out = x
    if dr > 0:
        out = jnp.concatenate([jnp.zeros((dr, m), x.dtype), out[:-dr]], axis=0)
    elif dr < 0:
        out = jnp.concatenate([out[-dr:], jnp.zeros((-dr, m), x.dtype)], axis=0)
    if dc > 0:
        out = jnp.concatenate(
            [jnp.zeros((n, dc), x.dtype), out[:, :-dc]], axis=1
        )
    elif dc < 0:
        out = jnp.concatenate(
            [out[:, -dc:], jnp.zeros((n, -dc), x.dtype)], axis=1
        )
    return out


def _at(x: jax.Array, dr: int, dc: int) -> jax.Array:
    """View from a square: out[s] = x[s + (dr, dc)] (off-board -> 0)."""
    return _shift(x, -dr, -dc)


def _ray_attacks(sliders, empty, dr, dc):
    att = _shift(sliders, dr, dc)
    for _ in range(6):
        att = att | _shift(att & empty, dr, dc)
    return att


def _first_hit(origin, empty, dr, dc):
    """(ray_empties, hit): walk from ``origin`` along d; ray_empties = empty
    squares passed, hit = first non-empty square reached."""
    frontier = _shift(origin, dr, dc)
    hit = frontier & ~empty
    ray = frontier & empty
    for _ in range(6):
        frontier = _shift(ray, dr, dc)
        hit = hit | (frontier & ~empty)
        ray = ray | (frontier & empty)
    return ray, hit


@functools.lru_cache(maxsize=None)
def _onboard_np(dr: int, dc: int) -> np.ndarray:
    """from-squares whose target from+(dr,dc) is on the board."""
    m = np.zeros((8, 8), bool)
    for r in range(8):
        for c in range(8):
            m[r, c] = 0 <= r + dr < 8 and 0 <= c + dc < 8
    return m


def _onboard(dr, dc):
    return jnp.asarray(_onboard_np(dr, dc))


def _default_start_board() -> np.ndarray:
    b = np.full((8, 8), -1, np.int8)
    back = [ROOK, KNIGHT, BISHOP, QUEEN, KING, BISHOP, KNIGHT, ROOK]
    for c, p in enumerate(back):
        b[0, c] = p
        b[7, c] = 6 + p
    b[1, :] = PAWN
    b[6, :] = 6 + PAWN
    return b


def chess960_back_rank(number: int) -> list:
    """Back-rank piece order for Chess960 position ``number`` in [0, 960)
    (Scharnagl numbering — reference ``Chess960::generatePosition``,
    src/games/chess/chess960.cpp)."""
    if not 0 <= number < 960:
        raise ValueError("chess960 number must be in [0, 960)")
    n, b1 = divmod(number, 4)
    n, b2 = divmod(n, 4)
    n, q = divmod(n, 6)
    free = [None] * 8
    free[b1 * 2 + 1] = BISHOP
    free[b2 * 2] = BISHOP
    empties = [i for i in range(8) if free[i] is None]
    free[empties[q]] = QUEEN
    empties = [i for i in range(8) if free[i] is None]
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    ni, nj = pairs[n]
    free[empties[ni]] = KNIGHT
    free[empties[nj]] = KNIGHT
    empties = [i for i in range(8) if free[i] is None]
    free[empties[0]] = ROOK
    free[empties[1]] = KING
    free[empties[2]] = ROOK
    return free


# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ChessEnv:
    """Static configuration.  ``chess960_position`` selects a fixed 960
    start (None = standard) — the reference treats 960 as a variant flag +
    position number (chess960.h:22+)."""

    chess960_position: Optional[int] = None
    history_len: int = 16
    max_moves: int = 512  # ply cap -> draw
    board_size: int = 8

    game_type: GameType = GameType.CHESS

    @property
    def num_actions(self) -> int:
        return T.NUM_ACTIONS

    @property
    def observation_shape(self) -> Tuple[int, int, int]:
        return (18, 8, 8)

    @functools.cached_property
    def zobrist(self) -> zobrist.ZobristTable:
        return zobrist.ZobristTable(
            num_pieces=12, num_positions=64, num_features=2,
            feature_cardinality=64,
        )

    @functools.cached_property
    def _start(self):
        if self.chess960_position is None:
            return _default_start_board(), 4, (7, 0)
        back = chess960_back_rank(self.chess960_position)
        board = np.full((8, 8), -1, np.int8)
        for c, p in enumerate(back):
            board[0, c] = p
            board[7, c] = 6 + p
        board[1, :] = PAWN
        board[6, :] = 6 + PAWN
        king_file = back.index(KING)
        rook_files = [i for i, p in enumerate(back) if p == ROOK]
        return board, king_file, (max(rook_files), min(rook_files))

    # ---- hashing ---------------------------------------------------------

    def _hash_board(self, board: jax.Array) -> jax.Array:
        flat = board.reshape(-1)
        keys = self.zobrist.piece  # [12, 64, 2]
        sq = jnp.arange(64)
        k = jnp.where(
            (flat >= 0)[:, None], keys[jnp.clip(flat, 0, 11), sq], 0
        ).astype(jnp.uint32)
        return k.sum(0)

    def _hash_extras(self, castling, ep_square, to_play) -> jax.Array:
        cast_code = (
            castling[0, 0].astype(jnp.int32)
            + 2 * castling[0, 1]
            + 4 * castling[1, 0]
            + 8 * castling[1, 1]
        )
        ep_file = jnp.where(ep_square >= 0, ep_square % 8, 8)
        return (
            self.zobrist.feature_key(0, cast_code)
            + self.zobrist.feature_key(1, ep_file)
            + self.zobrist.player_key(to_play)
        ).astype(jnp.uint32)

    # ---- lifecycle -------------------------------------------------------

    def init(self, key: jax.Array | None = None) -> ChessState:
        board_np, king_file, rooks = self._start
        board = jnp.asarray(board_np)
        castling = jnp.ones((2, 2), jnp.bool_)
        ep = jnp.full((), -1, jnp.int32)
        to_play = jnp.zeros((), jnp.int32)
        h = self._hash_board(board) + self._hash_extras(castling, ep, to_play)
        hist = jnp.zeros((self.history_len, 2), jnp.uint32).at[0].set(h)
        state = ChessState(
            board=board,
            to_play=to_play,
            castling=castling,
            rook_start=jnp.asarray([rooks, rooks], jnp.int32),
            king_start=jnp.asarray([king_file, king_file], jnp.int32),
            ep_square=ep,
            halfmove=jnp.zeros((), jnp.int32),
            move_count=jnp.zeros((), jnp.int32),
            terminal=jnp.zeros((), jnp.bool_),
            winner=jnp.full((), -1, jnp.int32),
            in_check=jnp.zeros((), jnp.bool_),
            legal=jnp.zeros((T.NUM_ACTIONS,), jnp.bool_),
            hash=h,
            history=hist,
            rep_count=jnp.ones((), jnp.int32),
        )
        legal, in_check = self._legal_mask_impl(state)
        return state.replace(legal=legal, in_check=in_check)

    # ---- shared geometry -------------------------------------------------

    def _planes_t(self, board, color):
        """Piece planes for a traced color index."""
        base = (color * 6).astype(jnp.int8)
        return {
            p: board == base + jnp.int8(p)
            for p in (PAWN, KNIGHT, BISHOP, ROOK, QUEEN, KING)
        }

    def _attacks(self, board, color, empty):
        """Squares attacked by traced ``color`` given an ``empty`` plane
        (callers may x-ray by adding squares to empty)."""
        pl = self._planes_t(board, color)
        att = jnp.zeros((8, 8), jnp.bool_)
        pawn_w = _shift(pl[PAWN], 1, 1) | _shift(pl[PAWN], 1, -1)
        pawn_b = _shift(pl[PAWN], -1, 1) | _shift(pl[PAWN], -1, -1)
        att = att | jnp.where(color == 0, pawn_w, pawn_b)
        for dr, dc in T.KNIGHT_OFFSETS:
            att = att | _shift(pl[KNIGHT], dr, dc)
        for dr, dc in _DIRS:
            att = att | _shift(pl[KING], dr, dc)
        ortho = pl[ROOK] | pl[QUEEN]
        diag = pl[BISHOP] | pl[QUEEN]
        for d in _ORTHO:
            att = att | _ray_attacks(ortho, empty, *_DIRS[d])
        for d in _DIAG:
            att = att | _ray_attacks(diag, empty, *_DIRS[d])
        return att

    # ---- legality --------------------------------------------------------

    def legal_mask(self, state: ChessState) -> jax.Array:
        return state.legal & ~state.terminal

    def _legal_mask_impl(self, state: ChessState):
        board = state.board
        us = state.to_play
        them = 1 - us
        mine = self._planes_t(board, us)
        theirs = self._planes_t(board, them)
        occ = board >= 0
        own = occ & ((board >= 6) == (us == 1))
        enemy = occ & ~own
        empty = ~occ

        king = mine[KING]
        danger = self._attacks(board, them, empty | king)  # x-ray our king
        in_check = jnp.any(king & danger)

        # --- checkers + evasion targets ---
        kn_check = jnp.zeros((8, 8), jnp.bool_)
        for dr, dc in T.KNIGHT_OFFSETS:
            kn_check = kn_check | (_shift(king, dr, dc) & theirs[KNIGHT])
        pw_check_w = (_shift(king, 1, -1) | _shift(king, 1, 1)) & theirs[PAWN]
        pw_check_b = (_shift(king, -1, -1) | _shift(king, -1, 1)) & theirs[PAWN]
        pw_check = jnp.where(us == 0, pw_check_w, pw_check_b)
        contact_checkers = kn_check | pw_check
        check_ray = contact_checkers
        n_checkers = contact_checkers.sum().astype(jnp.int32)

        pin_lines = []  # per dir: full pin line (exclusive king, incl pinner)
        pinned = jnp.zeros((8, 8), jnp.bool_)
        for d, (dr, dc) in enumerate(_DIRS):
            sliders = (
                theirs[ROOK] | theirs[QUEEN] if d in _ORTHO
                else theirs[BISHOP] | theirs[QUEEN]
            )
            ray, hit = _first_hit(king, empty, dr, dc)
            checker = hit & sliders
            has_check = jnp.any(checker)
            check_ray = check_ray | jnp.where(has_check, ray | checker, False)
            n_checkers = n_checkers + has_check.astype(jnp.int32)

            blocker = hit & own
            ray2, hit2 = _first_hit(king, empty | blocker, dr, dc)
            pinner = hit2 & sliders
            is_pin = jnp.any(blocker) & jnp.any(pinner)
            pinned = pinned | jnp.where(is_pin, blocker, False)
            pin_lines.append(jnp.where(is_pin, ray2 | pinner, False))

        double_check = n_checkers >= 2
        single_check = n_checkers == 1
        # Allowed targets for non-king moves.
        evasion = jnp.where(
            single_check, check_ray, jnp.ones((8, 8), jnp.bool_)
        )
        evasion = jnp.where(double_check, False, evasion)

        # Pin lines all emanate from the king in distinct directions, so any
        # cell lies on at most ONE line; a per-cell direction bitmask makes
        # the "target stays on the from-square's pin line" test two ops.
        line_bits = jnp.zeros((8, 8), jnp.int32)
        for d, line in enumerate(pin_lines):
            line_bits = line_bits + (1 << d) * line

        def move_filter(dr, dc):
            """Combined evasion+pin filter viewed from the from-square for a
            move with displacement (dr, dc)."""
            ok = _at(evasion, dr, dc)
            same_line = (line_bits & _at(line_bits, dr, dc)) != 0
            return ok & (~pinned | same_line)

        def pin_filter(dr, dc):
            same_line = (line_bits & _at(line_bits, dr, dc)) != 0
            return ~pinned | same_line

        actions = []

        # --- sliding / king queen-type moves ---
        ortho_movers = mine[ROOK] | mine[QUEEN]
        diag_movers = mine[BISHOP] | mine[QUEEN]
        ep_plane = jnp.arange(64).reshape(8, 8) == state.ep_square
        rows = jnp.broadcast_to(jnp.arange(8)[:, None], (8, 8))
        pawn_start_row = jnp.where(us == 0, 1, 6)
        pre_promo_row = jnp.where(us == 0, 6, 1)

        # ep capture of the checking pawn: landing square is the ep square,
        # which is NOT on the check ray — allow explicitly when the ep pawn
        # is the checker (single check).
        ep_victim_w = _shift(ep_plane, -1, 0)  # white capturing: victim south of ep
        ep_victim_b = _shift(ep_plane, 1, 0)
        ep_victim = jnp.where(us == 0, ep_victim_w, ep_victim_b)
        ep_resolves_check = single_check & jnp.any(ep_victim & pw_check)

        # --- en passant discovered-check tests, hoisted & shared ---
        # (b) diagonal rays through the victim square only: remove victim,
        # occupy the landing (ep) square; flag only NEW diagonal exposure.
        r_sliders = theirs[ROOK] | theirs[QUEEN]
        b_sliders = theirs[BISHOP] | theirs[QUEEN]
        empty_b = (empty | ep_victim) & ~ep_plane
        bad_diag = jnp.zeros((), jnp.bool_)
        pre_bad = jnp.zeros((), jnp.bool_)
        for dd in _DIAG:
            ddr, ddc = _DIRS[dd]
            _, hit = _first_hit(king, empty_b, ddr, ddc)
            bad_diag = bad_diag | jnp.any(hit & b_sliders)
            _, hit0 = _first_hit(king, empty, ddr, ddc)
            pre_bad = pre_bad | jnp.any(hit0 & b_sliders)
        bad_diag_new = bad_diag & ~pre_bad
        # (a) rank ray: both pawns leave the rank; per capture side.
        ep_ok_side = {}
        for side in (-1, 1):
            frm_side = _shift(ep_victim, 0, -side) & mine[PAWN]
            empty_a = empty | ep_victim | frm_side
            _, hit_e = _first_hit(king, empty_a, 0, 1)
            _, hit_w = _first_hit(king, empty_a, 0, -1)
            bad_rank = jnp.any((hit_e | hit_w) & r_sliders)
            bad = bad_rank | bad_diag_new
            ep_ok_side[side] = jnp.where(
                bad, ~frm_side, jnp.ones((8, 8), jnp.bool_)
            )

        queen_type = []
        for d in range(8):
            dr, dc = _DIRS[d]
            movers = ortho_movers if d in _ORTHO else diag_movers
            path_ok = jnp.ones((8, 8), jnp.bool_)
            for dist in range(1, 8):
                tr, tc = dr * dist, dc * dist
                ok = (
                    movers
                    & path_ok
                    & _at(~own, tr, tc)
                    & _onboard(tr, tc)
                    & move_filter(tr, tc)
                )
                if dist == 1:
                    kok = king & _at(~own & ~danger, tr, tc) & _onboard(tr, tc)
                    ok = ok | kok
                # pawn single push (+ queen promo by push)
                if dist == 1 and d in (0, 4):
                    push = mine[PAWN] & _at(empty, tr, tc) & _onboard(tr, tc)
                    good = (us == 0) if d == 0 else (us == 1)
                    ok = ok | (push & move_filter(tr, tc)
                               & jnp.where(good, True, False))
                # pawn double push
                if dist == 2 and d in (0, 4):
                    sdr = dr // 2 if False else (1 if d == 0 else -1)
                    dbl = (
                        mine[PAWN]
                        & (rows == pawn_start_row)
                        & _at(empty, sdr, 0)
                        & _at(empty, 2 * sdr, 0)
                    )
                    good = (us == 0) if d == 0 else (us == 1)
                    ok = ok | (dbl & move_filter(tr, tc)
                               & jnp.where(good, True, False))
                # pawn diagonal captures (incl. ep and queen cap-promo)
                if dist == 1 and d in (1, 7, 3, 5):
                    good = (us == 0) if d in (1, 7) else (us == 1)
                    normal = (
                        mine[PAWN] & _at(enemy, tr, tc) & _onboard(tr, tc)
                        & move_filter(tr, tc)
                    )
                    epc = (
                        mine[PAWN] & _at(ep_plane, tr, tc) & _onboard(tr, tc)
                        & (move_filter(tr, tc)
                           | (jnp.where(ep_resolves_check, True, False)
                              & pin_filter(tr, tc)))
                        & ep_ok_side[tc]
                    )
                    ok = ok | ((normal | epc) & jnp.where(good, True, False))
                queen_type.append(ok.reshape(64))
                # extend path for next dist: from+dist must be empty
                path_ok = path_ok & _at(empty, tr, tc)

        # --- knights ---
        knight_type = []
        for dr, dc in T.KNIGHT_OFFSETS:
            ok = (
                mine[KNIGHT]
                & ~pinned
                & _at(~own, dr, dc)
                & _onboard(dr, dc)
                & _at(evasion, dr, dc)
            )
            knight_type.append(ok.reshape(64))

        # --- underpromotions (N, B, R); queen promo rides queen-type ---
        up_type = []
        for dc_rel in (0, -1, 1):
            for _pi in range(3):
                def gen(color):
                    drr = 1 if color == 0 else -1
                    tr, tc = drr, dc_rel
                    if dc_rel == 0:
                        tgt = _at(empty, tr, tc)
                    else:
                        tgt = _at(enemy, tr, tc)
                    return (
                        mine[PAWN]
                        & (rows == pre_promo_row)
                        & tgt
                        & _onboard(tr, tc)
                        & move_filter(tr, tc)
                    )

                ok = jnp.where(us == 0, gen(0), gen(1))
                up_type.append(ok.reshape(64))

        act = jnp.stack(queen_type + knight_type + up_type, axis=1)
        # [64, 73] — queen types are ordered d*7+(dist-1) by construction.

        act = self._castling_actions(state, act, danger, in_check)
        return act.reshape(-1), in_check

    def _castling_actions(self, state, act, danger, in_check):
        """KxR castling squares -> action bits (king queen-move toward the
        rook, dist = |rook_file - king_file|)."""
        us = state.to_play
        board = state.board
        back = jnp.where(us == 0, 0, 7)
        kf = state.king_start[us]
        king_sq = back * 8 + kf
        files = jnp.arange(8)
        row = board[back]
        row_empty = row == -1
        drow = danger[back]
        # The king must actually be on its start square with rights intact —
        # rights are cleared when it moves, so rights imply position.
        for side, kdest_f, rdest_f in ((0, 6, 5), (1, 2, 3)):
            rf = state.rook_start[us, side]
            right = state.castling[us, side] & ~in_check
            lo_k, hi_k = jnp.minimum(kf, kdest_f), jnp.maximum(kf, kdest_f)
            lo_r, hi_r = jnp.minimum(rf, rdest_f), jnp.maximum(rf, rdest_f)
            span = (files >= jnp.minimum(lo_k, lo_r)) & (
                files <= jnp.maximum(hi_k, hi_r)
            )
            principals = (files == kf) | (files == rf)
            clear = jnp.all(jnp.where(span & ~principals, row_empty, True))
            kpath = (files >= lo_k) & (files <= hi_k)
            safe = jnp.all(jnp.where(kpath & (files != rf), ~drow, True))
            ok = right & clear & safe
            dcol = jnp.where(rf > kf, 1, -1)
            dist = jnp.abs(rf - kf)
            d = jnp.where(dcol > 0, 2, 6)
            t = d * 7 + jnp.maximum(dist, 1) - 1
            act = act.at[king_sq, t].set(act[king_sq, t] | (ok & (dist >= 1)))
        return act

    # ---- step ------------------------------------------------------------

    def step(self, state: ChessState, action: jax.Array) -> ChessState:
        action = action.astype(jnp.int32)
        board = state.board
        us = state.to_play
        them = 1 - us
        from_sq, mtype = action // 73, action % 73
        fr, fc = from_sq // 8, from_sq % 8
        moving = board[fr, fc]
        piece_type = jnp.where(moving >= 0, moving % 6, -1)

        dir_of = jnp.asarray(T.TABLES["dir_of"])
        dist_of = jnp.asarray(T.TABLES["dist_of"])
        is_knight = jnp.asarray(T.TABLES["is_knight"])

        is_underpromo = mtype >= 64
        dirs = jnp.asarray(_DIRS, jnp.int32)
        kdel = jnp.asarray(T.KNIGHT_OFFSETS, jnp.int32)
        fwd = jnp.where(us == 0, 1, -1)
        up_dc = jnp.asarray([0, -1, 1], jnp.int32)[
            jnp.clip((mtype - 64) // 3, 0, 2)
        ]
        up_piece = jnp.asarray(T.UNDERPROMO_PIECES, jnp.int32)[
            jnp.clip((mtype - 64) % 3, 0, 2)
        ]

        delta = jnp.where(
            is_knight[mtype],
            kdel[jnp.clip(mtype - 56, 0, 7)],
            jnp.where(
                is_underpromo,
                jnp.stack([fwd, up_dc]),
                dirs[jnp.clip(dir_of[mtype], 0)]
                * jnp.maximum(dist_of[mtype], 1),
            ),
        )
        tr = jnp.clip(fr + delta[0], 0, 7)
        tc = jnp.clip(fc + delta[1], 0, 7)
        to_sq = tr * 8 + tc

        target_piece = board[tr, tc]
        is_castle = (
            (piece_type == KING)
            & (target_piece >= 0)
            & ((target_piece // 6) == us)
            & ((target_piece % 6) == ROOK)
        )
        side = jnp.where(tc > fc, 0, 1)

        is_ep = (
            (piece_type == PAWN)
            & (to_sq == state.ep_square)
            & (jnp.abs(delta[1]) == 1)
        )
        ep_cap_r = jnp.clip(tr - fwd, 0, 7)
        captured = jnp.where(is_ep, board[ep_cap_r, tc], target_piece)
        is_capture = (captured >= 0) & ~is_castle

        promo_rank = jnp.where(us == 0, 7, 0)
        is_promo = (piece_type == PAWN) & (tr == promo_rank)
        new_piece = jnp.where(
            is_underpromo,
            us * 6 + up_piece,
            jnp.where(is_promo, us * 6 + QUEEN, moving),
        ).astype(jnp.int8)

        b = board.at[fr, fc].set(-1)
        b = jnp.where(is_ep, b.at[ep_cap_r, tc].set(-1), b)
        back = jnp.where(us == 0, 0, 7)
        kdest_f = jnp.where(side == 0, 6, 2)
        rdest_f = jnp.where(side == 0, 5, 3)
        b_castle = (
            board.at[fr, fc].set(-1)
            .at[tr, tc].set(-1)
            .at[back, kdest_f].set((us * 6 + KING).astype(jnp.int8))
            .at[back, rdest_f].set((us * 6 + ROOK).astype(jnp.int8))
        )
        b_normal = b.at[tr, tc].set(new_piece)
        nb = jnp.where(is_castle, b_castle, b_normal)

        # castling rights
        cast = state.castling
        cast = cast.at[us].set(
            jnp.where(
                (piece_type == KING) | is_castle,
                jnp.zeros((2,), jnp.bool_),
                cast[us],
            )
        )
        rook_from = (piece_type == ROOK) & (fr == back) & ~is_castle
        cast = cast.at[us, 0].set(
            cast[us, 0] & ~(rook_from & (fc == state.rook_start[us, 0]))
        )
        cast = cast.at[us, 1].set(
            cast[us, 1] & ~(rook_from & (fc == state.rook_start[us, 1]))
        )
        their_back = jnp.where(them == 0, 0, 7)
        rook_taken = is_capture & (captured % 6 == ROOK) & (tr == their_back)
        cast = cast.at[them, 0].set(
            cast[them, 0] & ~(rook_taken & (tc == state.rook_start[them, 0]))
        )
        cast = cast.at[them, 1].set(
            cast[them, 1] & ~(rook_taken & (tc == state.rook_start[them, 1]))
        )

        dbl_push = (piece_type == PAWN) & (jnp.abs(tr - fr) == 2)
        new_ep = jnp.where(
            dbl_push, (fr + fwd) * 8 + fc, jnp.full((), -1, jnp.int32)
        )
        halfmove = jnp.where(
            (piece_type == PAWN) | is_capture, 0, state.halfmove + 1
        )
        move_count = state.move_count + 1

        nh = self._hash_board(nb) + self._hash_extras(cast, new_ep, them)
        hist = state.history.at[move_count % self.history_len].set(nh)
        rep = jnp.sum(jnp.all(hist == nh[None, :], axis=-1)).astype(jnp.int32)

        mid = ChessState(
            board=nb,
            to_play=them,
            castling=cast,
            rook_start=state.rook_start,
            king_start=state.king_start,
            ep_square=new_ep,
            halfmove=halfmove,
            move_count=move_count,
            terminal=jnp.zeros((), jnp.bool_),
            winner=jnp.full((), -1, jnp.int32),
            in_check=jnp.zeros((), jnp.bool_),
            legal=jnp.zeros_like(state.legal),
            hash=nh,
            history=hist,
            rep_count=rep,
        )
        legal, in_check = self._legal_mask_impl(mid)
        no_moves = ~jnp.any(legal)
        checkmate = no_moves & in_check
        stalemate = no_moves & ~in_check
        terminal = (
            checkmate
            | stalemate
            | (halfmove >= 100)
            | (rep >= 3)
            | (move_count >= self.max_moves)
            | self._insufficient_material(nb)
        )
        winner = jnp.where(checkmate, us, jnp.full((), -1, jnp.int32))

        new_state = mid.replace(
            terminal=terminal,
            winner=winner,
            in_check=in_check,
            legal=legal & ~terminal,
        )
        return jax.tree_util.tree_map(
            lambda old, new: jnp.where(state.terminal, old, new),
            state, new_state,
        )

    def _insufficient_material(self, board) -> jax.Array:
        """K vs K, K+minor vs K, K+minor vs K+minor."""
        flat = board.reshape(-1)

        def count(code):
            return jnp.sum(flat == code)

        heavy = (
            count(PAWN) + count(6 + PAWN)
            + count(ROOK) + count(6 + ROOK)
            + count(QUEEN) + count(6 + QUEEN)
        )
        minors_w = count(KNIGHT) + count(BISHOP)
        minors_b = count(6 + KNIGHT) + count(6 + BISHOP)
        return (heavy == 0) & (minors_w <= 1) & (minors_b <= 1)

    # ---- observations ----------------------------------------------------

    def observation(self, state: ChessState) -> jax.Array:
        """Enhanced 18-plane tensor (chess_state.cpp:710-769): 12 piece
        planes + [turn, castling*0.25/right, en-passant, halfmove/100,
        chess960 flag, repetition/3]."""
        # bf16 planes: consumers cast to bf16 anyway; halves obs HBM
        # traffic on the leaf-eval hot path (see games/gomoku.observation).
        dt = jnp.bfloat16
        board = state.board
        planes = [
            (board == jnp.int8(p)).astype(dt) for p in range(12)
        ]
        ones = jnp.ones((8, 8), dt)
        turn = ones * (state.to_play == 0)
        cast_val = 0.25 * (
            state.castling[0, 0].astype(dt)
            + state.castling[0, 1]
            + state.castling[1, 0]
            + state.castling[1, 1]
        )
        ep = (jnp.arange(64).reshape(8, 8) == state.ep_square).astype(dt)
        return jnp.stack(
            planes
            + [
                turn,
                ones * cast_val,
                ep,
                ones * jnp.minimum(state.halfmove / 100.0, 1.0).astype(dt),
                ones * (1.0 if self.chess960_position is not None else 0.0),
                ones * jnp.minimum(state.rep_count / 3.0, 1.0).astype(dt),
            ]
        )

    def observation_basic(self, state: ChessState) -> jax.Array:
        return self.observation(state)[:12]

    # ---- MCTS arena packing ---------------------------------------------
    # Without packing, each arena node would store a 4672-entry legal mask;
    # 16-bit bitfield f32 lanes cut the per-node footprint ~14x.

    def pack_for_arena(self, state: ChessState) -> dict:
        def bits16(x):  # bool [..., M] -> f32 [..., ceil(M/16)] bitfields
            m = x.shape[-1]
            pad = (-m) % 16
            xp = jnp.pad(x.astype(jnp.float32),
                         [(0, 0)] * (x.ndim - 1) + [(0, pad)])
            xp = xp.reshape(xp.shape[:-1] + (-1, 16))
            w = jnp.asarray(2.0 ** jnp.arange(16), jnp.float32)
            return (xp * w).sum(-1)

        def u32_split(x):
            return jnp.stack(
                [(x >> 16).astype(jnp.float32),
                 (x & jnp.uint32(0xFFFF)).astype(jnp.float32)], axis=-1
            )

        # Board: piece code (-1..11) + 1 -> [0, 12]; 4 bits x 64 cells.
        cells = (state.board.reshape(*state.board.shape[:-2], 64) + 1
                 ).astype(jnp.float32)
        w4 = jnp.asarray(16.0 ** jnp.arange(4), jnp.float32)
        board_packed = (
            cells.reshape(cells.shape[:-1] + (16, 4)) * w4
        ).sum(-1)  # [..., 16] values < 16^4 = 65536 ... < 2^24 exact
        return {
            "board": board_packed,
            "to_play": state.to_play.astype(jnp.float32),
            "castling": state.castling.astype(jnp.bfloat16),
            "rook_start": state.rook_start.astype(jnp.float32),
            "king_start": state.king_start.astype(jnp.float32),
            "ep": state.ep_square.astype(jnp.float32),
            "halfmove": state.halfmove.astype(jnp.float32),
            "move_count": state.move_count.astype(jnp.float32),
            "terminal": state.terminal.astype(jnp.bfloat16),
            "winner": state.winner.astype(jnp.float32),
            "in_check": state.in_check.astype(jnp.bfloat16),
            "legal": bits16(state.legal),
            "hash": u32_split(state.hash),
            "history": u32_split(state.history),
            "rep": state.rep_count.astype(jnp.float32),
        }

    def unpack_from_arena(self, packed: dict) -> ChessState:
        def unbits16(p, m):
            w = jnp.asarray(2.0 ** jnp.arange(16), jnp.float32)
            vals = jnp.round(p)[..., :, None]
            bits = jnp.floor(vals / w) % 2 > 0.5
            flat = bits.reshape(bits.shape[:-2] + (-1,))
            return flat[..., :m]

        def u32_join(p):
            return (
                (jnp.round(p[..., 0]).astype(jnp.uint32) << 16)
                | jnp.round(p[..., 1]).astype(jnp.uint32)
            )

        w4 = jnp.asarray(16.0 ** jnp.arange(4), jnp.float32)
        vals = jnp.round(packed["board"])[..., :, None]
        cells = (jnp.floor(vals / w4) % 16).reshape(
            packed["board"].shape[:-1] + (64,)
        )
        board = (cells - 1).astype(jnp.int8).reshape(
            packed["board"].shape[:-1] + (8, 8)
        )
        return ChessState(
            board=board,
            to_play=jnp.round(packed["to_play"]).astype(jnp.int32),
            castling=packed["castling"] > 0.5,
            rook_start=jnp.round(packed["rook_start"]).astype(jnp.int32),
            king_start=jnp.round(packed["king_start"]).astype(jnp.int32),
            ep_square=jnp.round(packed["ep"]).astype(jnp.int32),
            halfmove=jnp.round(packed["halfmove"]).astype(jnp.int32),
            move_count=jnp.round(packed["move_count"]).astype(jnp.int32),
            terminal=packed["terminal"] > 0.5,
            winner=jnp.round(packed["winner"]).astype(jnp.int32),
            in_check=packed["in_check"] > 0.5,
            legal=unbits16(packed["legal"], T.NUM_ACTIONS),
            hash=u32_join(packed["hash"]),
            history=u32_join(packed["history"]),
            rep_count=jnp.round(packed["rep"]).astype(jnp.int32),
        )

    # ---- accessors -------------------------------------------------------

    def terminal_flag(self, state: ChessState) -> jax.Array:
        return state.terminal

    def result(self, state: ChessState) -> jax.Array:
        from alphazero_tpu.core.types import result_from_winner

        return result_from_winner(state.winner, state.terminal)

    def to_play(self, state: ChessState) -> jax.Array:
        return state.to_play

    def winner(self, state: ChessState) -> jax.Array:
        return state.winner

    def position_hash(self, state: ChessState) -> jax.Array:
        """u32 [2] transposition-table identity.

        The board Zobrist key (board + castling + en passant + side to
        move, reference ``getHash``) is NOT sufficient as a TT identity
        for chess: ``observation()`` feeds the NN a halfmove/100 plane and
        a repetition/3 plane, so two states with equal board keys but
        different 50-move clocks or repetition counts have different NN
        evals.  Mix both into the key so a TT hit never substitutes a
        (policy, value) computed under a different rule-horizon context
        (position_hash is consumed only by the TT — the repetition ring
        keys off ``state.hash`` directly and is unaffected)."""
        extra = (
            state.halfmove.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
            ^ state.rep_count.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
        )
        return jnp.stack(
            [state.hash[0] ^ extra,
             state.hash[1] ^ (extra * jnp.uint32(0xC2B2AE3D) + jnp.uint32(1))]
        )
