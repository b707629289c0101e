"""Gomoku as a pure, vmappable TPU-native environment.

Capability-parity target: the reference ``GomokuState``/``GomokuRules``
(``src/games/gomoku/gomoku_state.cpp``, ``gomoku_rules.cpp``;
``include/alphazero/games/gomoku/gomoku_state.h:27-167``): freestyle
five-in-a-row plus Renju and Omok forbidden-move variants and the pro-long
opening, basic (3-plane) and enhanced (11-plane) tensor encodings
(``gomoku_state.cpp:207-257,811-840``), incremental Zobrist hashing
(``gomoku_state.cpp:620``).

Design (TPU-first, not a translation):
  * State is a struct-of-arrays pytree of static shape; ``step``/``legal``/
    ``observation`` are pure functions, batched with ``vmap`` — thousands of
    boards advance in lockstep inside one jitted program.
  * Win/forbidden detection is branch-free window arithmetic over whole-board
    planes (shift-and-AND chains on the VPU) instead of per-cell scans: for a
    hypothetical stone at every cell simultaneously we compute the maximal run
    through that cell per direction, from which five/overline/four/three maps
    all derive.  The reference's ~1.4k LoC of recursive pattern code
    (``gomoku_rules.cpp:118-1060``) becomes a handful of masked passes.
  * Renju's recursive "allowed double-three" resolution (reference depth<=3,
    ``gomoku_rules.cpp:952``) is expressed as a bounded fixed-point: compute a
    provisional forbidden map, then recompute threes counting only
    straight-four completions on non-forbidden cells, iterated
    ``_RENJU_REFINE_PASSES`` times.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as _np
from flax import struct

from alphazero_tpu.core import zobrist
from alphazero_tpu.core.types import GameType

# The 4 undirected line directions: E, S, SE, SW (row, col deltas).
_DIRS = ((0, 1), (1, 0), (1, 1), (1, -1))

# Offsets of the 40 cells sampled by step()'s win check: 8 half-directions
# (the 4 lines and their negations, negations last so consec[:4]/consec[4:]
# pair up) x distances 1..5.  Host constants, closed over as jit constants.
_HALF_DIRS = _DIRS + tuple((-dr, -dc) for dr, dc in _DIRS)
_LINE_DR = _np.array(
    [[i * dr for i in range(1, 6)] for dr, _ in _HALF_DIRS], _np.int32
)
_LINE_DC = _np.array(
    [[i * dc for i in range(1, 6)] for _, dc in _HALF_DIRS], _np.int32
)

# Bounded fixed-point passes approximating the reference's depth-3 recursive
# double-three resolution (gomoku_rules.cpp:952-1060).
_RENJU_REFINE_PASSES = 2


@struct.dataclass
class GomokuState:
    board: jax.Array  # int8 [N, N]: -1 empty, 0 black, 1 white
    to_play: jax.Array  # int32 scalar: 0 black, 1 white
    last_moves: jax.Array  # int32 [2, 3] most-recent-first flat actions, -1 none
    move_count: jax.Array  # int32 scalar
    terminal: jax.Array  # bool scalar
    winner: jax.Array  # int32 scalar: -1 none/draw, 0 black, 1 white
    hash: jax.Array  # uint32 [2]


def _shift_plane(x: jax.Array, dr: int, dc: int) -> jax.Array:
    """out[r, c] = x[r + dr, c + dc] with zero fill (static shifts)."""
    n, m = x.shape
    if abs(dr) >= n or abs(dc) >= m:
        return jnp.zeros_like(x)
    out = x
    if dr > 0:
        out = jnp.concatenate([out[dr:], jnp.zeros((dr, m), out.dtype)], axis=0)
    elif dr < 0:
        out = jnp.concatenate([jnp.zeros((-dr, m), out.dtype), out[:dr]], axis=0)
    if dc > 0:
        out = jnp.concatenate([out[:, dc:], jnp.zeros((n, dc), out.dtype)], axis=1)
    elif dc < 0:
        out = jnp.concatenate([jnp.zeros((n, -dc), out.dtype), out[:, :dc]], axis=1)
    return out


def _consecutive_counts(plane: jax.Array, dr: int, dc: int, cap: int) -> jax.Array:
    """For every cell c: number of consecutive set cells at c+d, c+2d, ...
    (strictly excluding c), capped at ``cap``.  int32 [N, N]."""
    count = jnp.zeros(plane.shape, jnp.int32)
    run = jnp.ones(plane.shape, jnp.bool_)
    for i in range(1, cap + 1):
        run = run & _shift_plane(plane, i * dr, i * dc)
        count = count + run.astype(jnp.int32)
    return count


def _run_through_maps(plane: jax.Array, cap: int = 5) -> jax.Array:
    """[4, N, N]: per direction, the length of the maximal consecutive run of
    ``plane`` through each cell if a stone were placed there."""
    maps = []
    for dr, dc in _DIRS:
        fwd = _consecutive_counts(plane, dr, dc, cap)
        bwd = _consecutive_counts(plane, -dr, -dc, cap)
        maps.append(fwd + bwd + 1)
    return jnp.stack(maps)  # [4, N, N]


def _window_sum(plane: jax.Array, dr: int, dc: int, k: int) -> jax.Array:
    """out[s] = sum of plane over cells s, s+d, ..., s+(k-1)d (int32)."""
    acc = plane.astype(jnp.int32)
    for i in range(1, k):
        acc = acc + _shift_plane(plane, i * dr, i * dc).astype(jnp.int32)
    return acc


def _covers(window_pred: jax.Array, dr: int, dc: int, offsets) -> jax.Array:
    """Boolean map marking cells s + i*d (i in offsets) of every window whose
    start cell s satisfies ``window_pred``."""
    out = jnp.zeros(window_pred.shape, jnp.bool_)
    for i in offsets:
        out = out | _shift_plane(window_pred, -i * dr, -i * dc)
    return out


@dataclasses.dataclass(frozen=True)
class GomokuEnv:
    """Static game configuration (jit constant).

    Mirrors the reference constructor options (``gomoku_state.h``):
    ``use_renju``/``use_omok`` forbidden-move variants, ``use_pro_long_opening``
    (black opens at center; black's second stone must be far from center,
    ``gomoku_state.cpp:877-894``).
    """

    board_size: int = 15
    use_renju: bool = False
    use_omok: bool = False
    use_pro_long_opening: bool = False

    game_type: GameType = GameType.GOMOKU

    @property
    def num_actions(self) -> int:
        return self.board_size * self.board_size

    @property
    def observation_shape(self) -> Tuple[int, int, int]:
        return (11, self.board_size, self.board_size)

    @functools.cached_property
    def zobrist(self) -> zobrist.ZobristTable:
        return zobrist.ZobristTable(num_pieces=2, num_positions=self.num_actions)

    # ---- lifecycle -------------------------------------------------------

    def init(self, key: jax.Array | None = None) -> GomokuState:
        n = self.board_size
        return GomokuState(
            board=jnp.full((n, n), -1, jnp.int8),
            to_play=jnp.zeros((), jnp.int32),
            last_moves=jnp.full((2, 3), -1, jnp.int32),
            move_count=jnp.zeros((), jnp.int32),
            terminal=jnp.zeros((), jnp.bool_),
            winner=jnp.full((), -1, jnp.int32),
            hash=zobrist.hxor(zobrist.empty_hash(), self.zobrist.player_key(0)),
        )

    def step(self, state: GomokuState, action: jax.Array) -> GomokuState:
        """Place a stone at flat ``action``; no-op on terminal states.

        Hot path of the batched search (one call per simulation per lane):
        a win can only pass through the placed stone, so instead of
        full-board run maps (~100 small shift kernels under vmap) the step
        samples just the 40 line cells around ``action`` (8 half-directions
        x distance 1..5) with a single one-hot einsum, and every per-lane
        dynamic index (board write, last-move row, Zobrist keys) is a
        one-hot select — no batched scatter/gather.  Measured 1.54 ms ->
        ~0.1 ms per batched step at B=1024 on v5e."""
        n = self.board_size
        action = action.astype(jnp.int32)
        r, c = action // n, action % n
        player = state.to_play

        rr = r + jnp.asarray(_LINE_DR)  # [8, 5]
        cc = c + jnp.asarray(_LINE_DC)
        valid = (rr >= 0) & (rr < n) & (cc >= 0) & (cc < n)
        idx = jnp.where(valid, rr * n + cc, 0).reshape(-1)  # [40]
        oh = (
            idx[:, None] == jnp.arange(n * n, dtype=jnp.int32)[None, :]
        ) & valid.reshape(-1)[:, None]
        mover_flat = (state.board == player.astype(jnp.int8)).reshape(-1)
        samples = (
            jnp.einsum(
                "ko,o->k",
                oh.astype(jnp.bfloat16),
                mover_flat.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            > 0.5
        ).reshape(8, 5)
        # Consecutive own stones outward per half-direction, capped at 5
        # (same semantics as _consecutive_counts(cap=5)).
        consec = jnp.cumprod(samples.astype(jnp.int32), axis=1).sum(axis=1)
        run_here = consec[:4] + consec[4:] + 1  # [4] runs through the cell

        if self.use_renju or self.use_omok:
            # Black wins on exact five only; white on five or more
            # (gomoku_rules.cpp:39-117 freestyle vs renju/omok).
            black_win = jnp.any(run_here == 5)
            white_win = jnp.any(run_here >= 5)
            win = jnp.where(player == 0, black_win, white_win)
        else:
            win = jnp.any(run_here >= 5)

        new_count = state.move_count + 1
        full = new_count >= self.num_actions
        terminal = win | full
        winner = jnp.where(win, player, jnp.full((), -1, jnp.int32))

        oh_cell = (
            jnp.arange(n * n, dtype=jnp.int32) == action
        ).reshape(n, n)
        board = jnp.where(oh_cell, player.astype(jnp.int8), state.board)

        lm = state.last_moves
        prev_row = jnp.where(player == 0, lm[0], lm[1])
        new_row = jnp.concatenate([action[None], prev_row[:2]])
        last = jnp.where(
            (jnp.arange(2, dtype=jnp.int32) == player)[:, None],
            new_row[None, :], lm,
        )

        piece_tab = self.zobrist.piece  # [2, S, 2] uint32
        keys_sel = jnp.where(player == 0, piece_tab[0], piece_tab[1])
        piece_key = (
            keys_sel * oh_cell.reshape(-1)[:, None].astype(jnp.uint32)
        ).sum(0)
        player_tab = self.zobrist.player  # [2, 2] uint32
        pk_old = jnp.where(player == 0, player_tab[0], player_tab[1])
        pk_new = jnp.where(player == 0, player_tab[1], player_tab[0])
        new_hash = zobrist.hxor(state.hash, piece_key, pk_old, pk_new)
        new_state = GomokuState(
            board=board,
            to_play=1 - player,
            last_moves=last,
            move_count=new_count,
            terminal=terminal,
            winner=winner,
            hash=new_hash,
        )
        # Terminal no-op contract (batched MCTS steps every lane every sim).
        return jax.tree_util.tree_map(
            lambda old, new: jnp.where(state.terminal, old, new), state, new_state
        )

    # ---- legality --------------------------------------------------------

    def legal_mask(self, state: GomokuState) -> jax.Array:
        """bool [num_actions].  Empty cells, minus variant-forbidden points for
        black (forbidden filtering is black-only in the reference,
        ``gomoku_state.cpp:553-573``); a forbidden point that completes an
        exact five stays legal (five precedence)."""
        empty = (state.board == -1).reshape(-1)
        legal = empty & ~state.terminal

        if self.use_renju or self.use_omok:
            forbidden, five_map = self.forbidden_map(
                state.board == 0, state.board == 1
            )
            black_legal = legal & (~forbidden | five_map).reshape(-1)
            legal = jnp.where(state.to_play == 0, black_legal, legal)

        if self.use_pro_long_opening:
            n = self.board_size
            center = (n // 2) * n + (n // 2)
            idx = jnp.arange(self.num_actions)
            rr, cc = idx // n, idx % n
            cheb = jnp.maximum(jnp.abs(rr - n // 2), jnp.abs(cc - n // 2))
            first = legal & (idx == center)
            third = legal & (cheb >= 3)
            legal = jnp.where(
                state.move_count == 0,
                first,
                jnp.where(state.move_count == 2, third, legal),
            )
        return legal

    def _three_maps(self, black, white, empty, forbidden_prev=None):
        """Per-direction open-three maps for a hypothetical black stone at
        every empty cell.

        An open three = a three that can become a straight four (pattern
        E B B B B E) in one further black move.  Detected as any 6-window
        [empty, mid4, empty] whose mid4 holds exactly 2 blacks + the candidate
        + 1 empty completion cell, no whites.  When ``forbidden_prev`` is
        given (Renju refinement), windows whose completion cell is a forbidden
        empty are not counted (gomoku_rules.cpp:952 ``is_allowed_double_three``).
        """
        maps = []
        fbad = None
        if forbidden_prev is not None:
            fbad = (empty & forbidden_prev).astype(jnp.int32)
        for dr, dc in _DIRS:
            mid4_b = _shift_plane(_window_sum(black, dr, dc, 4), dr, dc)
            mid4_w = _shift_plane(_window_sum(white, dr, dc, 4), dr, dc)
            ends = empty & _shift_plane(empty, 5 * dr, 5 * dc)
            base = ends & (mid4_b == 2) & (mid4_w == 0)
            if fbad is None:
                three = _covers(base, dr, dc, range(1, 5)) & empty
            else:
                # Candidate at offset i: remaining mid4 empties (the completion
                # cell) must not be forbidden.
                mid4_bad = _shift_plane(_window_sum(fbad, dr, dc, 4), dr, dc)
                three = jnp.zeros(black.shape, jnp.bool_)
                for i in range(1, 5):
                    bad_at_p = _shift_plane(fbad, i * dr, i * dc)
                    ok = base & (mid4_bad - bad_at_p <= 0)
                    three = three | _shift_plane(ok, -i * dr, -i * dc)
                three = three & empty
            maps.append(three)
        return maps  # list of 4 bool [N, N]

    def _four_counts(self, black, white, empty):
        """Per-direction effective four counts for a hypothetical black stone
        at every empty cell.  A four = a 5-window that after the placement has
        4 blacks + 1 empty (i.e. one more move makes five).  The two windows
        of a straight four merge into one four (Renju counting)."""
        counts = []
        ones = jnp.ones_like(black)
        for dr, dc in _DIRS:
            b5 = _window_sum(black, dr, dc, 5)
            w5 = _window_sum(white, dr, dc, 5)
            # Only fully in-bounds windows: a 5-window hanging off the edge
            # can never complete to five (round-2 fuzz-found bug — an
            # edge-truncated window with 3 blacks was counted as a four).
            in5 = _window_sum(ones, dr, dc, 5) == 5
            # Renju four = can make EXACTLY five: a black stone adjacent to
            # either window end would make the completion an overline (six),
            # which is not a five for black (second round-2 fuzz find).
            b_before = _shift_plane(black, -dr, -dc)
            b_after = _shift_plane(black, 5 * dr, 5 * dc)
            four_window = ((b5 == 3) & (w5 == 0) & in5
                           & ~b_before & ~b_after)
            cnt = jnp.zeros(black.shape, jnp.int32)
            for i in range(5):
                cnt = cnt + _shift_plane(
                    four_window.astype(jnp.int32), -i * dr, -i * dc
                )
            # Straight four: 6-window [E, mid4 (3 blacks + candidate), E].
            mid4_b = _shift_plane(_window_sum(black, dr, dc, 4), dr, dc)
            mid4_w = _shift_plane(_window_sum(white, dr, dc, 4), dr, dc)
            ends = empty & _shift_plane(empty, 5 * dr, 5 * dc)
            s4_window = ends & (mid4_b == 3) & (mid4_w == 0)
            s4 = _covers(s4_window, dr, dc, range(1, 5)) & empty
            cnt = jnp.where(s4, cnt - 1, cnt)
            counts.append(jnp.where(empty, cnt, 0))
        return counts  # list of 4 int32 [N, N]

    def forbidden_map(self, black: jax.Array, white: jax.Array):
        """Renju/Omok forbidden points for black, for every empty cell at
        once.  Returns (forbidden [N,N] bool, exact_five [N,N] bool).

        Renju (gomoku_rules.cpp:118-220): overline, double-four, double-three
        (with the allowed-double-three refinement).  Omok: overline + strict
        double-three only (gomoku_rules.cpp Omok paths).
        A placement that makes an exact five is never forbidden (five
        precedence) — callers combine via ``forbidden & ~five``.
        """
        empty = ~(black | white)
        runs = _run_through_maps(black, cap=6)
        five = jnp.any(runs == 5, axis=0) & empty
        overline = jnp.any(runs >= 6, axis=0) & empty

        threes = self._three_maps(black, white, empty)
        n_threes = sum(t.astype(jnp.int32) for t in threes)
        double_three = n_threes >= 2

        if self.use_omok and not self.use_renju:
            forbidden = (overline | double_three) & empty
            return forbidden, five

        fours = self._four_counts(black, white, empty)
        n_fours = sum(fours)
        double_four = n_fours >= 2

        forbidden = (overline | double_four | double_three) & empty
        for _ in range(_RENJU_REFINE_PASSES):
            threes = self._three_maps(black, white, empty, forbidden_prev=forbidden)
            n_threes = sum(t.astype(jnp.int32) for t in threes)
            forbidden = (overline | double_four | (n_threes >= 2)) & empty
        return forbidden, five

    # ---- observations ----------------------------------------------------

    def observation(self, state: GomokuState) -> jax.Array:
        """Enhanced 11-plane tensor (gomoku_state.cpp:207-257): [me, opp,
        black-to-move, 3x prev-black one-hot, 3x prev-white one-hot, 2x
        CoordConv]."""
        # Planes are emitted in bf16: every consumer (the flax model, the
        # bf16/int8 inference paths) casts obs to bf16 as its first op, so
        # this is numerically identical while halving the concat + leaf-eval
        # HBM traffic on the self-play hot path (obs build was ~8% of
        # per-sim cost at f32; see BENCHLOG round 2).
        dt = jnp.bfloat16
        n = self.board_size
        me = (state.board == state.to_play.astype(jnp.int8)).astype(dt)
        opp = (state.board == (1 - state.to_play).astype(jnp.int8)).astype(dt)
        black_to_move = jnp.full((n, n), 1.0, dt) * (
            state.to_play == 0
        ).astype(dt)

        def onehots(moves):  # [3] flat actions -> [3, N, N]
            idx = jnp.arange(n * n)
            planes = (idx[None, :] == moves[:, None]) & (moves[:, None] >= 0)
            return planes.reshape(3, n, n).astype(dt)

        prev_black = onehots(state.last_moves[0])
        prev_white = onehots(state.last_moves[1])
        coord_x = jnp.broadcast_to(
            (jnp.arange(n, dtype=dt) / (n - 1))[:, None], (n, n)
        )
        coord_y = jnp.broadcast_to(
            (jnp.arange(n, dtype=dt) / (n - 1))[None, :], (n, n)
        )
        return jnp.concatenate(
            [
                jnp.stack([me, opp, black_to_move]),
                prev_black,
                prev_white,
                jnp.stack([coord_x, coord_y]),
            ]
        )

    def observation_basic(self, state: GomokuState) -> jax.Array:
        """Basic 3-plane tensor (gomoku_state.cpp:811-840)."""
        return self.observation(state)[:3]

    # ---- MCTS arena packing ---------------------------------------------

    def pack_for_arena(self, state: GomokuState) -> dict:
        """Dense einsum-friendly encoding for the search arena
        (mcts/search.py): board rows bit-packed into f32 lanes (2 color
        planes x N rows, each row an exact <=2^N integer) — ~4x less HBM
        traffic per leaf gather than a bf16 cell array."""
        n = self.board_size
        w = jnp.asarray(2.0 ** jnp.arange(n), jnp.float32)
        black = (state.board == 0).astype(jnp.float32)
        white = (state.board == 1).astype(jnp.float32)
        rows = jnp.concatenate(
            [(black * w).sum(-1), (white * w).sum(-1)], axis=-1
        )  # [..., 2n]
        return {
            "rows": rows,
            "to_play": state.to_play.astype(jnp.float32),
            "last_moves": state.last_moves.astype(jnp.float32),
            "move_count": state.move_count.astype(jnp.float32),
            "terminal": state.terminal.astype(jnp.bfloat16),
            "winner": state.winner.astype(jnp.float32),
            "hash": jnp.stack(
                [
                    (state.hash >> 16).astype(jnp.float32),
                    (state.hash & jnp.uint32(0xFFFF)).astype(jnp.float32),
                ],
                axis=-1,
            ),
        }

    def unpack_from_arena(self, packed: dict) -> GomokuState:
        n = self.board_size
        w = jnp.asarray(2.0 ** jnp.arange(n), jnp.float32)
        rows = jnp.round(packed["rows"])
        rb = rows[..., :n]
        rw = rows[..., n:]
        black = jnp.floor(rb[..., :, None] / w) % 2 > 0.5
        white = jnp.floor(rw[..., :, None] / w) % 2 > 0.5
        board = jnp.where(
            black, jnp.int8(0), jnp.where(white, jnp.int8(1), jnp.int8(-1))
        )
        h = (
            (jnp.round(packed["hash"][..., 0]).astype(jnp.uint32) << 16)
            | jnp.round(packed["hash"][..., 1]).astype(jnp.uint32)
        )
        return GomokuState(
            board=board,
            to_play=jnp.round(packed["to_play"]).astype(jnp.int32),
            last_moves=jnp.round(packed["last_moves"]).astype(jnp.int32),
            move_count=jnp.round(packed["move_count"]).astype(jnp.int32),
            terminal=packed["terminal"] > 0.5,
            winner=jnp.round(packed["winner"]).astype(jnp.int32),
            hash=h,
        )

    # ---- accessors -------------------------------------------------------

    def terminal_flag(self, state: GomokuState) -> jax.Array:
        return state.terminal

    def result(self, state: GomokuState) -> jax.Array:
        from alphazero_tpu.core.types import result_from_winner

        return result_from_winner(state.winner, state.terminal)

    def to_play(self, state: GomokuState) -> jax.Array:
        return state.to_play

    def winner(self, state: GomokuState) -> jax.Array:
        return state.winner

    def position_hash(self, state: GomokuState) -> jax.Array:
        """u32 [2] situational Zobrist key (board + side to move) — the
        transposition-table identity (reference ``getHash``,
        ``gomoku_state.cpp:620``)."""
        return state.hash
