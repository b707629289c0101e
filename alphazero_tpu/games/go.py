"""Go as a pure, vmappable TPU-native environment.

Capability-parity target: the reference ``GoState``/``GoRules``
(``src/games/go/go_state.cpp``, ``go_rules.cpp``;
``include/alphazero/games/go/go_state.h:28-243``): group capture, suicide
ban, simple ko (single-stone recapture, go_state.cpp:233-236), positional
superko (go_state.cpp:837-843), pass + two-pass termination, Chinese (area)
and Japanese (territory + prisoners) scoring with komi
(go_rules.cpp:196-356), basic 3-plane and enhanced 8-plane tensors
(go_state.cpp:380-445).

TPU-first design decisions (not translations):
  * Pass is action ``N*N`` (the reference encodes it as -1 and declares the
    action space N*N+1, go_state.cpp:155-157,345 — SURVEY.md §2.2 says
    normalize; we do).
  * Flood fills (group membership, liberties, territory) are fixed-point
    masked neighbor propagations under ``lax.while_loop`` — O(diameter)
    whole-board VPU passes instead of per-cell recursion.
  * Group identity = min-cell-index propagation; per-group reductions
    (liberty counts, capture hash deltas) are ``segment_sum`` over those ids.
  * Zobrist here is *additive* (two independent uint32 lanes, mod 2^32):
    capture deltas become segment sums, which lets superko legality be
    computed for EVERY candidate move simultaneously — candidate hash =
    hash + place_key - sum(captured group keys) — with no clone-and-replay
    (the reference replays per candidate, go_state.cpp:130-187).
  * Superko history is a fixed-capacity ring (``history_len``) of board-only
    hashes; cycles longer than the ring are astronomically rare (the
    reference's O(moves) linear scan has no TPU-friendly analog;
    SURVEY.md §5 recommends exactly this ring).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from alphazero_tpu.core import zobrist
from alphazero_tpu.core.types import GameType


@struct.dataclass
class GoState:
    board: jax.Array  # int8 [N, N]: -1 empty, 0 black, 1 white
    to_play: jax.Array  # i32 scalar
    ko_point: jax.Array  # i32 scalar flat index, -1 = none
    consecutive_passes: jax.Array  # i32 scalar
    move_count: jax.Array  # i32 scalar
    prisoners: jax.Array  # i32 [2]: stones captured BY player i
    terminal: jax.Array  # bool scalar
    winner: jax.Array  # i32 scalar: -1 none/draw, 0 black, 1 white
    board_hash: jax.Array  # u32 [2] additive hash of stones only
    history: jax.Array  # u32 [H, 2] ring of past board hashes
    last_move: jax.Array  # i32 scalar flat action (-1 none; N*N = pass)


def _neighbors(x: jax.Array) -> jax.Array:
    """OR of the 4-neighborhood of a bool plane (zero fill)."""
    up = jnp.pad(x[1:], ((0, 1), (0, 0)))
    down = jnp.pad(x[:-1], ((1, 0), (0, 0)))
    left = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    right = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    return up | down | left | right


# Flood fills / label propagation are implemented as SEGMENTED SCANS along
# rows and columns (log-depth jax.lax.associative_scan) repeated for a
# static number of sweeps — dynamic while_loops over tiny bodies cost
# ~50-100us per iteration on TPU and dominated the Go step (32ms/batch);
# static scans trace to pure VPU work.  One (row, col) sweep propagates
# information along any single "L" of a path; a path with k bends needs
# ceil(k/2)+1 sweeps, and a worst-case spiral in an N x N region has ~2N-2
# bends, so N+2 sweeps are exact for any group shape.


def _seg_or_scan(x: jax.Array, region: jax.Array, axis: int) -> jax.Array:
    """Within contiguous True-runs of ``region`` along ``axis``: every cell
    gets the OR of x over its whole run (outside region -> False)."""

    def combine(a, b):
        ab, av = a
        bb, bv = b
        # bb marks a segment boundary at b's start: value does not flow.
        return ab | bb, jnp.where(bb, bv, av | bv)

    boundary = ~region

    def scan(xx, reverse):
        _, v = jax.lax.associative_scan(
            combine, (boundary, xx & region), axis=axis, reverse=reverse
        )
        return v

    return (scan(x, False) | scan(x, True)) & region


def _seg_min_scan(x: jax.Array, region: jax.Array, axis: int,
                  big: int) -> jax.Array:
    """Segmented running-min along ``axis`` (both directions) within
    region runs; outside region -> big."""

    def combine(a, b):
        ab, av = a
        bb, bv = b
        return ab | bb, jnp.where(bb, bv, jnp.minimum(av, bv))

    boundary = ~region
    xm = jnp.where(region, x, big)

    def scan(reverse):
        _, v = jax.lax.associative_scan(
            combine, (boundary, xm), axis=axis, reverse=reverse
        )
        return v

    return jnp.where(region, jnp.minimum(scan(False), scan(True)), big)


def _flood(seed: jax.Array, region: jax.Array) -> jax.Array:
    """Grow ``seed`` through ``region`` via 4-adjacency (exact)."""
    n = region.shape[0]
    x = seed & region
    for _ in range(n + 2):
        x = _seg_or_scan(x, region, axis=1)
        x = _seg_or_scan(x, region, axis=0)
    return x


def _group_ids(stones: jax.Array) -> jax.Array:
    """Min-cell-index label propagation: i32 [N, N]; each stone cell gets the
    smallest flat index in its group; non-stones get N*N (an out-of-range
    segment id)."""
    n = stones.shape[0]
    size = n * n
    idx = jnp.arange(size, dtype=jnp.int32).reshape(n, n)
    ids = jnp.where(stones, idx, size)
    for _ in range(n + 2):
        ids = _seg_min_scan(ids, stones, axis=1, big=size)
        ids = _seg_min_scan(ids, stones, axis=0, big=size)
    return jnp.where(stones, ids, size)


def _neighbor_ids(ids: jax.Array, size: int):
    """The 4 neighbor id planes of an id plane ([N,N] -> 4x[N,N]), padded
    with the out-of-range id."""
    big = size
    up = jnp.pad(ids[1:], ((0, 1), (0, 0)), constant_values=big)
    down = jnp.pad(ids[:-1], ((1, 0), (0, 0)), constant_values=big)
    left = jnp.pad(ids[:, 1:], ((0, 0), (0, 1)), constant_values=big)
    right = jnp.pad(ids[:, :-1], ((0, 0), (1, 0)), constant_values=big)
    return up, down, left, right


def _group_liberty_counts(stones: jax.Array, empty: jax.Array):
    """Per-group distinct-liberty counts.

    Returns (ids [N,N], lib_count [num_segments] i32) where ids maps each
    stone cell to its group segment id.  Each empty cell contributes one
    liberty to every *distinct* adjacent group (dedup over its 4 neighbors).
    """
    n = stones.shape[0]
    size = n * n
    ids = _group_ids(stones)
    nbr = _neighbor_ids(ids, size)

    contrib = []
    seen = []
    for i, cand in enumerate(nbr):
        fresh = jnp.ones_like(cand, dtype=bool)
        for prev in seen:
            fresh = fresh & (cand != prev)
        contrib.append(jnp.where(empty & fresh & (cand < size), cand, size))
        seen.append(cand)

    flat = jnp.stack([c.reshape(-1) for c in contrib])  # [4, size]
    counts = jax.ops.segment_sum(
        jnp.ones_like(flat, jnp.int32).reshape(-1),
        flat.reshape(-1),
        num_segments=size + 1,
    )
    return ids, counts[:size + 1]


@dataclasses.dataclass(frozen=True)
class GoEnv:
    """Static Go configuration.  ``chinese_rules`` selects area scoring
    (reference VariantArgs; go_rules.cpp:196-238 area vs :336-353 territory);
    ``komi`` defaults follow the reference (7.5)."""

    board_size: int = 9
    komi: float = 7.5
    chinese_rules: bool = True
    history_len: int = 16  # superko ring capacity
    max_moves: int | None = None

    game_type: GameType = GameType.GO

    @property
    def num_actions(self) -> int:
        return self.board_size * self.board_size + 1  # + pass

    @property
    def pass_action(self) -> int:
        return self.board_size * self.board_size

    @property
    def observation_shape(self) -> Tuple[int, int, int]:
        return (8, self.board_size, self.board_size)

    @property
    def move_limit(self) -> int:
        return self.max_moves or (2 * self.board_size * self.board_size)

    @functools.cached_property
    def zobrist(self) -> zobrist.ZobristTable:
        return zobrist.ZobristTable(
            num_pieces=2, num_positions=self.board_size * self.board_size
        )

    # ---- hashing (additive, two independent u32 lanes) -------------------

    def _keys(self, player) -> jax.Array:  # [S, 2] piece keys for a player
        return self.zobrist.piece[player]

    def _board_only_hash(self, board: jax.Array) -> jax.Array:
        s = self.board_size * self.board_size
        flat = board.reshape(-1)
        kb = jnp.where((flat == 0)[:, None], self.zobrist.piece[0], 0)
        kw = jnp.where((flat == 1)[:, None], self.zobrist.piece[1], 0)
        return (kb.astype(jnp.uint32).sum(0) + kw.astype(jnp.uint32).sum(0))

    # ---- lifecycle -------------------------------------------------------

    def init(self, key: jax.Array | None = None) -> GoState:
        n = self.board_size
        empty_h = jnp.zeros((2,), jnp.uint32)
        hist = jnp.zeros((self.history_len, 2), jnp.uint32)
        # Mark unused history slots with a sentinel that can never equal a
        # real hash sum of a non-empty board... the empty board hash (0) is
        # itself reachable only at move 0; seed slot 0 with it.
        hist = hist.at[0].set(empty_h)
        return GoState(
            board=jnp.full((n, n), -1, jnp.int8),
            to_play=jnp.zeros((), jnp.int32),
            ko_point=jnp.full((), -1, jnp.int32),
            consecutive_passes=jnp.zeros((), jnp.int32),
            move_count=jnp.zeros((), jnp.int32),
            prisoners=jnp.zeros((2,), jnp.int32),
            terminal=jnp.zeros((), jnp.bool_),
            winner=jnp.full((), -1, jnp.int32),
            board_hash=empty_h,
            history=hist,
            last_move=jnp.full((), -1, jnp.int32),
        )

    # ---- capture machinery ----------------------------------------------

    def _capture_info(self, board: jax.Array, mover: jax.Array):
        """For the current board and the side to move: per-candidate-move
        capture summaries of *opponent* groups in atari.

        Returns (cap_count [N,N] i32, cap_hash_delta [N,N,2] u32,
        single_stone_cap [N,N] bool, opp_atari_lib map helpers) where entry
        [p] describes what placing at p would capture: every adjacent
        opponent group whose single liberty is p.
        """
        n = self.board_size
        size = n * n
        opp = board == (1 - mover).astype(jnp.int8)
        empty = board == -1
        ids, lib_counts = _group_liberty_counts(opp, empty)

        # Single liberty id per group: segment-min of adjacent empty flat idx.
        nbr = _neighbor_ids(ids, size)
        idx = jnp.arange(size, dtype=jnp.int32).reshape(n, n)
        seg_ids = []
        seg_libs = []
        for cand in nbr:
            valid = empty & (cand < size)
            seg_ids.append(jnp.where(valid, cand, size).reshape(-1))
            seg_libs.append(jnp.where(valid, idx, size).reshape(-1))
        seg_ids = jnp.concatenate(seg_ids)
        seg_libs = jnp.concatenate(seg_libs)
        lib_min = jax.ops.segment_min(
            seg_libs, seg_ids, num_segments=size + 1
        )  # [size+1]

        # Per-group stone count and hash-key sum.
        flat_ids = ids.reshape(-1)
        stone = opp.reshape(-1)
        group_sizes = jax.ops.segment_sum(
            stone.astype(jnp.int32), flat_ids, num_segments=size + 1
        )
        opp_keys = self._keys(1 - mover)  # [size, 2]
        keys_masked = jnp.where(stone[:, None], opp_keys, 0).astype(jnp.uint32)
        group_keys = jax.ops.segment_sum(
            keys_masked, flat_ids, num_segments=size + 1
        )  # [size+1, 2]

        in_atari = lib_counts == 1  # per segment id

        # For each candidate cell p: adjacent distinct opponent groups whose
        # single liberty is exactly p.
        cap_count = jnp.zeros((n, n), jnp.int32)
        cap_keys = jnp.zeros((n, n, 2), jnp.uint32)
        single_stone = jnp.zeros((n, n), jnp.int32)
        seen = []
        for cand in nbr:
            fresh = jnp.ones_like(cand, dtype=bool)
            for prev in seen:
                fresh = fresh & (cand != prev)
            seen.append(cand)
            gid = jnp.clip(cand, 0, size)
            qual = (
                fresh
                & (cand < size)
                & in_atari[gid]
                & (lib_min[gid] == idx)
            )
            cap_count = cap_count + jnp.where(qual, group_sizes[gid], 0)
            cap_keys = cap_keys + jnp.where(
                qual[..., None], group_keys[gid], 0
            ).astype(jnp.uint32)
            single_stone = single_stone + jnp.where(
                qual & (group_sizes[gid] == 1), 1, 0
            )
        return cap_count, cap_keys, single_stone, (ids, lib_counts, lib_min)

    def _own_safety(self, board: jax.Array, mover: jax.Array, cap_count):
        """bool [N,N]: placing at each empty cell leaves the new own group
        with at least one liberty (not suicide).  Exact: a placement is safe
        iff it has an empty neighbor, captures something, or joins an own
        group with >= 2 liberties."""
        n = self.board_size
        size = n * n
        own = board == mover.astype(jnp.int8)
        empty = board == -1
        has_empty_nbr = _neighbors(empty)

        ids, lib_counts = _group_liberty_counts(own, empty)
        nbr = _neighbor_ids(ids, size)
        own_roomy = jnp.zeros((n, n), dtype=bool)
        for cand in nbr:
            gid = jnp.clip(cand, 0, size)
            own_roomy = own_roomy | ((cand < size) & (lib_counts[gid] >= 2))
        return has_empty_nbr | (cap_count > 0) | own_roomy

    # ---- step ------------------------------------------------------------

    def step(self, state: GoState, action: jax.Array) -> GoState:
        n = self.board_size
        size = n * n
        action = action.astype(jnp.int32)
        mover = state.to_play
        is_pass = action >= size
        r = jnp.clip(action, 0, size - 1) // n
        c = jnp.clip(action, 0, size - 1) % n

        cap_count, cap_keys, _, _ = self._capture_info(state.board, mover)
        ccount = jnp.where(is_pass, 0, cap_count[r, c])
        ckeys = jnp.where(is_pass, 0, cap_keys[r, c]).astype(jnp.uint32)

        # Remove captured groups: opponent stones with 0 liberties after the
        # placement == groups whose single liberty was the played point.
        opp_val = (1 - mover).astype(jnp.int8)
        board1 = jnp.where(
            is_pass, state.board, state.board.at[r, c].set(mover.astype(jnp.int8))
        )
        opp = board1 == opp_val
        empty1 = board1 == -1
        # libertyless opponent stones (global check == local: only groups
        # adjacent to the new stone can newly lose their last liberty).
        with_lib = _flood(opp & _neighbors(empty1), opp)
        captured = opp & ~with_lib & ~is_pass
        board2 = jnp.where(captured, jnp.int8(-1), board1)

        # Hash update (additive): + placed key - captured keys.
        place_key = jnp.where(
            is_pass,
            jnp.zeros((2,), jnp.uint32),
            self._keys(mover)[jnp.clip(action, 0, size - 1)],
        )
        new_board_hash = state.board_hash + place_key - ckeys

        # Simple ko: captured exactly one stone and the placed stone's group
        # is that single stone with a single liberty (go_state.cpp:233-236).
        placed_group = _flood(
            jnp.zeros((n, n), bool).at[r, c].set(~is_pass),
            board2 == mover.astype(jnp.int8),
        )
        placed_group_size = placed_group.sum()
        placed_libs = (_neighbors(placed_group) & (board2 == -1)).sum()
        cap_cell = jnp.argmax(captured.reshape(-1))  # the single captured cell
        ko = (
            (~is_pass)
            & (ccount == 1)
            & (placed_group_size == 1)
            & (placed_libs == 1)
        )
        ko_point = jnp.where(ko, cap_cell.astype(jnp.int32), -1)

        passes = jnp.where(is_pass, state.consecutive_passes + 1, 0)
        move_count = state.move_count + 1
        terminal = (passes >= 2) | (move_count >= self.move_limit)

        prisoners = state.prisoners.at[mover].add(ccount)

        # Scoring at termination.
        sb, sw = self._scores(board2, prisoners)
        winner = jnp.where(
            ~terminal,
            -1,
            jnp.where(sb > sw, 0, jnp.where(sw > sb, 1, -1)),
        ).astype(jnp.int32)

        hist = state.history.at[move_count % self.history_len].set(
            new_board_hash
        )

        new_state = GoState(
            board=board2,
            to_play=1 - mover,
            ko_point=ko_point,
            consecutive_passes=passes,
            move_count=move_count,
            prisoners=prisoners,
            terminal=terminal,
            winner=winner,
            board_hash=new_board_hash,
            history=hist,
            last_move=action,
        )
        return jax.tree_util.tree_map(
            lambda old, new: jnp.where(state.terminal, old, new), state, new_state
        )

    # ---- legality --------------------------------------------------------

    def legal_mask(self, state: GoState) -> jax.Array:
        """bool [N*N + 1].  Occupancy + suicide + simple-ko + positional
        superko (vs the history ring), computed for all candidates at once.
        Pass is always legal while the game runs (go_state.cpp:155-157)."""
        n = self.board_size
        size = n * n
        board = state.board
        mover = state.to_play
        empty = board == -1

        cap_count, cap_keys, _, _ = self._capture_info(board, mover)
        safe = self._own_safety(board, mover, cap_count)

        # Candidate board hash after placing at p (and its captures).
        place_keys = self._keys(mover).reshape(n, n, 2)
        cand_hash = (
            state.board_hash[None, None, :] + place_keys - cap_keys
        )  # [N, N, 2] (uint32 wrap-around arithmetic)

        # Positional superko: candidate hash must not equal any ring entry.
        hist = state.history  # [H, 2]
        repeats = jnp.any(
            jnp.all(cand_hash[:, :, None, :] == hist[None, None, :, :], axis=-1),
            axis=-1,
        )  # [N, N]
        # Only ring slots written so far are valid comparisons; slots beyond
        # move_count hold zeros == the empty-board hash, which a stone
        # placement can never recreate... except by capture to empty board —
        # vanishingly rare and safe (it would just forbid recreating an empty
        # board, which IS a superko violation anyway).

        ko_plane = (
            jnp.arange(size).reshape(n, n) == state.ko_point
        )

        playable = empty & safe & ~ko_plane & ~repeats
        moves = playable.reshape(-1) & ~state.terminal
        pass_legal = ~state.terminal
        return jnp.concatenate([moves, pass_legal[None]])

    # ---- scoring ---------------------------------------------------------

    def _territory(self, board: jax.Array):
        empty = board == -1
        black = board == 0
        white = board == 1
        reach_b = _flood(empty & _neighbors(black), empty)
        reach_w = _flood(empty & _neighbors(white), empty)
        terr_b = empty & reach_b & ~reach_w
        terr_w = empty & reach_w & ~reach_b
        return terr_b, terr_w

    def _scores(self, board: jax.Array, prisoners: jax.Array):
        """(score_black, score_white) under the configured ruleset
        (go_rules.cpp:196-238 area; :336-356 territory + prisoners + komi)."""
        terr_b, terr_w = self._territory(board)
        if self.chinese_rules:
            sb = terr_b.sum() + (board == 0).sum()
            sw = terr_w.sum() + (board == 1).sum()
        else:
            sb = terr_b.sum() + prisoners[0]
            sw = terr_w.sum() + prisoners[1]
        return sb.astype(jnp.float32), sw.astype(jnp.float32) + self.komi

    def score(self, state: GoState, dead_stones: jax.Array | None = None):
        """(score_black, score_white); ``dead_stones`` (bool [N,N]) marks
        stones agreed dead — they are removed before territory counting and
        credited as prisoners (reference dead-stone marking + calculateScore,
        go_state.cpp:766, go_rules.cpp:336-353)."""
        if dead_stones is None:
            return self._scores(state.board, state.prisoners)
        board = jnp.where(dead_stones, jnp.int8(-1), state.board)
        dead_black = (dead_stones & (state.board == 0)).sum()
        dead_white = (dead_stones & (state.board == 1)).sum()
        prisoners = state.prisoners.at[0].add(dead_white).at[1].add(
            dead_black
        )
        return self._scores(board, prisoners)

    def territory_ownership(self, state: GoState) -> jax.Array:
        """int8 [N,N]: -1 neutral, 0 black territory, 1 white (reference
        getTerritoryOwnership, go_state.cpp:732)."""
        terr_b, terr_w = self._territory(state.board)
        return jnp.where(
            terr_b, jnp.int8(0), jnp.where(terr_w, jnp.int8(1), jnp.int8(-1))
        )

    # ---- observations ----------------------------------------------------

    def observation(self, state: GoState) -> jax.Array:
        """Enhanced 8-plane tensor (go_state.cpp:380-445): [me, opp,
        black-to-move, my-group-liberties/10, opp-group-liberties/10,
        ko plane, 2x border-distance]."""
        n = self.board_size
        size = n * n
        board = state.board
        me_val = state.to_play.astype(jnp.int8)
        me = (board == me_val).astype(jnp.float32)
        opp = (board == (1 - me_val)).astype(jnp.float32)
        black_to_move = jnp.full((n, n), 1.0, jnp.float32) * (
            state.to_play == 0
        ).astype(jnp.float32)

        empty = board == -1

        def lib_plane(stones):
            ids, lib_counts = _group_liberty_counts(stones, empty)
            gid = jnp.clip(ids, 0, size)
            libs = jnp.where(stones, lib_counts[gid], 0)
            return jnp.clip(libs.astype(jnp.float32) / 10.0, 0.0, 1.0)

        libs_me = lib_plane(board == me_val)
        libs_opp = lib_plane(board == (1 - me_val))

        ko_plane = (
            jnp.arange(size).reshape(n, n) == state.ko_point
        ).astype(jnp.float32)

        rows = jnp.arange(n, dtype=jnp.float32)
        dist = jnp.minimum(rows, rows[::-1]) / jnp.maximum((n - 1) / 2, 1)
        border_r = jnp.broadcast_to(dist[:, None], (n, n))
        border_c = jnp.broadcast_to(dist[None, :], (n, n))

        return jnp.stack(
            [me, opp, black_to_move, libs_me, libs_opp, ko_plane,
             border_r, border_c]
        )

    def observation_basic(self, state: GoState) -> jax.Array:
        return self.observation(state)[:3]

    # ---- MCTS arena packing ---------------------------------------------

    def pack_for_arena(self, state: GoState) -> dict:
        """Bitboard rows + 16-bit hash splits for the search arena
        (see games/gomoku.py pack_for_arena)."""
        n = self.board_size
        w = jnp.asarray(2.0 ** jnp.arange(n), jnp.float32)
        black = (state.board == 0).astype(jnp.float32)
        white = (state.board == 1).astype(jnp.float32)
        rows = jnp.concatenate(
            [(black * w).sum(-1), (white * w).sum(-1)], axis=-1
        )

        def u32_split(x):
            return jnp.stack(
                [(x >> 16).astype(jnp.float32),
                 (x & jnp.uint32(0xFFFF)).astype(jnp.float32)], axis=-1
            )

        return {
            "rows": rows,
            "to_play": state.to_play.astype(jnp.float32),
            "ko": state.ko_point.astype(jnp.float32),
            "passes": state.consecutive_passes.astype(jnp.float32),
            "move_count": state.move_count.astype(jnp.float32),
            "prisoners": state.prisoners.astype(jnp.float32),
            "terminal": state.terminal.astype(jnp.bfloat16),
            "winner": state.winner.astype(jnp.float32),
            "hash": u32_split(state.board_hash),
            "history": u32_split(state.history),
            "last": state.last_move.astype(jnp.float32),
        }

    def unpack_from_arena(self, packed: dict) -> GoState:
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

        def u32_join(p):
            return (
                (jnp.round(p[..., 0]).astype(jnp.uint32) << 16)
                | jnp.round(p[..., 1]).astype(jnp.uint32)
            )

        return GoState(
            board=board,
            to_play=jnp.round(packed["to_play"]).astype(jnp.int32),
            ko_point=jnp.round(packed["ko"]).astype(jnp.int32),
            consecutive_passes=jnp.round(packed["passes"]).astype(jnp.int32),
            move_count=jnp.round(packed["move_count"]).astype(jnp.int32),
            prisoners=jnp.round(packed["prisoners"]).astype(jnp.int32),
            terminal=packed["terminal"] > 0.5,
            winner=jnp.round(packed["winner"]).astype(jnp.int32),
            board_hash=u32_join(packed["hash"]),
            history=u32_join(packed["history"]),
            last_move=jnp.round(packed["last"]).astype(jnp.int32),
        )

    # ---- accessors -------------------------------------------------------

    def terminal_flag(self, state: GoState) -> jax.Array:
        return state.terminal

    def result(self, state: GoState) -> jax.Array:
        from alphazero_tpu.core.types import result_from_winner

        return result_from_winner(state.winner, state.terminal)

    def to_play(self, state: GoState) -> jax.Array:
        return state.to_play

    def winner(self, state: GoState) -> jax.Array:
        return state.winner
