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
  * Flood fills (group membership, liberties, territory) are matrix-squaring
    reachability on the MXU — ceil(log2(N^2)) batched [N^2, N^2] bf16
    matmuls give exact connected components (see the note above
    ``_reach_matrix``); per-group reductions (liberty counts, sizes, capture
    hash deltas) become per-cell matmul-derived quantities (``GroupStats``).
  * Zobrist here is *additive* (two independent uint32 lanes, mod 2^32):
    capture deltas become masked key sums, which lets superko legality be
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
from typing import NamedTuple, Tuple

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


# Connectivity (group membership, liberties, territory) is computed by
# MATRIX-SQUARING REACHABILITY on the MXU: mask the static 4-adjacency
# matrix A [S, S] to the region, add self-loops, then square log2(S) times
# with a {0,1} threshold after each squaring — M_k covers all paths of
# length <= 2^k, so ceil(log2(S)) squarings give exact connected
# components.  Each squaring is one batched [S, S] @ [S, S] bf16 matmul
# (f32 accumulate; entries are exact counts <= S < 2^8).  This replaced an
# earlier segmented-scan formulation (log-depth associative_scan sweeps):
# measured on v5e at B=1024, go9 per-simulation cost dropped from 162 ms to
# a few ms — hundreds of small VPU scan kernels become ~8 MXU matmuls per
# reachability query, and per-group segment reductions become per-cell
# matmul-derived quantities (no batched scatter/segment_sum anywhere).


@functools.lru_cache(maxsize=None)
def _adjacency_np(n: int) -> np.ndarray:
    """Static 4-neighborhood adjacency over flat cells: bool [S, S]."""
    S = n * n
    A = np.zeros((S, S), np.bool_)
    for r in range(n):
        for c in range(n):
            q = r * n + c
            if r > 0:
                A[q, q - n] = True
            if r < n - 1:
                A[q, q + n] = True
            if c > 0:
                A[q, q - 1] = True
            if c < n - 1:
                A[q, q + 1] = True
    return A


@functools.lru_cache(maxsize=None)
def _n_squarings(size: int) -> int:
    k, span = 0, 1
    while span < size - 1:  # longest simple path <= size-1 edges
        span *= 2
        k += 1
    return k


def _reach_matrix(region_flat: jax.Array) -> jax.Array:
    """bool [S, S]: reachability via 4-adjacency *within* ``region_flat``
    ([S] bool), self-loops included on region cells.

    int8 squarings (int32 accumulate, entries are {0,1} / exact counts
    <= S): the v5e int8 MXU path runs these [S,S] matmuls at ~2x bf16 —
    at 19x19 the squaring chain is the dominant per-simulation FLOP cost
    (BENCHLOG round 2)."""
    S = region_flat.shape[0]
    n = int(round(S ** 0.5))
    A = jnp.asarray(_adjacency_np(n))
    M = (A & region_flat[None, :] & region_flat[:, None]) | (
        jnp.eye(S, dtype=bool) & region_flat[None, :]
    )
    Mi = M.astype(jnp.int8)
    for _ in range(_n_squarings(S)):
        Mi = (
            jnp.matmul(Mi, Mi, preferred_element_type=jnp.int32) > 0
        ).astype(jnp.int8)
    return Mi > 0


def _or_flood(seed: jax.Array, region: jax.Array) -> jax.Array:
    """Grow ``seed`` through ``region`` via iterated 4-neighbor OR until
    fixpoint (exact; convergence-checked while_loop).  For pure membership
    floods this replaces the [S,S] reachability matmuls entirely: per
    iteration it is a few elementwise ops on the [N,N] plane, and under
    vmap the loop runs until every lane converges (iterations = max group
    diameter across the batch, typically far below the N*N-1 worst case)."""

    def cond(c):
        return c[1]

    def body(c):
        x, _ = c
        nx = x | (_neighbors(x) & region)
        return nx, jnp.any(nx != x)

    x0 = seed & region
    out, _ = jax.lax.while_loop(cond, body, (x0, jnp.any(x0)))
    return out


def _flood(seed: jax.Array, region: jax.Array) -> jax.Array:
    """Grow ``seed`` through ``region`` via 4-adjacency (exact)."""
    return _or_flood(seed & region, region)


def _min_label_flood(stones: jax.Array) -> jax.Array:
    """i32 [N, N]: per-cell minimum flat index of the cell's 4-connected
    stone group; non-stones get N*N.  Iterated neighbor-min label
    propagation to fixpoint — a handful of elementwise [N, N] VPU ops per
    iteration (iterations = max group "label diameter" across the vmapped
    batch, typically 10-30), replacing the 2*ceil(log2(S)) [S, S] int8
    matrix squarings that dominated go19 per-simulation cost (round 3;
    the [S, S] reachability matmul chain was ~9x the FLOPs of the single
    group-aggregation matmul that remains in _cell_group_stats)."""
    n = stones.shape[0]
    big = jnp.int32(n * n)
    idx = jnp.arange(n * n, dtype=jnp.int32).reshape(n, n)
    ids0 = jnp.where(stones, idx, big)

    def scan_dir(x, axis, reverse):
        # Segmented cumulative min within contiguous stone runs along one
        # axis/direction: non-stone cells reset the run (boundary=True).
        v = jnp.where(stones, x, big)
        b = ~stones

        def comb(a, c):
            v1, b1 = a
            v2, b2 = c
            return (jnp.where(b2, v2, jnp.minimum(v1, v2)), b1 | b2)

        vv, _ = jax.lax.associative_scan(
            comb, (v, b), axis=axis, reverse=reverse
        )
        return vv

    def cond(c):
        return c[1]

    def body(c):
        # One iteration propagates the min label along ENTIRE straight
        # stone runs (4 segmented scans, each O(log n) elementwise steps),
        # so convergence takes ~(#direction-changes on the worst min-label
        # path) iterations — bounded by ~2n for any board, vs the O(n^2)
        # worst case of single-step neighbor-min on snake-shaped dragons
        # (advisor round 3).  Under vmap every lane pays the slowest
        # lane's count, so the tail bound matters.
        x, _ = c
        nx = x
        for axis in (0, 1):
            for rev in (False, True):
                nx = jnp.minimum(nx, scan_dir(nx, axis, rev))
        nx = jnp.where(stones, nx, big)
        return nx, jnp.any(nx != x)

    out, _ = jax.lax.while_loop(cond, body, (ids0, jnp.any(stones)))
    return out


def _group_ids(stones: jax.Array) -> jax.Array:
    """i32 [N, N]; each stone cell gets the smallest flat index in its
    group; non-stones get N*N (an out-of-range segment id)."""
    return _min_label_flood(stones)


class GroupStats(NamedTuple):
    """Per-CELL group quantities (flat [S] arrays; non-stone cells get the
    neutral values noted).  Replaces per-segment ``segment_sum`` tables —
    every consumer lookup ``table[gid[q]]`` becomes a direct per-cell read."""

    ids: jax.Array  # i32 [S] min flat index of the cell's group; S if empty
    libs: jax.Array  # i32 [S] distinct liberties of the cell's group; 0
    libpos: jax.Array  # i32 [S] smallest liberty index; S if none
    size: jax.Array  # i32 [S] stones in the cell's group; 0
    keysum: jax.Array | None  # u32 [S, 2] additive key sum of the group


def _cell_group_stats(
    stones_flat: jax.Array, empty_flat: jax.Array, keys: jax.Array | None = None
) -> GroupStats:
    S = stones_flat.shape[0]
    n = int(round(S ** 0.5))
    A = jnp.asarray(_adjacency_np(n))
    arange = jnp.arange(S, dtype=jnp.int32)

    # Group membership from min-label propagation (VPU) instead of the
    # [S, S] matrix-squaring chain: reach[q, r] <=> same finite label.
    ids = _min_label_flood(stones_flat.reshape(n, n)).reshape(-1)
    reach = (
        (ids[:, None] == ids[None, :])
        & stones_flat[None, :] & stones_flat[:, None]
    )  # [S, S]

    # Liberty indicator: cell q's group reaches stone r adjacent to empty e.
    adj_empty = A & empty_flat[None, :]
    lib_ind = (
        jnp.matmul(
            reach.astype(jnp.int8), adj_empty.astype(jnp.int8),
            preferred_element_type=jnp.int32,
        )
        > 0
    )  # [S, S]
    libs = jnp.where(stones_flat, lib_ind.sum(-1).astype(jnp.int32), 0)
    libpos = jnp.where(
        stones_flat,
        jnp.where(lib_ind, arange[None, :], S).min(-1),
        S,
    )
    size = jnp.where(stones_flat, reach.sum(-1).astype(jnp.int32), 0)

    keysum = None
    if keys is not None:
        # u32 keys split into 16-bit halves; sums <= S * 2^16 < 2^23 are
        # exact in f32 (HIGHEST precision forces true-f32 MXU passes), then
        # recombined mod 2^32 (u32 wrap matches additive-hash semantics).
        halves = jnp.stack(
            [
                (keys[:, 0] >> 16).astype(jnp.float32),
                (keys[:, 0] & jnp.uint32(0xFFFF)).astype(jnp.float32),
                (keys[:, 1] >> 16).astype(jnp.float32),
                (keys[:, 1] & jnp.uint32(0xFFFF)).astype(jnp.float32),
            ],
            axis=-1,
        )  # [S, 4]
        masked = jnp.where(stones_flat[:, None], halves, 0.0)
        sums = jnp.matmul(
            reach.astype(jnp.float32), masked,
            precision=jax.lax.Precision.HIGHEST,
        )  # [S, 4]
        u = sums.astype(jnp.uint32)
        keysum = jnp.stack(
            [(u[:, 0] << 16) + u[:, 1], (u[:, 2] << 16) + u[:, 3]], axis=-1
        )
        keysum = jnp.where(stones_flat[:, None], keysum, 0)
    return GroupStats(ids=ids, libs=libs, libpos=libpos, size=size,
                      keysum=keysum)


def _shift_fill(x: jax.Array, dr: int, dc: int, fill) -> jax.Array:
    """out[r, c] = x[r + dr, c + dc] with constant fill (static shifts);
    supports trailing channel dims."""
    pads = [(0, 0)] * x.ndim
    if dr > 0:
        y = jnp.pad(x[dr:], [(0, dr)] + pads[1:], constant_values=fill)
    elif dr < 0:
        y = jnp.pad(x[:dr], [(-dr, 0)] + pads[1:], constant_values=fill)
    else:
        y = x
    if dc > 0:
        y = jnp.pad(y[:, dc:], [(0, 0), (0, dc)] + pads[2:],
                    constant_values=fill)
    elif dc < 0:
        y = jnp.pad(y[:, :dc], [(0, 0), (-dc, 0)] + pads[2:],
                    constant_values=fill)
    return y


_STEPS4 = ((-1, 0), (1, 0), (0, -1), (0, 1))


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
        s = self.board_size * self.board_size
        # feature 0 = ko point (cardinality S+1; value S = "no ko"), used
        # only by position_hash — the superko history ring keys (piece/
        # player tables) are unchanged by its presence.
        return zobrist.ZobristTable(
            num_pieces=2, num_positions=s,
            num_features=1, feature_cardinality=s + 1,
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
        empty = board == -1
        stats_b, stats_w = self._color_stats(board)
        # Opponent-of-mover per-cell stats (both colors computed so the
        # identical subexpressions CSE with _own_safety and observation).
        opp_stats = jax.tree_util.tree_map(
            lambda b, w: jnp.where(mover == 0, w, b), stats_b, stats_w
        )

        idx = jnp.arange(size, dtype=jnp.int32).reshape(n, n)
        idsp = opp_stats.ids.reshape(n, n)
        atarip = (opp_stats.libs == 1).reshape(n, n)
        libposp = opp_stats.libpos.reshape(n, n)
        sizep = opp_stats.size.reshape(n, n)
        keyp = opp_stats.keysum.reshape(n, n, 2)

        # For each candidate cell p: adjacent distinct opponent groups whose
        # single liberty is exactly p (all via static neighbor shifts).
        cap_count = jnp.zeros((n, n), jnp.int32)
        cap_keys = jnp.zeros((n, n, 2), jnp.uint32)
        single_stone = jnp.zeros((n, n), jnp.int32)
        seen = []
        for dr, dc in _STEPS4:
            cand = _shift_fill(idsp, dr, dc, size)
            fresh = jnp.ones_like(cand, dtype=bool)
            for prev in seen:
                fresh = fresh & (cand != prev)
            seen.append(cand)
            qual = (
                fresh
                & (cand < size)  # neighbor is an opponent stone
                & _shift_fill(atarip, dr, dc, False)
                & (_shift_fill(libposp, dr, dc, size) == idx)
            )
            cap_count = cap_count + jnp.where(
                qual, _shift_fill(sizep, dr, dc, 0), 0
            )
            cap_keys = cap_keys + jnp.where(
                qual[..., None],
                _shift_fill(keyp, dr, dc, 0),
                0,
            ).astype(jnp.uint32)
            single_stone = single_stone + jnp.where(
                qual & (_shift_fill(sizep, dr, dc, 0) == 1), 1, 0
            )
        return cap_count, cap_keys, single_stone, (stats_b, stats_w)

    def _color_stats(self, board: jax.Array):
        """Per-cell GroupStats for black and for white stones of ``board``.
        Computing both (rather than mover-selected masks) makes the jaxprs
        of step/legal_mask/observation share subexpressions for XLA CSE."""
        empty = (board == -1).reshape(-1)
        stats_b = _cell_group_stats(
            (board == 0).reshape(-1), empty, self._keys(0)
        )
        stats_w = _cell_group_stats(
            (board == 1).reshape(-1), empty, self._keys(1)
        )
        return stats_b, stats_w

    def _own_safety(self, board: jax.Array, mover: jax.Array, cap_count):
        """bool [N,N]: placing at each empty cell leaves the new own group
        with at least one liberty (not suicide).  Exact: a placement is safe
        iff it has an empty neighbor, captures something, or joins an own
        group with >= 2 liberties."""
        n = self.board_size
        size = n * n
        empty = board == -1
        has_empty_nbr = _neighbors(empty)

        stats_b, stats_w = self._color_stats(board)
        own_stats = jax.tree_util.tree_map(
            lambda b, w: jnp.where(mover == 0, b, w), stats_b, stats_w
        )
        roomy_cell = (
            (own_stats.ids < size) & (own_stats.libs >= 2)
        ).reshape(n, n)
        own_roomy = jnp.zeros((n, n), dtype=bool)
        for dr, dc in _STEPS4:
            own_roomy = own_roomy | _shift_fill(roomy_cell, dr, dc, False)
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

        # Place the stone (one-hot select; no batched scatter), then remove
        # opponent groups left with 0 liberties — only groups adjacent to
        # the new stone can newly lose their last liberty, so the global
        # libertyless check equals the local capture rule.
        oh_flat = jnp.arange(size, dtype=jnp.int32) == jnp.clip(
            action, 0, size - 1
        )
        oh_cell = (oh_flat & ~is_pass).reshape(n, n)
        opp_val = (1 - mover).astype(jnp.int8)
        board1 = jnp.where(oh_cell, mover.astype(jnp.int8), state.board)
        opp1 = board1 == opp_val
        empty1 = board1 == -1
        # Capture = opponent stones whose group reaches no liberty.  Pure
        # membership flood (OR-propagation to fixpoint) — no [S,S]
        # reachability needed (the go19 rewrite; BENCHLOG round 2).
        alive = _or_flood(opp1 & _neighbors(empty1), opp1)
        captured = (opp1 & ~alive) & ~is_pass
        board2 = jnp.where(captured, jnp.int8(-1), board1)
        ccount = captured.sum()

        # Hash update (additive): + placed key - captured keys.  Key lookups
        # are one-hot/masked sums, never per-lane gathers.
        keys_me = jnp.where(mover == 0, self._keys(0), self._keys(1))
        keys_opp = jnp.where(mover == 0, self._keys(1), self._keys(0))
        place_key = (
            keys_me * oh_cell.reshape(-1)[:, None].astype(jnp.uint32)
        ).sum(0)
        ckeys = (
            keys_opp * captured.reshape(-1)[:, None].astype(jnp.uint32)
        ).sum(0)
        new_board_hash = state.board_hash + place_key - ckeys

        # Simple ko: captured exactly one stone and the placed stone's group
        # is that single stone with a single liberty (go_state.cpp:233-236).
        # Single-group queries via flood from the placed stone — size and
        # distinct-liberty count need no per-cell group tables here.
        own2 = board2 == mover.astype(jnp.int8)
        empty2 = board2 == -1
        placed_group = _or_flood(oh_cell & own2, own2)
        placed_group_size = placed_group.sum()
        placed_libs = (_neighbors(placed_group) & empty2).sum()
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

        prisoners = state.prisoners + jnp.where(
            jnp.arange(2, dtype=jnp.int32) == mover, ccount, 0
        )

        # Scoring at termination.
        sb, sw = self._scores(board2, prisoners)
        winner = jnp.where(
            ~terminal,
            -1,
            jnp.where(sb > sw, 0, jnp.where(sw > sb, 1, -1)),
        ).astype(jnp.int32)

        slot = move_count % self.history_len
        hist = jnp.where(
            (jnp.arange(self.history_len, dtype=jnp.int32) == slot)[:, None],
            new_board_hash[None, :], state.history,
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
        place_keys = jnp.where(
            mover == 0, self._keys(0), self._keys(1)
        ).reshape(n, n, 2)
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
        reach_b = _or_flood(_neighbors(board == 0) & empty, empty)
        reach_w = _or_flood(_neighbors(board == 1) & empty, empty)
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
        # bf16 planes: consumers cast to bf16 anyway; halves obs HBM
        # traffic on the leaf-eval hot path (see games/gomoku.observation).
        dt = jnp.bfloat16
        n = self.board_size
        size = n * n
        board = state.board
        me_val = state.to_play.astype(jnp.int8)
        me = (board == me_val).astype(dt)
        opp = (board == (1 - me_val)).astype(dt)
        black_to_move = jnp.full((n, n), 1.0, dt) * (
            state.to_play == 0
        ).astype(dt)

        empty = board == -1

        stats_b, stats_w = self._color_stats(board)

        def lib_plane(stats):
            libs = stats.libs.reshape(n, n)
            return jnp.clip(libs.astype(dt) / 10.0, 0.0, 1.0)

        libs_me = jnp.where(
            state.to_play == 0, lib_plane(stats_b), lib_plane(stats_w)
        )
        libs_opp = jnp.where(
            state.to_play == 0, lib_plane(stats_w), lib_plane(stats_b)
        )

        ko_plane = (
            jnp.arange(size).reshape(n, n) == state.ko_point
        ).astype(dt)

        rows = jnp.arange(n, dtype=dt)
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

    def position_hash(self, state: GoState) -> jax.Array:
        """u32 [2] situational Zobrist key: stones + side to move + ko
        point — the transposition-table identity (the reference's Go
        ``getHash`` likewise mixes board, player and ko,
        ``go_state.cpp`` hashing).  Additive u32 semantics match the
        board hash; the ko contribution uses the feature table (slot 0,
        cardinality S+1; value S = "no ko")."""
        s = self.board_size * self.board_size
        ko = jnp.where(state.ko_point >= 0, state.ko_point, s)
        return (
            state.board_hash
            + self.zobrist.player_key(state.to_play)
            + self.zobrist.feature_key(0, ko)
        )
