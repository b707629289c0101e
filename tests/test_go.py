"""Go environment tests: capture, ko, superko, suicide, scoring.

Modeled on the reference suite (tests/games/go/go_state_test.cpp — capture,
ko; SURVEY.md §4) plus superko-ring cases the reference checks by replay.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.games.go import GoEnv, GoState


@functools.lru_cache(maxsize=None)
def jstep(env):
    return jax.jit(env.step)


@functools.lru_cache(maxsize=None)
def jlegal(env):
    return jax.jit(env.legal_mask)


def play(env, moves):
    step = jstep(env)
    s = env.init()
    for m in moves:
        s = step(s, jnp.asarray(m))
    return s


def rc(n, r, c):
    return r * n + c


ENV5 = GoEnv(board_size=5)
PASS5 = ENV5.pass_action


class TestBasics:
    def test_init(self):
        s = ENV5.init()
        assert not bool(s.terminal)
        legal = jlegal(ENV5)(s)
        assert legal.shape == (26,)
        assert bool(jnp.all(legal))  # all points + pass

    def test_stone_placement_and_alternation(self):
        s = play(ENV5, [rc(5, 2, 2), rc(5, 1, 1)])
        assert int(s.board[2, 2]) == 0
        assert int(s.board[1, 1]) == 1
        assert int(s.to_play) == 0

    def test_pass_always_legal_and_two_pass_ends(self):
        s = play(ENV5, [rc(5, 2, 2), PASS5])
        assert not bool(s.terminal)
        assert int(s.consecutive_passes) == 1
        s = jstep(ENV5)(s, jnp.asarray(PASS5))
        assert bool(s.terminal)

    def test_pass_resets_on_move(self):
        s = play(ENV5, [PASS5, rc(5, 1, 1), PASS5])
        assert int(s.consecutive_passes) == 1
        s = jstep(ENV5)(s, jnp.asarray(rc(5, 3, 3)))
        assert int(s.consecutive_passes) == 0


class TestCapture:
    def test_single_stone_capture(self):
        # White at (1,1) surrounded by black.
        n = 5
        moves = [
            rc(n, 0, 1), rc(n, 1, 1),  # B, W
            rc(n, 1, 0), rc(n, 4, 4),
            rc(n, 1, 2), rc(n, 4, 3),
            rc(n, 2, 1),  # captures
        ]
        s = play(ENV5, moves)
        assert int(s.board[1, 1]) == -1
        assert int(s.prisoners[0]) == 1

    def test_group_capture(self):
        # White pair (1,1),(1,2) captured.
        n = 5
        moves = [
            rc(n, 0, 1), rc(n, 1, 1),
            rc(n, 0, 2), rc(n, 1, 2),
            rc(n, 1, 0), rc(n, 4, 4),
            rc(n, 2, 1), rc(n, 4, 3),
            rc(n, 2, 2), rc(n, 4, 2),
            rc(n, 1, 3),  # captures both
        ]
        s = play(ENV5, moves)
        assert int(s.board[1, 1]) == -1
        assert int(s.board[1, 2]) == -1
        assert int(s.prisoners[0]) == 2

    def test_corner_capture(self):
        n = 5
        moves = [
            rc(n, 0, 1), rc(n, 0, 0),
            rc(n, 1, 0),  # captures corner white
        ]
        s = play(ENV5, moves)
        assert int(s.board[0, 0]) == -1

    def test_capture_restores_liberties(self):
        """Black stone in atari escapes by capturing."""
        n = 5
        # B at (0,0); W at (0,1),(1,1); B at (1,0): B group 2 stones 1 lib
        # (2,0 only? libs: (2,0) and... W then plays (2,0) -> would capture
        # unless B captures first.
        moves = [
            rc(n, 0, 0), rc(n, 0, 1),
            rc(n, 1, 0), rc(n, 1, 1),
            rc(n, 4, 4), rc(n, 2, 0),  # W captures the black pair
        ]
        s = play(ENV5, moves)
        assert int(s.board[0, 0]) == -1
        assert int(s.board[1, 0]) == -1
        assert int(s.prisoners[1]) == 2


class TestSuicide:
    def test_suicide_illegal(self):
        # Point (0,0) surrounded by white -> black cannot play there.
        n = 5
        moves = [
            rc(n, 4, 4), rc(n, 0, 1),
            rc(n, 3, 3), rc(n, 1, 0),
        ]
        s = play(ENV5, moves)  # black to move
        legal = jlegal(ENV5)(s)
        assert not bool(legal[rc(n, 0, 0)])

    def test_multi_stone_suicide_illegal(self):
        # Black (0,0); white walls (0,1),(1,1),(2,0): black playing (1,0)
        # would make a 2-stone group with zero liberties.
        n = 5
        moves = [
            rc(n, 0, 0), rc(n, 0, 1),
            rc(n, 4, 4), rc(n, 1, 1),
            rc(n, 3, 3), rc(n, 2, 0),
        ]
        s = play(ENV5, moves)
        legal = jlegal(ENV5)(s)
        assert not bool(legal[rc(n, 1, 0)])

    def test_capturing_move_on_no_liberty_point_legal(self):
        # (0,0) has no liberties for black, but placing captures white (0,1).
        n = 5
        moves = [
            rc(n, 1, 1), rc(n, 0, 1),  # B, W
            rc(n, 0, 2), rc(n, 1, 0),  # B traps w(0,1); W at (1,0)
            rc(n, 2, 0), rc(n, 4, 4),  # B, W elsewhere
        ]
        s = play(ENV5, moves)
        # Black playing (0,0): no empty neighbors; white (0,1) has libs (0,0)
        # only? w(0,1) neighbors: (0,0) empty, (0,2) B, (1,1) B -> in atari.
        legal = jlegal(ENV5)(s)
        assert bool(legal[rc(n, 0, 0)])
        s = jstep(ENV5)(s, jnp.asarray(rc(n, 0, 0)))
        assert int(s.board[0, 1]) == -1  # captured
        assert int(s.board[0, 0]) == 0

    def test_eye_fill_legal_but_possible(self):
        # Filling your own eye is legal (not suicide) when group has libs.
        n = 5
        moves = [
            rc(n, 0, 1), rc(n, 4, 4),
            rc(n, 1, 0), rc(n, 4, 3),
            rc(n, 1, 1), rc(n, 3, 4),
        ]
        s = play(ENV5, moves)
        legal = jlegal(ENV5)(s)
        assert bool(legal[rc(n, 0, 0)])  # inside own eye; group has libs


class TestKo:
    def ko_position(self):
        """Classic ko shape (black to move, capture at (1,2)):

            col:  0  1  2  3
            row0: .  B  W  .
            row1: B  W  .  W
            row2: .  B  W  .

        W(1,1) is in atari (single liberty (1,2)).  Black plays (1,2),
        captures W(1,1); the new black stone itself has a single liberty
        (1,1) -> simple-ko point at (1,1).
        """
        n = 5
        moves = [
            rc(n, 0, 1), rc(n, 0, 2),
            rc(n, 1, 0), rc(n, 1, 3),
            rc(n, 2, 1), rc(n, 2, 2),
            rc(n, 4, 4), rc(n, 1, 1),  # B tenuki, W fills the ko shape
        ]
        return play(ENV5, moves)  # black to move

    def test_ko_capture_and_ban(self):
        n = 5
        s = self.ko_position()
        s = jstep(ENV5)(s, jnp.asarray(rc(n, 1, 2)))  # B captures W(1,1)
        assert int(s.board[1, 1]) == -1
        assert int(s.ko_point) == rc(n, 1, 1)
        legal = jlegal(ENV5)(s)  # white to move
        assert not bool(legal[rc(n, 1, 1)])  # immediate recapture banned

    def test_ko_clears_after_tenuki(self):
        n = 5
        s = self.ko_position()
        s = jstep(ENV5)(s, jnp.asarray(rc(n, 1, 2)))  # B takes ko
        s = jstep(ENV5)(s, jnp.asarray(rc(n, 4, 0)))  # W tenuki
        assert int(s.ko_point) == -1
        s = jstep(ENV5)(s, jnp.asarray(rc(n, 3, 0)))  # B tenuki
        legal = jlegal(ENV5)(s)
        # Retake is legal now: the simple-ko point cleared, and the board
        # after retake includes both tenuki stones, so no position repeats.
        assert bool(legal[rc(n, 1, 1)])

    def test_superko_via_hash_ring(self):
        n = 5
        s = self.ko_position()
        s = jstep(ENV5)(s, jnp.asarray(rc(n, 1, 2)))  # B takes ko
        # White retaking immediately would recreate the pre-capture board:
        # banned by both simple ko and the hash ring.
        legal = jlegal(ENV5)(s)
        assert not bool(legal[rc(n, 1, 1)])


class TestScoring:
    def test_area_scoring_simple(self):
        # Black wall on col 2 of 5x5: black owns cols 0-1 + wall... play out:
        n = 5
        env = GoEnv(board_size=5, komi=0.5)
        moves = []
        for r in range(5):
            moves += [rc(n, r, 2), rc(n, r, 4)]
        s = play(env, moves)
        sb, sw = jax.jit(env.score)(s)
        # Black: 5 stones + cols 0,1 territory (10) = 15.  White: 5 stones +
        # col 3? col 3 empty cells touch black wall and white col 4 -> dame.
        assert float(sb) == 15.0
        assert float(sw) == 5.0 + 0.5

    def test_game_end_winner(self):
        n = 5
        env = GoEnv(board_size=5, komi=0.5)
        moves = []
        for r in range(5):
            moves += [rc(n, r, 2), rc(n, r, 4)]
        moves += [env.pass_action, env.pass_action]
        s = play(env, moves)
        assert bool(s.terminal)
        assert int(s.winner) == 0  # black ahead 15 vs 5.5

    def test_komi_decides(self):
        env = GoEnv(board_size=5, komi=30.0)
        n = 5
        moves = []
        for r in range(5):
            moves += [rc(n, r, 2), rc(n, r, 4)]
        moves += [env.pass_action, env.pass_action]
        s = play(env, moves)
        assert int(s.winner) == 1  # komi 30 flips it

    def test_territory_ownership_map(self):
        n = 5
        env = GoEnv(board_size=5)
        moves = []
        for r in range(5):
            moves += [rc(n, r, 2), rc(n, r, 4)]
        s = play(env, moves)
        own = jax.jit(env.territory_ownership)(s)
        assert int(own[2, 0]) == 0  # black territory
        assert int(own[2, 3]) == -1  # dame between walls


class TestObservation:
    def test_shapes(self):
        s = play(ENV5, [rc(5, 2, 2), rc(5, 1, 1)])
        obs = jax.jit(ENV5.observation)(s)
        assert obs.shape == (8, 5, 5)
        assert float(obs[0, 2, 2]) == 1.0  # black to move: my stone
        assert float(obs[1, 1, 1]) == 1.0
        assert float(obs[2].sum()) == 25.0  # black to move

    def test_liberty_planes(self):
        s = play(ENV5, [rc(5, 0, 0)])  # corner black stone: 2 libs
        obs = jax.jit(ENV5.observation)(s)
        # white to move: plane 4 = opponent (black) liberties.
        # bf16 planes: 2/10 is not bf16-representable, allow its ulp.
        np.testing.assert_allclose(float(obs[4, 0, 0]), 0.2, rtol=1e-2)

    def test_ko_plane(self):
        n = 5
        t = TestKo()
        s = t.ko_position()
        s = jstep(ENV5)(s, jnp.asarray(rc(n, 1, 2)))
        obs = jax.jit(ENV5.observation)(s)
        assert float(obs[5, 1, 1]) == 1.0


class TestMoveLimit:
    def test_move_limit_terminates(self):
        env = GoEnv(board_size=5, max_moves=6)
        s = play(env, [0, 1, 2, 3, 5, 6])
        assert bool(s.terminal)


class TestBatched:
    def test_vmap(self):
        env = ENV5
        B = 3
        states = jax.vmap(lambda _: env.init())(jnp.arange(B))
        stepped = jax.vmap(env.step)(states, jnp.asarray([0, 12, PASS5]))
        masks = jax.vmap(env.legal_mask)(stepped)
        assert masks.shape == (B, 26)
        obs = jax.vmap(env.observation)(stepped)
        assert obs.shape == (B, 8, 5, 5)


class TestDeadStoneScoring:
    def test_dead_stones_counted(self):
        env = GoEnv(board_size=5, komi=0.0, chinese_rules=False)
        n = 5
        # Black wall col 2; one white stone stranded at (2,0).
        moves = []
        for r in range(5):
            moves += [rc(n, r, 2), rc(n, r, 4)]
        s = play(env, moves)
        s = jstep(env)(s, jnp.asarray(rc(n, 2, 0)))  # B plays inside...
        # Actually mark white (2,4)... simpler: mark one white stone dead.
        dead = jnp.zeros((5, 5), bool).at[0, 4].set(True)
        sb, sw = jax.jit(lambda st: env.score(st, dead))(s)
        sb0, sw0 = jax.jit(lambda st: env.score(st))(s)
        # Removing a white stone gives black a prisoner (+1) and can only
        # help black's territory.
        assert float(sb) >= float(sb0) + 1.0


class TestFloodSpiralStress:
    """Worst-case group shapes for the segmented-scan flood (max bends)."""

    def test_serpentine_group_single_id(self):
        """Serpentine path: maximal bends for the sweep-based flood."""
        from alphazero_tpu.games.go import _flood, _group_ids

        n = 9
        grid = np.zeros((n, n), bool)
        for r in range(0, n, 2):
            grid[r, :] = True
        for r in range(1, n, 2):
            grid[r, (n - 1) if (r // 2) % 2 == 0 else 0] = True
        stones = jnp.asarray(grid)
        seed = jnp.zeros((n, n), bool).at[0, 0].set(True)
        out = jax.jit(_flood)(seed, stones)
        np.testing.assert_array_equal(np.asarray(out), grid)
        ids = jax.jit(_group_ids)(stones)
        vals = np.asarray(ids)[grid]
        assert (vals == vals[0]).all()

    def test_two_disjoint_regions(self):
        from alphazero_tpu.games.go import _flood

        n = 5
        region = np.zeros((n, n), bool)
        region[0, :2] = True
        region[4, 3:] = True
        seed = jnp.zeros((n, n), bool).at[0, 0].set(True)
        out = jax.jit(_flood)(seed, jnp.asarray(region))
        expect = np.zeros((n, n), bool)
        expect[0, :2] = True
        np.testing.assert_array_equal(np.asarray(out), expect)


class TestLabelFloodEquivalence:
    """Round 3: _cell_group_stats moved from the [S,S] matrix-squaring
    reachability chain to min-label propagation (_min_label_flood).  The
    squaring chain (_reach_matrix) stays as the oracle: on random boards
    every GroupStats field must agree exactly."""

    @pytest.mark.parametrize("n,seed", [(9, 0), (9, 1), (13, 2), (19, 3)])
    def test_stats_match_reachability_oracle(self, n, seed):
        import numpy as np
        from alphazero_tpu.games.go import (
            GroupStats, _adjacency_np, _cell_group_stats, _reach_matrix,
        )

        rng = np.random.RandomState(seed)
        board = rng.choice([-1, 0, 1], size=(n, n), p=[0.4, 0.3, 0.3])
        S = n * n
        for color in (0, 1):
            stones = jnp.asarray((board == color).reshape(-1))
            empty = jnp.asarray((board == -1).reshape(-1))
            keys = jnp.asarray(
                rng.randint(0, 2**16, size=(S, 2)).astype(np.uint32)
            )
            got = jax.jit(_cell_group_stats)(stones, empty, keys)

            # Oracle: identical formulas on the squaring-chain reach matrix.
            reach = jax.jit(_reach_matrix)(stones)
            A = jnp.asarray(_adjacency_np(n))
            arange = jnp.arange(S, dtype=jnp.int32)
            lib_ind = jnp.matmul(
                reach.astype(jnp.int8), (A & empty[None, :]).astype(jnp.int8),
                preferred_element_type=jnp.int32) > 0
            np.testing.assert_array_equal(
                np.asarray(got.libs),
                np.asarray(jnp.where(stones, lib_ind.sum(-1), 0)))
            np.testing.assert_array_equal(
                np.asarray(got.libpos),
                np.asarray(jnp.where(
                    stones, jnp.where(lib_ind, arange[None, :], S).min(-1), S)))
            np.testing.assert_array_equal(
                np.asarray(got.ids),
                np.asarray(jnp.where(
                    stones, jnp.where(reach, arange[None, :], S).min(-1), S)))
            np.testing.assert_array_equal(
                np.asarray(got.size),
                np.asarray(jnp.where(stones, reach.sum(-1), 0)))
