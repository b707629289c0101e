"""Gomoku environment unit tests.

Modeled on the reference test strategy (SURVEY.md §4): rules-engine tests vs
known positions, incl. Renju forbidden-move edge cases
(tests/games/gomoku in the reference repo).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.games.gomoku import GomokuEnv, GomokuState


@functools.lru_cache(maxsize=None)
def jstep(env):
    return jax.jit(env.step)


@functools.lru_cache(maxsize=None)
def jforbidden(env):
    return jax.jit(env.forbidden_map)


def play(env, moves):
    step = jstep(env)
    s = env.init()
    for m in moves:
        s = step(s, jnp.asarray(m))
    return s


def rc(n, r, c):
    return r * n + c


class TestBasics:
    env = GomokuEnv(board_size=9)

    def test_init(self):
        s = self.env.init()
        assert not bool(s.terminal)
        assert int(s.to_play) == 0
        assert int(jnp.sum(s.board != -1)) == 0
        assert bool(jnp.all(self.env.legal_mask(s)))

    def test_alternation_and_occupancy(self):
        n = 9
        s = play(self.env, [rc(n, 4, 4), rc(n, 3, 3)])
        assert int(s.to_play) == 0
        assert int(s.board[4, 4]) == 0
        assert int(s.board[3, 3]) == 1
        legal = self.env.legal_mask(s)
        assert not bool(legal[rc(n, 4, 4)])
        assert not bool(legal[rc(n, 3, 3)])
        assert int(jnp.sum(legal)) == n * n - 2

    def test_horizontal_win(self):
        n = 9
        moves = []
        for i in range(4):
            moves += [rc(n, 0, i), rc(n, 8, i)]
        moves.append(rc(n, 0, 4))  # black completes five
        s = play(self.env, moves)
        assert bool(s.terminal)
        assert int(s.winner) == 0

    @pytest.mark.parametrize("dr,dc", [(0, 1), (1, 0), (1, 1), (1, -1)])
    def test_directional_wins(self, dr, dc):
        n = 9
        r0, c0 = (2, 2) if dc >= 0 else (2, 6)
        moves = []
        for i in range(4):
            moves += [rc(n, r0 + i * dr, c0 + i * dc), rc(n, 8, i)]
        moves.append(rc(n, r0 + 4 * dr, c0 + 4 * dc))
        s = play(self.env, moves)
        assert bool(s.terminal) and int(s.winner) == 0

    def test_white_win(self):
        n = 9
        moves = []
        for i in range(4):
            moves += [rc(n, 0, i), rc(n, 5, i)]
        moves += [rc(n, 8, 8), rc(n, 5, 4)]  # white completes five
        s = play(self.env, moves)
        assert bool(s.terminal)
        assert int(s.winner) == 1

    def test_terminal_step_noop(self):
        n = 9
        moves = []
        for i in range(4):
            moves += [rc(n, 0, i), rc(n, 8, i)]
        moves.append(rc(n, 0, 4))
        s = play(self.env, moves)
        s2 = self.env.step(s, jnp.asarray(rc(n, 4, 4)))
        assert int(jnp.sum(s2.board != s.board)) == 0
        assert int(s2.move_count) == int(s.move_count)
        assert not bool(jnp.any(self.env.legal_mask(s)))

    def test_draw_full_board(self):
        # 3x3 "gomoku" can never have 5-in-row; filling the board draws.
        env = GomokuEnv(board_size=3)
        s = env.init()
        for a in range(9):
            s = env.step(s, jnp.asarray(a))
        assert bool(s.terminal)
        assert int(s.winner) == -1

    def test_overline_wins_freestyle(self):
        n = 9
        # Black: _BBBB_B -> playing the gap creates six-in-row; freestyle wins.
        moves = []
        for i, col in enumerate([1, 2, 3, 4, 6]):
            moves += [rc(n, 0, col), rc(n, 8, 2 * i)]  # white scattered
        s = play(self.env, moves)
        s = self.env.step(s, jnp.asarray(rc(n, 0, 5)))  # black fills the gap
        assert bool(s.terminal)
        assert int(s.winner) == 0

    def test_hash_changes_and_transposes(self):
        n = 9
        s1 = play(self.env, [rc(n, 0, 0), rc(n, 1, 1), rc(n, 2, 2)])
        s2 = play(self.env, [rc(n, 2, 2), rc(n, 1, 1), rc(n, 0, 0)])
        # Same stones, same side to move -> same Zobrist hash (transposition).
        assert jnp.array_equal(s1.hash, s2.hash)
        s3 = play(self.env, [rc(n, 0, 0), rc(n, 1, 1), rc(n, 2, 3)])
        assert not jnp.array_equal(s1.hash, s3.hash)


class TestObservation:
    env = GomokuEnv(board_size=9)

    def test_shapes_and_planes(self):
        n = 9
        s = play(self.env, [rc(n, 4, 4), rc(n, 3, 3)])
        obs = self.env.observation(s)
        assert obs.shape == (11, n, n)
        # Black to move: plane 0 = black stones, plane 1 = white stones.
        assert float(obs[0, 4, 4]) == 1.0
        assert float(obs[1, 3, 3]) == 1.0
        assert float(obs[2].sum()) == n * n  # black-to-move plane all ones
        # Move history: black's most recent move at plane 3, white's at 6.
        assert float(obs[3, 4, 4]) == 1.0
        assert float(obs[6, 3, 3]) == 1.0
        # CoordConv planes.
        np.testing.assert_allclose(obs[9, :, 0], np.arange(n) / (n - 1))
        np.testing.assert_allclose(obs[10, 0, :], np.arange(n) / (n - 1))

    def test_perspective_flip(self):
        n = 9
        s = play(self.env, [rc(n, 4, 4)])
        obs = self.env.observation(s)  # white to move
        assert float(obs[0].sum()) == 0.0  # white has no stones
        assert float(obs[1, 4, 4]) == 1.0
        assert float(obs[2].sum()) == 0.0  # not black to move

    def test_vmap_batch(self):
        env = self.env
        B = 4
        states = jax.vmap(lambda _: env.init())(jnp.arange(B))
        actions = jnp.asarray([0, 1, 2, 3])
        stepped = jax.vmap(env.step)(states, actions)
        obs = jax.vmap(env.observation)(stepped)
        assert obs.shape == (B, 11, 9, 9)
        masks = jax.vmap(env.legal_mask)(stepped)
        assert masks.shape == (B, 81)
        assert int(masks.sum()) == B * 80


class TestRenju:
    env = GomokuEnv(board_size=15, use_renju=True)

    def place(self, black_cells, white_cells):
        n = 15
        board = np.full((n, n), -1, np.int8)
        for r, c in black_cells:
            board[r, c] = 0
        for r, c in white_cells:
            board[r, c] = 1
        return jnp.asarray(board)

    def test_overline_forbidden(self):
        n = 15
        # _BBBB.B_: playing (7,7) would make six.
        black = [(7, 3), (7, 4), (7, 5), (7, 6), (7, 8)]
        board = self.place(black, [])
        forbidden, five = jforbidden(self.env)(board == 0, board == 1)
        assert bool(forbidden[7, 7])
        assert not bool(five[7, 7])

    def test_exact_five_not_forbidden(self):
        black = [(7, 3), (7, 4), (7, 5), (7, 6)]
        board = self.place(black, [])
        forbidden, five = jforbidden(self.env)(board == 0, board == 1)
        assert bool(five[7, 7])
        assert bool(five[7, 2])

    def test_double_three_forbidden(self):
        # Two open threes crossing at (7,7): horizontal .BB(p)B. is too long;
        # use classic: black at (7,5),(7,6) and (5,7),(6,7); playing (7,7)
        # makes two open threes.
        black = [(7, 5), (7, 6), (5, 7), (6, 7)]
        board = self.place(black, [])
        forbidden, _ = jforbidden(self.env)(board == 0, board == 1)
        assert bool(forbidden[7, 7])

    def test_single_three_allowed(self):
        black = [(7, 5), (7, 6)]
        board = self.place(black, [])
        forbidden, _ = jforbidden(self.env)(board == 0, board == 1)
        assert not bool(forbidden[7, 7])

    def test_blocked_three_not_double(self):
        # White blocks one end of the vertical three -> not an open three.
        black = [(7, 5), (7, 6), (5, 7), (6, 7)]
        white = [(4, 7), (8, 7)]  # blocks the vertical line both ends
        board = self.place(black, white)
        forbidden, _ = jforbidden(self.env)(board == 0, board == 1)
        assert not bool(forbidden[7, 7])

    def test_double_four_forbidden(self):
        # Two "fours" crossing at (7,7): BBB_ horizontally and vertically.
        black = [(7, 4), (7, 5), (7, 6), (4, 7), (5, 7), (6, 7)]
        # Block the open ends so each is a simple (non-straight) four... the
        # placement at (7,7) creates a four on each line regardless.
        white = [(7, 3), (3, 7)]
        board = self.place(black, white)
        forbidden, _ = jforbidden(self.env)(board == 0, board == 1)
        assert bool(forbidden[7, 7])

    def test_white_not_restricted(self):
        n = 15
        s = self.env.init()
        # Craft a position where (7,7) is black-forbidden; white may play it.
        moves = [
            rc(n, 7, 5), rc(n, 0, 0), rc(n, 7, 6), rc(n, 0, 1),
            rc(n, 5, 7), rc(n, 0, 2), rc(n, 6, 7), rc(n, 0, 3),
        ]
        s = play(self.env, moves)
        assert int(s.to_play) == 0
        legal_black = self.env.legal_mask(s)
        assert not bool(legal_black[rc(n, 7, 7)])
        s2 = self.env.step(s, jnp.asarray(rc(n, 1, 1)))  # black elsewhere
        legal_white = self.env.legal_mask(s2)
        assert bool(legal_white[rc(n, 7, 7)])

    def test_renju_overline_no_win_for_black(self):
        n = 15
        env = self.env
        # Force the position via direct steps: black builds _BBBB.B, then
        # plays the gap (illegal in practice; step() still must not declare a
        # black win on six).
        moves = []
        for i, col in enumerate([3, 4, 5, 6, 8]):
            moves += [rc(n, 7, col), rc(n, 0, 2 * i)]  # white scattered
        s = play(env, moves)
        s = env.step(s, jnp.asarray(rc(n, 7, 7)))
        assert not bool(s.terminal)


class TestOmok:
    env = GomokuEnv(board_size=15, use_omok=True)

    def test_double_three_forbidden_strict(self):
        black = [(7, 5), (7, 6), (5, 7), (6, 7)]
        board = GomokuEnv(board_size=15).init().board
        board = board.at[tuple(zip(*black))].set(0)
        forbidden, _ = jforbidden(self.env)(board == 0, board == 1)
        assert bool(forbidden[7, 7])

    def test_double_four_allowed_in_omok(self):
        cells = [(7, 4), (7, 5), (7, 6), (4, 7), (5, 7), (6, 7)]
        whites = [(7, 3), (3, 7), (7, 8), (8, 7)]  # kill the threes
        board = GomokuEnv(board_size=15).init().board
        board = board.at[tuple(zip(*cells))].set(0)
        board = board.at[tuple(zip(*whites))].set(1)
        forbidden, _ = jforbidden(self.env)(board == 0, board == 1)
        assert not bool(forbidden[7, 7])


class TestProLongOpening:
    env = GomokuEnv(board_size=15, use_pro_long_opening=True)

    def test_first_move_center_only(self):
        s = self.env.init()
        legal = self.env.legal_mask(s)
        assert int(legal.sum()) == 1
        assert bool(legal[rc(15, 7, 7)])

    def test_third_move_distance(self):
        s = play(self.env, [rc(15, 7, 7), rc(15, 7, 8)])
        legal = self.env.legal_mask(s)
        assert not bool(legal[rc(15, 7, 6)])  # too close to center
        assert not bool(legal[rc(15, 9, 9)])  # chebyshev 2, too close
        assert bool(legal[rc(15, 7, 10)])  # chebyshev 3, fine


class TestRenjuClassicPositions:
    """Deeper Renju forbidden-point cases (gomoku_rules.cpp recursion
    family)."""

    env = GomokuEnv(board_size=15, use_renju=True)

    def board(self, black, white=()):
        b = np.full((15, 15), -1, np.int8)
        for r, c in black:
            b[r, c] = 0
        for r, c in white:
            b[r, c] = 1
        return jnp.asarray(b)

    def test_four_three_allowed(self):
        # A four + a three at the same point is NOT forbidden (only 4-4 and
        # 3-3 are).  Horizontal four threat + vertical open three at (7,7).
        black = [(7, 4), (7, 5), (7, 6), (5, 7), (6, 7)]
        white = [(7, 3)]  # blocks left end -> horizontal is a simple four
        board = self.board(black, white)
        forbidden, five = jforbidden(self.env)(board == 0, board == 1)
        assert not bool(forbidden[7, 7])

    def test_three_blocked_by_edge_not_open(self):
        # Vertical "three" against the board edge cannot become a straight
        # four -> not an open three -> no double-three at (1,7).
        black = [(0, 7), (2, 7), (1, 5), (1, 6)]
        board = self.board(black)
        forbidden, _ = jforbidden(self.env)(board == 0, board == 1)
        # (1,7) completes a vertical group 0-2 (blocked by edge above: row -1
        # off-board) and a horizontal .BBB. (open).  Only one OPEN three.
        assert not bool(forbidden[1, 7])

    def test_double_three_diagonals(self):
        # Two diagonal open threes crossing at (7,7).
        black = [(5, 5), (6, 6), (5, 9), (6, 8)]
        board = self.board(black)
        forbidden, _ = jforbidden(self.env)(board == 0, board == 1)
        assert bool(forbidden[7, 7])

    def test_overline_through_gap(self):
        # B B p B B B -> placing p makes six: overline, forbidden.
        black = [(7, 3), (7, 4), (7, 6), (7, 7), (7, 8)]
        board = self.board(black)
        forbidden, five = jforbidden(self.env)(board == 0, board == 1)
        assert bool(forbidden[7, 5])
        assert not bool(five[7, 5])


class TestStepLineSampling:
    """The step()'s 40-cell line-sampling win check must agree with the
    full-board run-map formulation (_run_through_maps) on random games."""

    def test_random_playouts_match_runmaps(self):
        import numpy as np
        from alphazero_tpu.games.gomoku import (
            GomokuEnv, _run_through_maps,
        )

        env = GomokuEnv(board_size=9)
        step = jax.jit(env.step)
        rng = np.random.RandomState(11)
        for _ in range(6):
            state = env.init()
            for _ in range(40):
                if bool(state.terminal):
                    break
                legal = np.asarray(env.legal_mask(state))
                if not legal.any():
                    break
                a = int(rng.choice(np.nonzero(legal)[0]))
                player = int(state.to_play)
                # expected winner via full-board run maps (old formulation)
                mover = np.asarray(state.board) == player
                runs = np.asarray(
                    _run_through_maps(jnp.asarray(mover))
                )
                r, c = a // 9, a % 9
                expect_win = bool((runs[:, r, c] >= 5).any())
                state = step(state, jnp.int32(a))
                got_win = bool(state.terminal) and int(state.winner) == player
                assert got_win == expect_win, (a, player)
