"""Elo tracker + arena tests (reference tests/elo + evaluate.py behavior)."""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.elo.tracker import EloTracker, elo_change, expected_score
from alphazero_tpu.eval.arena import ArenaConfig, play_match
from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.mcts.search import MCTSConfig
from alphazero_tpu.models.stub import make_uniform_eval_fn


class TestEloMath:
    def test_expected_equal(self):
        assert expected_score(1500, 1500) == 0.5

    def test_expected_asymmetry(self):
        np.testing.assert_allclose(
            expected_score(1700, 1500) + expected_score(1500, 1700), 1.0
        )
        assert expected_score(1700, 1500) > 0.75

    def test_change_magnitude(self):
        # Equal ratings, win: +16 with K=32.
        np.testing.assert_allclose(elo_change(1500, 1500, 1.0), 16.0)
        np.testing.assert_allclose(elo_change(1500, 1500, 0.0), -16.0)
        np.testing.assert_allclose(elo_change(1500, 1500, 0.5), 0.0)


class TestEloTracker:
    def test_update_and_symmetry(self):
        t = EloTracker()
        t.add_match_result("a", "b", 1.0)
        assert t.get_rating("a") == 1516.0
        assert t.get_rating("b") == 1484.0

    def test_series_and_leaderboard(self):
        t = EloTracker()
        t.add_series("strong", "weak", wins_a=8, wins_b=1, draws=1)
        board = t.leaderboard()
        assert board[0][0] == "strong"
        assert t.games_played["strong"] == 10

    def test_persistence(self, tmp_path):
        t = EloTracker()
        t.add_series("a", "b", 3, 1, 0)
        p = str(tmp_path / "elo.json")
        t.save(p)
        t2 = EloTracker.load(p)
        assert t2.ratings == t.ratings
        assert len(t2.history) == 4


class TestArena:
    def test_uniform_vs_uniform_roughly_even(self):
        env = GomokuEnv(board_size=5)
        ev = make_uniform_eval_fn(env.num_actions)
        cfg = ArenaConfig(
            mcts=MCTSConfig(num_simulations=8, dirichlet_epsilon=0.0),
            max_moves=25,
            temperature=1.0,
        )
        fn = jax.jit(
            lambda r: play_match(env, ev, ev, r, cfg, num_games=8)
        )
        res = fn(jax.random.key(0))
        total = int(res.wins_a) + int(res.wins_b) + int(res.draws)
        assert total == 8
        # All games finish on a 5x5 within 25 moves.
        assert bool(jnp.all(res.winner >= -1))

    def test_color_swap_split(self):
        env = GomokuEnv(board_size=5)
        ev = make_uniform_eval_fn(env.num_actions)
        cfg = ArenaConfig(
            mcts=MCTSConfig(num_simulations=4, dirichlet_epsilon=0.0),
            max_moves=10, temperature=1.0,
        )
        res = jax.jit(
            lambda r: play_match(env, ev, ev, r, cfg, num_games=6)
        )(jax.random.key(1))
        assert int(res.a_is_black.sum()) == 3
