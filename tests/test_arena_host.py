"""Host-driven arenas (eval/arena.play_match_host / play_match_sides) and
the fixed anchor pool (eval/anchors.py).

play_match_host is the production-depth match loop that replaces the
giant-scan ``play_match`` jit (which crashed the TPU worker at 800
sims/move — VERDICT r4 #2); play_match_sides gives each side its own
(eval_fn, MCTSConfig), which the anchor pool requires (an anchor's
simulation count is part of its identity).
"""
import jax
import jax.numpy as jnp

from alphazero_tpu.core import registry
from alphazero_tpu.eval import anchors
from alphazero_tpu.eval.arena import (
    ArenaConfig,
    play_match_host,
    play_match_sides,
)
from alphazero_tpu.mcts.search import MCTSConfig
from alphazero_tpu.models.stub import make_uniform_eval_fn


def _env():
    return registry.create_game("gomoku", 7)


def _biased_eval(env, bias):
    """Uniform evaluator whose value is biased for the side to move by
    ``bias`` — strength differences without a net."""
    def eval_fn(obs, to_play=None):
        B = obs.shape[0]
        return (jnp.zeros((B, env.num_actions), jnp.float32),
                jnp.full((B,), bias, jnp.float32))

    return eval_fn


class TestPlayMatchHost:
    def test_tallies_and_completion(self):
        env = _env()
        cfg = ArenaConfig(
            mcts=MCTSConfig(num_simulations=16, dirichlet_epsilon=0.0,
                            wave_size=8),
            max_moves=49,
        )
        ua = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
        ub = make_uniform_eval_fn(env.num_actions, value_noise=0.05)
        res = play_match_host(env, ua, ub, jax.random.key(0), cfg, 16)
        total = int(res.wins_a) + int(res.wins_b) + int(res.draws)
        assert total == 16
        # 7x7 gomoku games between random-ish players finish fast; with
        # 49 max moves every game must be decided or genuinely drawn.
        assert int(res.wins_a) + int(res.wins_b) > 0

    def test_opening_random_moves_mirrored(self):
        """With opening_random_moves=k every game starts k plies in, and
        lane i / lane half+i share the identical opening (each opening is
        contested from both colors)."""
        env = _env()
        cfg = ArenaConfig(
            mcts=MCTSConfig(num_simulations=4, dirichlet_epsilon=0.0),
            max_moves=10,
            opening_random_moves=4,
        )
        u = make_uniform_eval_fn(env.num_actions)

        # Reproduce the opening phase exactly as play_match_host does and
        # check the mirroring invariant on the states.
        from alphazero_tpu.eval.arena import _opening_actions

        B, half = 8, 4
        states = jax.vmap(lambda _: env.init())(jnp.arange(B))
        rng = jax.random.key(7)
        rng, o_rng = jax.random.split(rng)
        step = jax.jit(lambda s, a: jax.vmap(env.step)(s, a))
        for t in range(4):
            acts_half = _opening_actions(
                env, states, jax.random.fold_in(o_rng, t), half
            )
            acts = jnp.concatenate([acts_half, acts_half[: B - half]])
            states = step(states, acts)
        boards = states.board
        assert bool(jnp.all(boards[:4] == boards[4:]))
        # Openings diverge ACROSS pairs (that's the point).
        assert not bool(jnp.all(boards[0] == boards[1]))
        assert bool(jnp.all(jax.vmap(env.to_play)(states) == 0))

        # End-to-end through play_match_host.
        res = play_match_host(env, u, u, jax.random.key(1), cfg, 8)
        total = int(res.wins_a) + int(res.wins_b) + int(res.draws)
        assert total == 8

    def test_color_swap_layout(self):
        env = _env()
        cfg = ArenaConfig(
            mcts=MCTSConfig(num_simulations=8, dirichlet_epsilon=0.0),
            max_moves=16,
        )
        u = make_uniform_eval_fn(env.num_actions)
        res = play_match_host(env, u, u, jax.random.key(1), cfg, 8)
        assert int(jnp.sum(res.a_is_black)) == 4


class TestPlayMatchSides:
    def test_deeper_search_wins(self):
        """64-sim uniform MCTS should beat 2-sim uniform MCTS on 7x7 —
        the anchor-ladder premise (search depth = strength)."""
        env = _env()
        strong = (make_uniform_eval_fn(env.num_actions, value_noise=0.1),
                  MCTSConfig(num_simulations=64, dirichlet_epsilon=0.0,
                             wave_size=8))
        weak = (make_uniform_eval_fn(env.num_actions, value_noise=0.1),
                MCTSConfig(num_simulations=2, dirichlet_epsilon=0.0))
        res = play_match_sides(env, strong, weak, jax.random.key(2), 16,
                               max_moves=49)
        total = int(res.wins_a) + int(res.wins_b) + int(res.draws)
        assert total == 16
        assert int(res.wins_a) > int(res.wins_b), (
            int(res.wins_a), int(res.wins_b), int(res.draws))

    def test_reuse_side_supported(self):
        env = _env()
        side_a = (make_uniform_eval_fn(env.num_actions, value_noise=0.1),
                  MCTSConfig(num_simulations=16, dirichlet_epsilon=0.0,
                             tree_reuse=True, reuse_budget="fixed",
                             wave_size=8))
        side_b = (make_uniform_eval_fn(env.num_actions, value_noise=0.1),
                  MCTSConfig(num_simulations=16, dirichlet_epsilon=0.0,
                             wave_size=8))
        res = play_match_sides(env, side_a, side_b, jax.random.key(3), 8,
                               max_moves=49)
        total = int(res.wins_a) + int(res.wins_b) + int(res.draws)
        assert total == 8


class TestAnchors:
    def test_pool_constructs(self):
        env = _env()
        for name in anchors.POOL:
            eval_fn, cfg = anchors.make_anchor(env, name)
            obs = jax.vmap(env.observation)(
                jax.vmap(lambda _: env.init())(jnp.arange(2))
            )
            logits, value = eval_fn(obs, jnp.zeros((2,), jnp.int32))
            assert logits.shape == (2, env.num_actions)
            assert cfg.num_simulations >= 1

    def test_canonical_in_pool(self):
        assert anchors.CANONICAL in anchors.POOL

    def test_attack_defense_rejects_non_gomoku(self):
        env = registry.create_game("go", 9)
        try:
            anchors.make_anchor(env, "attack_defense_64")
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    def test_unknown_anchor_rejected(self):
        env = _env()
        try:
            anchors.make_anchor(env, "nope")
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
