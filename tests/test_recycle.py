"""Continuous self-play (lane recycling) — SelfPlayConfig.recycle.

A lane whose game ends restarts immediately instead of idling in
lockstep until the whole batch finishes (the reference's threads start
their next game as soon as one ends, self_play_manager.cpp:74-89).
Measured motivation: finished-lane idling was the entire 815-vs-603
moves/s opening-vs-midgame bench gap (BENCHLOG round 5).
"""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.core import registry
from alphazero_tpu.mcts.search import MCTSConfig
from alphazero_tpu.models.stub import make_uniform_eval_fn
from alphazero_tpu.selfplay.actor import (
    SelfPlayConfig,
    SelfPlayOutput,
    make_host_actor,
    play_games,
    value_targets,
    value_targets_recycled,
)


def _cfg(recycle, max_moves=40, sims=4):
    return SelfPlayConfig(
        mcts=MCTSConfig(num_simulations=sims, dirichlet_alpha=0.5),
        max_moves=max_moves,
        temperature_drop_move=4,
        recycle=recycle,
    )


class TestRecycling:
    def test_lanes_restart_and_segments_recorded(self):
        env = registry.create_game("gomoku", 5)  # 25 cells: games end fast
        ev = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
        out = jax.jit(
            lambda r: play_games(env, ev, r, _cfg(True), batch_size=8)
        )(jax.random.key(0))
        # Every move is active (no lane ever idles) ...
        assert bool(jnp.all(out.active)), "recycled lanes must never idle"
        # ... and multiple segments finished across the window.
        finished = int(jnp.sum(out.ended_winner != -2))
        assert finished >= 8, finished
        # Segment boundaries restart move_count: final states are mid-game.
        assert int(jnp.max(out.states.move_count)) < 40

    def test_without_recycle_lanes_idle(self):
        env = registry.create_game("gomoku", 5)
        ev = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
        out = jax.jit(
            lambda r: play_games(env, ev, r, _cfg(False), batch_size=8)
        )(jax.random.key(0))
        assert not bool(jnp.all(out.active))  # finished lanes idle
        # Exactly one segment end per finished lane.
        per_lane = jnp.sum(out.ended_winner != -2, axis=0)
        assert bool(jnp.all(per_lane <= 1))

    def test_value_targets_recycled_segments(self):
        """Handcrafted two-segment lane: moves before each segment end get
        that segment's winner; trailing moves of an unfinished segment are
        masked out."""
        T = 6
        to_play = jnp.asarray([[0], [1], [0], [1], [0], [1]], jnp.int32)
        #               seg1 ends at t=2 (winner 0); seg2 unfinished
        ended = jnp.asarray([[-2], [-2], [0], [-2], [-2], [-2]], jnp.int32)
        out = SelfPlayOutput(
            states=None,
            actions=jnp.zeros((T, 1), jnp.int32),
            policies=jnp.zeros((T, 1, 4)),
            root_values=jnp.zeros((T, 1)),
            to_play=to_play,
            active=jnp.ones((T, 1), bool),
            ended_winner=ended,
            winner=jnp.asarray([-1]),
            length=jnp.asarray([T]),
            move_states=None,
        )
        z, valid = value_targets_recycled(out)
        np.testing.assert_array_equal(
            np.asarray(valid[:, 0]),
            [True, True, True, False, False, False],
        )
        # Winner 0: z=+1 where to_play==0, -1 where to_play==1.
        np.testing.assert_allclose(np.asarray(z[:3, 0]), [1.0, -1.0, 1.0])

    def test_recycled_targets_match_plain_on_finished_games(self):
        """With recycle OFF, the segment-aware targets agree with the
        classic value_targets on every move of finished games."""
        env = registry.create_game("gomoku", 5)
        ev = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
        out = jax.jit(
            lambda r: play_games(env, ev, r, _cfg(False), batch_size=8)
        )(jax.random.key(3))
        z_plain = value_targets(out)
        z_seg, valid = value_targets_recycled(out)
        finished_lane = jnp.any(out.ended_winner != -2, axis=0)  # [B]
        check = valid & finished_lane[None, :]
        np.testing.assert_allclose(
            np.asarray(jnp.where(check, z_seg, 0.0)),
            np.asarray(jnp.where(check, z_plain, 0.0)),
        )
        # Valid == active for finished lanes.
        assert bool(jnp.all(
            (valid == out.active)[:, np.asarray(finished_lane)]
        ))

    def test_host_actor_recycle(self):
        env = registry.create_game("gomoku", 5)
        ev = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
        step, states = make_host_actor(env, ev, _cfg(True), 8)
        finished = 0
        for i in range(40):
            states, rec = step(states, jax.random.key(i))
            assert bool(jnp.all(rec.active))
            finished += int(jnp.sum(rec.ended_winner != -2))
        assert finished >= 8, finished

    def test_recycle_rejects_tree_reuse(self):
        env = registry.create_game("gomoku", 5)
        ev = make_uniform_eval_fn(env.num_actions)
        cfg = SelfPlayConfig(
            mcts=MCTSConfig(num_simulations=4, tree_reuse=True),
            recycle=True, max_moves=8,
        )
        try:
            step, states = make_host_actor(env, ev, cfg, 4)
            step(states, jax.random.key(0))
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
