"""Batched MCTS tests against the uniform stub evaluator.

Mirrors the reference strategy of running search vs RandomPolicyNetwork
(tests/mcts/parallel_mcts_test.cpp:17, SURVEY.md §4).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.mcts.search import (
    MCTSConfig,
    search,
    select_action,
    masked_softmax,
)
from alphazero_tpu.models.stub import make_uniform_eval_fn

ENV = GomokuEnv(board_size=7)
A = ENV.num_actions


@functools.lru_cache(maxsize=None)
def jsearch(env, config):
    eval_fn = make_uniform_eval_fn(env.num_actions)

    @jax.jit
    def run(states, rng):
        return search(env, eval_fn, states, rng, config)

    return run


def batch_init(env, B):
    return jax.vmap(lambda _: env.init())(jnp.arange(B))


def batch_play(env, states, actions):
    return jax.vmap(env.step)(states, jnp.asarray(actions))


class TestSearchBasics:
    def test_visit_budget(self):
        cfg = MCTSConfig(num_simulations=50, dirichlet_epsilon=0.0)
        out = jsearch(ENV, cfg)(batch_init(ENV, 2), jax.random.key(0))
        # Root visited once at init + once per simulation.
        np.testing.assert_array_equal(out.tree.visits[:, 0], 51)
        # Child visits sum to the number of simulations.
        np.testing.assert_array_equal(out.visit_counts.sum(-1), 50)

    def test_weights_normalized_and_legal(self):
        cfg = MCTSConfig(num_simulations=64, dirichlet_epsilon=0.0)
        B = 3
        states = batch_init(ENV, B)
        states = batch_play(ENV, states, [0, 1, 2])
        out = jsearch(ENV, cfg)(states, jax.random.key(1))
        np.testing.assert_allclose(out.action_weights.sum(-1), 1.0, rtol=1e-5)
        legal = jax.vmap(ENV.legal_mask)(states)
        assert not bool(jnp.any(out.visit_counts[~legal] > 0))

    def test_finds_immediate_win(self):
        # Black has 4 in a row with an open end; search must pick the win.
        n = 7
        env = ENV
        states = batch_init(env, 1)
        # black (0,0..3), white scattered row 6.
        for i in range(4):
            states = batch_play(env, states, [i])  # black at 0..3
            states = batch_play(env, states, [6 * n + i + 1])  # white row 6
        cfg = MCTSConfig(num_simulations=100, dirichlet_epsilon=0.0)
        out = jsearch(env, cfg)(states, jax.random.key(2))
        best = int(jnp.argmax(out.visit_counts[0]))
        assert best == 4  # completes 5-in-a-row at (0,4)

    def test_avoids_immediate_loss(self):
        # White to move; black threatens five at (0,4); white must block.
        n = 7
        env = ENV
        states = batch_init(env, 1)
        for i in range(4):
            states = batch_play(env, states, [i])
            if i < 3:
                states = batch_play(env, states, [6 * n + i + 1])
        # Now white to move, black has 0..3 on row 0.
        cfg = MCTSConfig(num_simulations=150, dirichlet_epsilon=0.0)
        out = jsearch(env, cfg)(states, jax.random.key(3))
        best = int(jnp.argmax(out.visit_counts[0]))
        assert best == 4  # block at (0,4)

    def test_terminal_root(self):
        n = 7
        env = ENV
        states = batch_init(env, 1)
        for i in range(4):
            states = batch_play(env, states, [i])
            states = batch_play(env, states, [6 * n + i + 1])
        states = batch_play(env, states, [4])  # black wins
        assert bool(states.terminal[0])
        cfg = MCTSConfig(num_simulations=10, dirichlet_epsilon=0.0)
        out = jsearch(env, cfg)(states, jax.random.key(4))
        # No children expandable; all sims revisit the terminal root.
        assert int(out.visit_counts.sum()) == 0
        # Root value = terminal value from the loser's perspective = -1.
        np.testing.assert_allclose(out.root_value[0], -1.0, atol=1e-6)

    def test_determinism(self):
        cfg = MCTSConfig(num_simulations=40, dirichlet_epsilon=0.0)
        s = batch_init(ENV, 2)
        o1 = jsearch(ENV, cfg)(s, jax.random.key(7))
        o2 = jsearch(ENV, cfg)(s, jax.random.key(7))
        np.testing.assert_array_equal(o1.visit_counts, o2.visit_counts)

    def test_dirichlet_noise_changes_with_seed(self):
        cfg = MCTSConfig(num_simulations=40, dirichlet_epsilon=0.5,
                         dirichlet_alpha=0.5)
        s = batch_init(ENV, 1)
        o1 = jsearch(ENV, cfg)(s, jax.random.key(0))
        o2 = jsearch(ENV, cfg)(s, jax.random.key(123))
        assert not np.array_equal(
            np.asarray(o1.visit_counts), np.asarray(o2.visit_counts)
        )

    def test_batch_independence(self):
        """Search on a batch of identical positions gives identical stats."""
        cfg = MCTSConfig(num_simulations=30, dirichlet_epsilon=0.0)
        s = batch_init(ENV, 4)
        out = jsearch(ENV, cfg)(s, jax.random.key(5))
        counts = np.asarray(out.visit_counts)
        for i in range(1, 4):
            np.testing.assert_array_equal(counts[0], counts[i])


class TestBackupValues:
    def test_value_sign_propagation(self):
        """With a child that is a win for the mover, root Q must go up."""
        n = 7
        env = ENV
        states = batch_init(env, 1)
        for i in range(4):
            states = batch_play(env, states, [i])
            states = batch_play(env, states, [6 * n + i + 1])
        cfg = MCTSConfig(num_simulations=200, dirichlet_epsilon=0.0)
        out = jsearch(env, cfg)(states, jax.random.key(6))
        # Black to move with a winning move available: root value ~ +1.
        assert float(out.root_value[0]) > 0.5


class TestSelectAction:
    def test_greedy(self):
        counts = jnp.asarray([[1, 5, 3], [9, 2, 0]], jnp.int32)
        a = select_action(jax.random.key(0), counts, jnp.float32(0.0))
        np.testing.assert_array_equal(a, [1, 0])

    def test_sampling_distribution(self):
        counts = jnp.asarray([[0, 1, 9]], jnp.int32)
        keys = jax.random.split(jax.random.key(0), 200)
        acts = jax.vmap(
            lambda k: select_action(k, counts, jnp.float32(1.0))[0]
        )(keys)
        acts = np.asarray(acts)
        assert (acts == 0).sum() == 0  # zero-visit action never sampled
        assert (acts == 2).sum() > (acts == 1).sum()

    def test_high_temperature_flattens(self):
        counts = jnp.asarray([[1, 1000]], jnp.int32)
        keys = jax.random.split(jax.random.key(1), 300)
        acts = jax.vmap(
            lambda k: select_action(k, counts, jnp.float32(10.0))[0]
        )(keys)
        # At T=10 the 1000:1 ratio flattens to ~2:1; action 0 appears often.
        assert (np.asarray(acts) == 0).sum() > 30


class TestMaskedSoftmax:
    def test_masks_and_normalizes(self):
        logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
        legal = jnp.asarray([[True, False, True, False]])
        p = masked_softmax(logits, legal)
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
        assert float(p[0, 1]) == 0.0 and float(p[0, 3]) == 0.0
        assert float(p[0, 2]) > float(p[0, 0])

    def test_all_illegal_uniform_fallback(self):
        logits = jnp.zeros((1, 4))
        legal = jnp.zeros((1, 4), bool)
        p = masked_softmax(logits, legal)
        assert not bool(jnp.any(jnp.isnan(p)))


class TestHostSearch:
    def test_host_matches_jitted(self):
        from alphazero_tpu.mcts.search import make_host_search

        cfg = MCTSConfig(num_simulations=30, dirichlet_epsilon=0.0)
        host = make_host_search(ENV, make_uniform_eval_fn(A), cfg)
        states = batch_init(ENV, 2)
        out_h = host(states, jax.random.key(3))
        out_j = jsearch(ENV, cfg)(states, jax.random.key(3))
        np.testing.assert_array_equal(
            np.asarray(out_h.visit_counts), np.asarray(out_j.visit_counts)
        )
        np.testing.assert_allclose(
            np.asarray(out_h.root_value), np.asarray(out_j.root_value),
            rtol=1e-5,
        )

    def test_host_actor_moves_legal(self):
        from alphazero_tpu.selfplay.actor import (
            SelfPlayConfig, make_host_actor,
        )

        cfg = SelfPlayConfig(
            mcts=MCTSConfig(num_simulations=8, dirichlet_epsilon=0.25,
                            dirichlet_alpha=0.5),
            max_moves=10,
        )
        step, states = make_host_actor(
            ENV, make_uniform_eval_fn(A), cfg, batch_size=3
        )
        rng = jax.random.key(0)
        for i in range(3):
            rng, sub = jax.random.split(rng)
            legal = jax.vmap(ENV.legal_mask)(states)
            states, rec = step(states, sub)
            acts = np.asarray(rec.action)
            for b in range(3):
                assert bool(legal[b, acts[b]])


@functools.lru_cache(maxsize=None)
def _noisy_search(env, config):
    eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.3)

    @jax.jit
    def run(states, rng):
        return search(env, eval_fn, states, rng, config)

    return run


class TestTDLambda:
    def test_lambda_one_matches_default(self):
        # With λ=1 the TD mixing reduces to the plain sign-flip backprop, so
        # the sequential walk must reproduce the mask-based fast path
        # node-for-node (each node gets exactly one visit/value add per sim
        # in both formulations).
        cfg0 = MCTSConfig(num_simulations=40, dirichlet_epsilon=0.0)
        cfg1 = MCTSConfig(num_simulations=40, dirichlet_epsilon=0.0,
                          td_lambda=1.0)
        states = batch_init(ENV, 2)
        out0 = jsearch(ENV, cfg0)(states, jax.random.key(7))
        out1 = jsearch(ENV, cfg1)(states, jax.random.key(7))
        np.testing.assert_array_equal(
            np.asarray(out0.visit_counts), np.asarray(out1.visit_counts)
        )
        np.testing.assert_allclose(
            np.asarray(out0.tree.value_sum),
            np.asarray(out1.tree.value_sum), atol=1e-5,
        )

    def test_td_backprop_runs_and_bootstraps(self):
        # Reference formula (parallel_mcts.cpp:825-833): λ<1 mixes the
        # (negated) parent running mean into the backed-up value.  Sanity:
        # search completes, visit accounting is conserved, values bounded.
        # Nonzero leaf values needed — TD mixing of all-zero values is a
        # no-op (value_noise mirrors RandomPolicyNetwork's random value).
        cfg = MCTSConfig(num_simulations=60, dirichlet_epsilon=0.0,
                         td_lambda=0.8)
        states = batch_init(ENV, 2)
        out = _noisy_search(ENV, cfg)(states, jax.random.key(1))
        counts = np.asarray(out.visit_counts)
        assert counts.sum(-1).min() >= 1
        v = np.asarray(out.tree.value_sum) / np.maximum(
            np.asarray(out.tree.visits), 1
        )
        assert np.all(np.abs(v) <= 1.0 + 1e-4)
        # λ=0.8 must actually change the search relative to the default.
        out0 = _noisy_search(
            ENV, MCTSConfig(num_simulations=60, dirichlet_epsilon=0.0)
        )(states, jax.random.key(1))
        assert not np.array_equal(
            np.asarray(out.tree.value_sum), np.asarray(out0.tree.value_sum)
        )


class TestWidePointerMode:
    """Arenas beyond the f16-exact 2046-node range switch to f32 child
    pointers automatically (round-1 cap lifted; VERDICT #10)."""

    def test_4096_sims_wide_mode(self):
        cfg = MCTSConfig(num_simulations=4096, dirichlet_epsilon=0.0)
        env = GomokuEnv(board_size=7)
        eval_fn = make_uniform_eval_fn(env.num_actions)
        states = batch_init(env, 2)
        out = jax.jit(
            lambda s, r: search(env, eval_fn, s, r, cfg)
        )(states, jax.random.key(0))
        assert out.tree.cchild.dtype == jnp.float32
        counts = np.asarray(out.visit_counts)
        assert (counts.sum(-1) == 4096).all()
        # Deep pointers resolve: some node beyond the f16 range was linked.
        cc = np.asarray(out.tree.cchild, np.float32)
        assert cc.max() > 2046

    def test_small_arena_keeps_f16(self):
        cfg = MCTSConfig(num_simulations=64)
        env = GomokuEnv(board_size=7)
        eval_fn = make_uniform_eval_fn(env.num_actions)
        states = batch_init(env, 2)
        out = jax.jit(
            lambda s, r: search(env, eval_fn, s, r, cfg)
        )(states, jax.random.key(0))
        assert out.tree.cchild.dtype == jnp.float16


class TestWaveMode:
    """wave_size > 1: W virtual-loss descents per step sharing one NN batch
    (the reference's BATCHED self-play mode, self_play_manager.cpp:166-175;
    see MCTSConfig.wave_size)."""

    def test_visit_budget_waves(self):
        for W in (2, 4, 8):
            cfg = MCTSConfig(num_simulations=64, wave_size=W,
                             dirichlet_epsilon=0.0)
            out = jsearch(ENV, cfg)(batch_init(ENV, 2), jax.random.key(0))
            np.testing.assert_array_equal(out.tree.visits[:, 0], 65)
            np.testing.assert_array_equal(out.visit_counts.sum(-1), 64)
            assert np.isfinite(np.asarray(out.tree.value_sum)).all()

    def test_wave_finds_immediate_win(self):
        # Four black stones in a row: search must pile visits on the win.
        env = GomokuEnv(board_size=7)
        states = batch_init(env, 2)
        for a in (0, 7, 1, 8, 2, 9, 3, 10):
            states = batch_play(env, states, [a, a])
        cfg = MCTSConfig(num_simulations=96, wave_size=4,
                         dirichlet_epsilon=0.0)
        eval_fn = make_uniform_eval_fn(env.num_actions)
        out = jax.jit(lambda s, r: search(env, eval_fn, s, r, cfg))(
            states, jax.random.key(0)
        )
        assert (np.asarray(out.visit_counts).argmax(-1) == 4).all()

    def test_wave_duplicate_merge_budget(self):
        # More walkers than legal moves: duplicates must merge without
        # losing the visit budget (live nodes < allocated slots).
        env = GomokuEnv(board_size=5)
        states = batch_init(env, 2)
        for a in (0, 1, 2, 3, 5, 6, 8, 9, 15, 16, 18, 19, 10, 14, 4, 20,
                  22, 7):
            states = batch_play(env, states, [a, a])
        legal = np.asarray(jax.vmap(env.legal_mask)(states))
        assert legal.sum() > 0
        cfg = MCTSConfig(num_simulations=32, wave_size=8,
                         dirichlet_epsilon=0.0)
        eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.0)
        out = jax.jit(lambda s, r: search(env, eval_fn, s, r, cfg))(
            states, jax.random.key(1)
        )
        np.testing.assert_array_equal(out.tree.visits[:, 0], 33)
        np.testing.assert_array_equal(out.visit_counts.sum(-1), 32)
        live = (np.asarray(out.tree.visits) > 0).sum(-1)
        assert (live < 33).all()  # merges happened

    def test_wave_weights_close_to_sequential(self):
        # Virtual-loss waves approximate the sequential search: the greedy
        # action should agree on a tactically clear position.
        env = GomokuEnv(board_size=7)
        states = batch_init(env, 2)
        for a in (0, 7, 1, 8, 2, 9):
            states = batch_play(env, states, [a, a])
        eval_fn = make_uniform_eval_fn(env.num_actions)
        outs = {}
        for W in (1, 4):
            cfg = MCTSConfig(num_simulations=128, wave_size=W,
                             dirichlet_epsilon=0.0)
            outs[W] = jax.jit(lambda s, r: search(env, eval_fn, s, r, cfg))(
                states, jax.random.key(0)
            )
        a1 = np.asarray(outs[1].visit_counts).argmax(-1)
        a4 = np.asarray(outs[4].visit_counts).argmax(-1)
        np.testing.assert_array_equal(a1, a4)

    def test_wave_go_capture_flood(self):
        # Go env inside waves: the step's convergence-checked capture flood
        # (games/go._or_flood) must compose with vmap inside the wave body.
        from alphazero_tpu.games.go import GoEnv

        env = GoEnv(board_size=5)
        states = jax.vmap(lambda _: env.init())(jnp.arange(2))
        cfg = MCTSConfig(num_simulations=32, wave_size=4,
                         dirichlet_epsilon=0.0)
        eval_fn = make_uniform_eval_fn(env.num_actions)
        out = jax.jit(lambda s, r: search(env, eval_fn, s, r, cfg))(
            states, jax.random.key(2)
        )
        np.testing.assert_array_equal(out.visit_counts.sum(-1), 32)
