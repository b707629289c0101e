"""Transposition-table tests (MCTSConfig.tt_size).

Covers the TPU rendition of the reference ``TranspositionTable``
(``include/alphazero/mcts/transposition_table.h:23-292``): store/lookup
round-trip, key-mismatch collision safety, search integration (hits on
transposed move orders), invariance under a deterministic evaluator, and
cross-move persistence via reroot.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.core import registry
from alphazero_tpu.mcts import search as S
from alphazero_tpu.mcts.search import MCTSConfig, search
from alphazero_tpu.models.stub import make_uniform_eval_fn


def _batched_init(env, b):
    return jax.vmap(lambda _: env.init())(jnp.arange(b))


def test_store_then_lookup_hit():
    env = registry.create_game("gomoku", 5)
    s = env.init()
    for a in (0, 1, 2, 3):
        s = env.step(s, jnp.int32(a))
    tt = S._tt_init(1, 16, 4)
    h = jax.vmap(env.position_hash)(
        jax.tree_util.tree_map(lambda x: x[None], s)
    )[None]  # [1, 1, 2]
    el = jnp.ones((1, 1), bool)
    v = jnp.full((1, 1), 0.625)
    tv = jnp.full((1, 1, 4), 0.25, jnp.bfloat16)
    ta = jnp.arange(4, dtype=jnp.int32)[None, None]

    tt, v2, tv2, ta2, hit = S._tt_process(tt, h, el, el, v, tv, ta)
    assert not bool(hit[0, 0])
    assert int(tt.stores[0]) == 1

    # Same position again: hit substitutes the cached entry.
    junk_v = jnp.zeros((1, 1))
    junk_tv = jnp.zeros((1, 1, 4), jnp.bfloat16)
    junk_ta = jnp.full((1, 1, 4), 9, jnp.int32)
    tt, v3, tv3, ta3, hit2 = S._tt_process(
        tt, h, el, el, junk_v, junk_tv, junk_ta
    )
    assert bool(hit2[0, 0])
    assert v3[0, 0] == pytest.approx(0.625)
    np.testing.assert_array_equal(np.asarray(ta3[0, 0]), [0, 1, 2, 3])
    assert int(tt.hits[0]) == 1


def test_collision_is_a_miss():
    """A different position mapping to the same slot must not hit (the
    full 64-bit key is compared, reference entry hash check)."""
    env = registry.create_game("gomoku", 5)
    s1 = env.init()
    for a in (0, 1, 2, 3):
        s1 = env.step(s1, jnp.int32(a))
    s2 = env.init()
    for a in (5, 6, 7, 8):
        s2 = env.step(s2, jnp.int32(a))

    def hashes(s):
        return jax.vmap(env.position_hash)(
            jax.tree_util.tree_map(lambda x: x[None], s)
        )[None]

    tt = S._tt_init(1, 1, 4)  # ONE slot: every store collides
    el = jnp.ones((1, 1), bool)
    v = jnp.ones((1, 1))
    tv = jnp.full((1, 1, 4), 0.25, jnp.bfloat16)
    ta = jnp.arange(4, dtype=jnp.int32)[None, None]
    tt, *_ = S._tt_process(tt, hashes(s1), el, el, v, tv, ta)
    _, _, _, _, hit = S._tt_process(tt, hashes(s2), el, el, v, tv, ta)
    assert not bool(hit[0, 0])


def test_transposed_orders_share_hash():
    env = registry.create_game("gomoku", 5)

    def play(actions):
        s = env.init()
        for a in actions:
            s = env.step(s, jnp.int32(a))
        return s

    h1 = play([0, 1, 2, 3]).hash
    h2 = play([2, 1, 0, 3]).hash
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    h3 = play([0, 1, 2, 4]).hash
    assert not np.array_equal(np.asarray(h1), np.asarray(h3))


@pytest.mark.parametrize("wave", [1, 4])
def test_search_invariant_with_tt(wave):
    """With a deterministic evaluator the TT must not change search
    results (it substitutes a cached copy of exactly what the NN would
    return)."""
    env = registry.create_game("gomoku", 4)
    eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
    states = _batched_init(env, 2)
    rng = jax.random.key(0)
    kw = dict(num_simulations=200, wave_size=wave, max_children=16)
    out_on = jax.jit(
        lambda s, r: search(env, eval_fn, s, r,
                            MCTSConfig(tt_size=1024, **kw))
    )(states, rng)
    out_off = jax.jit(
        lambda s, r: search(env, eval_fn, s, r, MCTSConfig(**kw))
    )(states, rng)
    # Not bit-equality: tt-on/off are different compiled programs, and
    # XLA's partitioning (8 virtual devices in conftest) may reorder float
    # reductions enough to flip a borderline argmax once in 200 sims.
    a = np.asarray(out_on.visit_counts, np.float32)
    b = np.asarray(out_off.visit_counts, np.float32)
    l1 = np.abs(a - b).sum(axis=-1)
    assert (l1 <= 0.02 * a.sum(axis=-1)).all(), (a, b)
    assert int(out_on.tree.tt.stores.sum()) > 0


@pytest.mark.parametrize("wave", [1, 4])
def test_warm_table_hits_across_searches(wave):
    """A second identical search over a warmed table must hit on every
    non-terminal expansion (the reference's cross-move TT reuse,
    self_play_manager.cpp:166-184)."""
    env = registry.create_game("gomoku", 5)
    eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
    states = _batched_init(env, 2)
    rng = jax.random.key(7)
    cfg = MCTSConfig(num_simulations=64, wave_size=wave, tt_size=512,
                     max_children=8)
    run = jax.jit(lambda s, r, t: search(env, eval_fn, s, r, cfg, tt=t))
    out1 = search(env, eval_fn, states, rng, cfg)
    stores1 = np.asarray(out1.tree.tt.stores)
    assert (stores1 > 0).all()
    out2 = run(states, rng, out1.tree.tt)
    hits2 = np.asarray(out2.tree.tt.hits)
    stores2 = np.asarray(out2.tree.tt.stores) - stores1
    # Same rng -> identical tree growth; every canonical expansion that
    # stored in run 1 must hit in run 2 (collision evictions may drop a
    # few stored entries, so allow a small remainder of re-stores).
    assert (hits2 >= stores1 * 0.8).all()
    assert (stores2 <= stores1 * 0.2 + 1).all()
    # And the search result itself is unchanged by the warm table.
    np.testing.assert_array_equal(
        np.asarray(out1.visit_counts), np.asarray(out2.visit_counts)
    )


def test_tt_survives_reroot():
    env = registry.create_game("gomoku", 5)
    eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
    config = MCTSConfig(num_simulations=32, wave_size=4, tt_size=64,
                        max_children=8, tree_reuse=True, reuse_cap=16)
    states = _batched_init(env, 2)
    out = search(env, eval_fn, states, jax.random.key(0), config)
    stores_before = int(out.tree.tt.stores.sum())
    assert stores_before > 0
    action = jnp.argmax(out.visit_counts, -1).astype(jnp.int32)
    new_states = jax.vmap(env.step)(states, action)
    obs = jax.vmap(env.observation)(new_states)
    logits, value = eval_fn(obs, jax.vmap(env.to_play)(new_states))
    tree2 = S.reroot(env, out.tree, action, new_states, logits, value,
                     config)
    assert int(tree2.tt.stores.sum()) == stores_before


def test_chess_tt_key_includes_rule_context():
    """Two chess states with identical boards but different halfmove
    clocks / repetition counts must get DIFFERENT TT keys: observation()
    feeds halfmove/100 and repetition/3 planes to the NN, so a TT hit
    across those contexts would substitute a wrong eval (advisor round 3;
    chess.py position_hash)."""
    from alphazero_tpu.games.chess_tables import encode_move

    env = registry.create_game("chess")
    s0 = env.init()
    s = s0
    # Ng1-f3 Ng8-f6 Nf3-g1 Nf6-g8: back to the initial board with
    # halfmove=4 and the start position repeated once.
    for frm, to in ((6, 21), (62, 45), (21, 6), (45, 62)):
        s = env.step(s, jnp.int32(encode_move(frm, to, None)))
    assert np.array_equal(np.asarray(s.board), np.asarray(s0.board))
    assert np.array_equal(np.asarray(s.hash), np.asarray(s0.hash))
    assert int(s.halfmove) == 4 and int(s.rep_count) >= 1
    k0 = np.asarray(env.position_hash(s0))
    k1 = np.asarray(env.position_hash(s))
    assert not np.array_equal(k0, k1)


def test_chess_search_invariant_with_tt():
    """TT on/off must agree on chess too (the key now carries the
    halfmove/repetition context, so no aliased substitutions)."""
    env = registry.create_game("chess")
    eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
    states = _batched_init(env, 2)
    rng = jax.random.key(3)
    kw = dict(num_simulations=48, wave_size=4, max_children=8)
    out_on = jax.jit(
        lambda s, r: search(env, eval_fn, s, r,
                            MCTSConfig(tt_size=512, **kw))
    )(states, rng)
    out_off = jax.jit(
        lambda s, r: search(env, eval_fn, s, r, MCTSConfig(**kw))
    )(states, rng)
    a = np.asarray(out_on.visit_counts, np.float32)
    b = np.asarray(out_off.visit_counts, np.float32)
    l1 = np.abs(a - b).sum(axis=-1)
    assert (l1 <= 0.05 * a.sum(axis=-1)).all(), (a, b)
    assert int(out_on.tree.tt.stores.sum()) > 0


def test_tt_hit_rate_accounting_canonical():
    """hits + stores must equal the number of canonical (non-duplicate)
    expansions, so the hit rate matches the reference's per-expansion
    definition (advisor round 3; search._tt_process accounting)."""
    env = registry.create_game("gomoku", 4)
    eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
    states = _batched_init(env, 1)
    out = jax.jit(
        lambda s, r: search(
            env, eval_fn, s, r,
            MCTSConfig(num_simulations=64, wave_size=4, tt_size=256,
                       max_children=8),
        )
    )(states, jax.random.key(0))
    hits = int(out.tree.tt.hits.sum())
    stores = int(out.tree.tt.stores.sum())
    # 64 sims expand at most 64 canonical nodes; duplicates and terminal
    # walkers are excluded from both counters.
    assert 0 < hits + stores <= 64, (hits, stores)
