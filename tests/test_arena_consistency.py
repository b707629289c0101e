"""Arena state/structure consistency under the wave engine.

Round-3 regression guard: BATCHED (3-D) one-hot einsums truncate their
operands through bf16 at default precision on both XLA:CPU and TPU (an
f16 child pointer 2045 read back as 2048; f32 hash halves and bit-packed
board rows corrupted likewise).  The wave path (`_simulate_wave` /
`_select_wave`) therefore runs its structural sweeps at
``Precision.HIGHEST``.  These tests replay every node's
(parent, paction) chain through the env on host and require the arena
copy of the state to match EXACTLY — with enough nodes (> 256) that any
bf16 truncation of pointers or packed payloads would trip them.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.core import registry
from alphazero_tpu.mcts.search import MCTSConfig, search, _unpack_state
from alphazero_tpu.models.stub import make_uniform_eval_fn


def _check_consistency(env, out, batch_index=0):
    t = out.tree
    parent = np.asarray(t.parent[batch_index])
    pact = np.asarray(t.paction[batch_index])
    visits = np.asarray(t.visits[batch_index])
    st = _unpack_state(t.states, env.init(), env)

    def node_state(i):
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x[batch_index, i]), st
        )

    step = jax.jit(env.step)
    bad = []
    checked = 0
    for i in range(len(parent)):
        if visits[i] <= 0 or (i > 0 and parent[i] < 0):
            continue
        chain = []
        j = i
        while j > 0:
            chain.append(int(pact[j]))
            j = int(parent[j])
        s = env.init()
        for a in reversed(chain):
            s = step(s, jnp.int32(a))
        arena = node_state(i)
        checked += 1
        for f in s.__dataclass_fields__:
            a1 = np.asarray(getattr(s, f))
            a2 = np.asarray(getattr(arena, f))
            if not np.array_equal(a1, a2):
                bad.append((i, f))
    assert checked > 256, f"need >256 nodes to exercise truncation, got {checked}"
    assert not bad, f"{len(bad)} arena/replay mismatches, first: {bad[:5]}"


@pytest.mark.parametrize("wave", [4])
def test_wave_arena_matches_replay_gomoku(wave):
    env = registry.create_game("gomoku", 9)
    eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
    states = jax.vmap(lambda _: env.init())(jnp.arange(1))
    cfg = MCTSConfig(num_simulations=400, wave_size=wave, max_children=8)
    out = jax.jit(lambda s, r: search(env, eval_fn, s, r, cfg))(
        states, jax.random.key(0)
    )
    _check_consistency(env, out)


def test_wave_pointer_targets_link_back():
    """Every expanded child's (parent, pslot) must agree with the parent's
    cchild row — pointer-level structural integrity beyond node 256."""
    env = registry.create_game("gomoku", 9)
    eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
    states = jax.vmap(lambda _: env.init())(jnp.arange(1))
    cfg = MCTSConfig(num_simulations=500, wave_size=4, max_children=8)
    out = jax.jit(lambda s, r: search(env, eval_fn, s, r, cfg))(
        states, jax.random.key(1)
    )
    t = out.tree
    parent = np.asarray(t.parent[0])
    pslot = np.asarray(t.pslot[0])
    visits = np.asarray(t.visits[0])
    cchild = np.asarray(t.cchild[0], dtype=np.float32).astype(int)
    deep = 0
    for i in range(1, len(parent)):
        if visits[i] <= 0 or parent[i] <= 0:
            continue  # unallocated or root child (dense root_child array)
        deep += 1
        assert cchild[parent[i], pslot[i]] == i, (
            f"node {i}: parent {parent[i]} slot {pslot[i]} points to "
            f"{cchild[parent[i], pslot[i]]}"
        )
    assert deep > 100
