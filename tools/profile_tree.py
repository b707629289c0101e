"""Isolate the cost of each MCTS tree phase on the chip."""
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.mcts import search as S
from alphazero_tpu.models.stub import make_uniform_eval_fn

B = int(os.environ.get("PROF_BATCH", "1024"))
SIMS = int(os.environ.get("PROF_SIMS", "800"))

env = GomokuEnv(board_size=15)
uniform = make_uniform_eval_fn(env.num_actions)
states = jax.vmap(lambda _: env.init())(jnp.arange(B))
cfg = S.MCTSConfig(num_simulations=SIMS, dirichlet_epsilon=0.0)

# Build a fully-populated tree once (cached compile from earlier runs).
full = jax.jit(lambda s, r: S.search(env, uniform, s, r, cfg).tree)
tree = full(states, jax.random.key(1))
jax.block_until_ready(tree.visits)
print("tree ready", flush=True)


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 3)}), flush=True)
    return dt


# 1. selection descent on the full tree (deepest case)
sel_fn = jax.jit(lambda t: S._select(t, cfg).node)
bench("select_full_tree", sel_fn, tree)

# 2. one full simulate_once on the nearly-full tree
sim_fn = jax.jit(
    lambda t: S._simulate_once(env, uniform, t, jnp.int32(SIMS - 1), cfg).visits
)
bench("simulate_once", sim_fn, tree)

# 3. backprop from a mid-depth node
start = jnp.full((B,), SIMS // 2, jnp.int32)
val = jnp.zeros((B,))
bp_fn = jax.jit(lambda t: S._backprop(t, start, val).visits)
bench("backprop", bp_fn, tree)

# 4. child-score computation alone (one PUCT eval at root)
node0 = jnp.zeros((B,), jnp.int32)
cs_fn = jax.jit(lambda t: S._child_scores(t, node0, cfg))
bench("child_scores_once", cs_fn, tree)

# 5. expansion-style scatter: write one row into prior + children + states
new = jnp.int32(5)
b = jnp.arange(B)


@jax.jit
def expand_writes(t):
    prior = t.prior.at[b, new].set(jnp.zeros((B, 225), t.prior.dtype))
    children = t.children.at[b, jnp.zeros((B,), jnp.int32),
                             jnp.zeros((B,), jnp.int32)].set(
        jnp.asarray(5, t.children.dtype))
    st = jax.tree_util.tree_map(
        lambda arr: arr.at[b, new].set(arr[b, 0]), t.states
    )
    return prior.sum() + children.sum() + jax.tree_util.tree_leaves(st)[0].sum()


bench("expand_writes", expand_writes, tree)

# 6. gather leaf states (tree_map gather)
leaf = jnp.full((B,), 3, jnp.int32)


@jax.jit
def gather_states(t):
    ls = jax.tree_util.tree_map(lambda x: x[b, leaf], t.states)
    return jax.tree_util.tree_leaves(ls)[0].sum()


bench("gather_leaf_states", gather_states, tree)
