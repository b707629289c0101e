"""Isolate the cost of each MCTS phase (engine v2) on the chip."""
# NOTE: rep-loop timings via block_until_ready are INVALID on the
# tunneled axon platform (async dispatch; only host fetches sync —
# see BENCHLOG.md "Axon timing caveat").  Prefer the chained
# fori_loop + scalar-fetch methodology in tools/profile_int8.py.

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


sel_fn = jax.jit(lambda t: S._select(t, cfg).leaf)
bench("select_full_tree", sel_fn, tree)

sim_fn = jax.jit(
    lambda t: S._simulate_once(env, uniform, t, jnp.int32(SIMS - 1),
                               cfg).visits
)
bench("simulate_once", sim_fn, tree)


# leaf-state gather alone
@jax.jit
def gather_fn(t):
    sel = S._select(t, cfg)
    lp = S._gather_leaf_states(t.states, sel.leaf_onehot, B, t.capacity)
    return jax.tree_util.tree_leaves(lp)[0].sum()


bench("select_plus_state_gather", gather_fn, tree)


# env step + obs + legal + topk on fixed states
acts = jnp.zeros((B,), jnp.int32)


@jax.jit
def env_fn(s):
    ns = jax.vmap(env.step)(s, acts)
    obs = jax.vmap(env.observation)(ns)
    lg = jax.vmap(env.legal_mask)(ns)
    p = S.masked_softmax(jnp.zeros((B, env.num_actions)), lg)
    tv, ta = jax.lax.top_k(p, 32)
    return obs.sum() + tv.sum()


bench("env_step_obs_topk", env_fn, states)


# writes-only: everything in simulate_once after child_state, approximated
@jax.jit
def writes_fn(t):
    new = jnp.int32(SIMS - 1)
    K = t.prior.shape[-1]
    topv = jnp.full((B, K), 0.01, jnp.float32)
    topa = jnp.ones((B, K), jnp.int32)
    expand = jnp.ones((B,), bool)
    prior = S._write_row(t.prior, new, topv, expand)
    meta = S._write_row(t.cmeta, new,
                        S._meta_pack(jnp.full((B, K), -1), topa), expand)
    st = jax.tree_util.tree_map(
        lambda arr: S._write_row(
            arr, new, jax.lax.dynamic_index_in_dim(arr, 0, 1, False), expand
        ),
        t.states,
    )
    return prior.sum() + meta.sum() + jax.tree_util.tree_leaves(st)[0].sum()


bench("arena_writes", writes_fn, tree)
