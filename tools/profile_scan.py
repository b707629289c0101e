"""Compare standalone simulate_once vs in-scan per-sim cost (carry-copy
overhead diagnosis)."""
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


def bench(name, fn, *args, iters=3, per=1):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 2),
                      "per_sim_ms": round(dt / per * 1e3, 3)}), flush=True)


# full search (scan over sims)
full = jax.jit(lambda s, r: S.search(env, uniform, s, r, cfg).visit_counts)
bench("search_scan", full, states, jax.random.key(1), per=SIMS)

# standalone simulate_once on a full tree, 20 iters
tree = jax.jit(lambda s, r: S.search(env, uniform, s, r, cfg).tree)(
    states, jax.random.key(1)
)
jax.block_until_ready(tree.visits)
sim_fn = jax.jit(
    lambda t: S._simulate_once(env, uniform, t, jnp.int32(SIMS - 1),
                               cfg).visits
)
bench("simulate_once_standalone", sim_fn, tree, iters=20, per=1)

# scan of 100 sims continuing from the full tree (cache warm tree)
cfg100 = S.MCTSConfig(num_simulations=SIMS, dirichlet_epsilon=0.0)


@jax.jit
def scan100(t):
    def body(tt, sim):
        return S._simulate_once(env, uniform, tt, sim, cfg100), ()

    t2, _ = jax.lax.scan(body, t, jnp.arange(100))
    return t2.visits


bench("scan_100_sims", scan100, tree, per=100)
